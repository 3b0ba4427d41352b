"""Multi-chip dry run used by the driver's ``dryrun_multichip``.

Builds an n-device 1-D mesh over the candidate axis (the framework's scaling
axis — see SURVEY.md §2.4.1) and executes one full sharded active-learning
step on tiny shapes: per-candidate hypothesized-rating PMF refits fanned out
with ``shard_map``, followed by the argmax reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from amf_tpu import types
from amf_tpu.data import make_fake_data
from amf_tpu.models import pmf
from amf_tpu.parallel.mesh import CANDIDATE_AXIS, make_mesh


def run_dryrun(n_devices: int) -> None:
    if len(jax.devices()) < n_devices:
        # fall back to the virtual host-device trick (requires
        # --xla_force_host_platform_device_count to be >= n_devices)
        jax.config.update("jax_platforms", "cpu")
        if len(jax.devices()) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(jax.devices())}; set "
                "XLA_FLAGS=--xla_force_host_platform_device_count"
            )
    mesh = make_mesh(n_devices)
    rng = np.random.default_rng(0)
    real, known, _ = make_fake_data(
        num_users=8, num_items=8, rank=2, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known)
    cfg = pmf.PMFConfig(latent_d=2, max_fit_steps=40)
    state = pmf.init_state(jax.random.PRNGKey(0), *prob.shape, cfg, prob)
    state, _ = pmf.fit(state, prob, cfg)

    n, m = prob.shape
    n_cells = n * m
    # pad candidate axis to a device multiple
    pad = (-n_cells) % n_devices
    cand = jnp.arange(n_cells + pad, dtype=jnp.int32)
    valid = cand < n_cells

    def score_one(c, v):
        i, j = c // m, c % m
        hyp = prob.add_rating(i, j, 3.0)
        st, _ = pmf.fit(state, hyp, cfg, max_steps=20)
        pred = pmf.predicted_matrix(st, cfg)
        err = jnp.where(hyp.rated, hyp.R_obs - pred, 0.0)
        return jnp.where(v & prob.queryable[i, j], jnp.sum(err * err), jnp.inf)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(CANDIDATE_AXIS), P(CANDIDATE_AXIS)),
        out_specs=P(CANDIDATE_AXIS),
    )
    def score_shard(cs, vs):
        return jax.vmap(score_one)(cs, vs)

    @jax.jit
    def active_step(cand, valid):
        scores = score_shard(cand, valid)
        return jnp.argmin(scores), scores

    best, scores = active_step(cand, valid)
    best = int(best)
    assert 0 <= best < n_cells
    assert bool(np.isfinite(np.asarray(scores)).any())
    print(
        f"dryrun_multichip ok: {n_devices} devices, picked cell "
        f"({best // m}, {best % m})"
    )
