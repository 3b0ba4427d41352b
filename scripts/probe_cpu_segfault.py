"""Synthetic repro probe for the XLA-CPU full-suite segfault.

The full test suite (~190 jit-heavy tests, CPU x64, 8 virtual devices) has
twice segfaulted inside XLA:CPU `backend_compile_and_load` around the
140th test, while every split run passes (CLAUDE.md; scripts/run_tests.sh
is the mitigation). Hypothesis under test here: the crash needs nothing
test-specific — only ACCUMULATED COMPILED-PROGRAM STATE in one process
(hundreds of distinct executables loaded into the ORC JIT), possibly
racing the module-boundary `jax.clear_caches()` the suite does.

This probe compiles N distinct programs (unique shapes so nothing hits a
cache) in the exact test environment (8 virtual CPU devices, x64),
interleaving `jax.clear_caches()` every CLEAR_EVERY programs, mixing the
op classes the suite leans on (linalg, scan loops, shard_map collectives).

Usage: python scripts/probe_cpu_segfault.py [N] [CLEAR_EVERY]
Exit 0 = no crash at N programs (hypothesis weakened); a segfault
reproduces the bug in ~minutes instead of a 45-min suite run.
"""
import faulthandler
import os
import sys

faulthandler.enable()

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    clear_every = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("c",))
    rng = np.random.default_rng(0)

    for i in range(n):
        kind = i % 4
        # unique static shape per iteration => fresh compile every time
        d = 3 + (i % 7)
        m = 8 + i // 4
        if kind == 0:  # linalg: cholesky + solve
            a = jnp.asarray(rng.standard_normal((d, m, m)))
            f = jax.jit(lambda a: jnp.linalg.cholesky(
                a @ jnp.swapaxes(a, -1, -2) + 10.0 * jnp.eye(a.shape[-1])))
            jax.block_until_ready(f(a))
        elif kind == 1:  # eigh + slogdet
            a = jnp.asarray(rng.standard_normal((m, m)))
            f = jax.jit(lambda a: (jnp.linalg.eigh(a + a.T)[0].sum()
                                   + jnp.linalg.slogdet(
                                       a @ a.T + jnp.eye(a.shape[0]))[1]))
            jax.block_until_ready(f(a))
        elif kind == 2:  # scan loop (PMF-style descent)
            x = jnp.asarray(rng.standard_normal((m, d)))

            def step(c, _):
                g = c @ (c.T @ c) / m - c
                return c - 0.01 * g, jnp.sum(g * g)

            f = jax.jit(lambda x: jax.lax.scan(step, x, None, length=20))
            jax.block_until_ready(f(x))
        else:  # shard_map collective over the 8-device mesh
            k = 8 * (1 + i // 8)
            x = jnp.asarray(rng.standard_normal((k, d)))

            def shmap_body(xs):
                return jax.lax.psum(xs @ xs.T, "c")

            f = jax.jit(shard_map(
                shmap_body, mesh=mesh, in_specs=P("c", None),
                out_specs=P()))
            jax.block_until_ready(f(x))
        if (i + 1) % clear_every == 0:
            jax.clear_caches()
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{n} programs compiled", flush=True)
    print("no crash:", n, "programs")


if __name__ == "__main__":
    main()
