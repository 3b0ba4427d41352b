"""PSD projection.

Reference analogue: ``project_psd`` (python-pmf/active_pmf.py:36-50;
stan-bpmf/bpmf.py:57-82): symmetrize, clamp the eigenvalue spectrum at
``min_eig``, re-symmetrize.  Runs after every covariance step of the KL
descent loops, so it must be jit/vmap-friendly: the reference's "only project
if the minimum eigenvalue is negative" short-circuit becomes an unconditional
reconstruct (identical result, no data-dependent branch).
"""

from __future__ import annotations

import jax.numpy as jnp


def project_psd(mat: jnp.ndarray, min_eig: float = 0.0) -> jnp.ndarray:
    """Project a real matrix to the symmetric PSD cone (eigenvalue clamp)."""
    mat = (mat + mat.T) / 2
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.maximum(vals, min_eig)
    out = (vecs * vals[None, :]) @ vecs.T
    return (out + out.T) / 2
