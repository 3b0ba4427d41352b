"""Runtime platform/dtype setup for CLI entry points.

Environment quirks this handles (documented in .claude/skills/verify/SKILL.md):
  * hosts may pre-select a platform via JAX_PLATFORMS that fails to
    initialize in subprocesses — fall back gracefully;
  * float64 linalg (slogdet/LU) is unsupported on TPU backends, so f64 runs
    (used for parity against the float64 reference) are pinned to CPU, while
    f32 runs prefer the accelerator.
"""

from __future__ import annotations


def setup(use_x64: bool) -> str:
    """Configure JAX for the requested precision; returns the backend name.

    AMF_PLATFORM=cpu (or tpu) overrides platform selection outright — the
    JAX_PLATFORMS env var is ignored in this environment (a TPU backend is
    pre-registered at interpreter startup), and a dead accelerator tunnel
    makes default-platform discovery hang rather than fail, so an explicit
    escape hatch is needed to run f32 jobs on the host."""
    import os

    import jax

    forced = os.environ.get("AMF_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
        if use_x64:
            jax.config.update("jax_enable_x64", True)
        return jax.default_backend()

    if use_x64:
        jax.config.update("jax_enable_x64", True)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        return jax.default_backend()

    try:
        return jax.default_backend()
    except RuntimeError:
        # configured platform failed to initialize (e.g. stale JAX_PLATFORMS)
        jax.config.update("jax_platforms", "")
        return jax.default_backend()
