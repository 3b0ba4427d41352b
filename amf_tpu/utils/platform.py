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
    """Configure JAX for the requested precision; returns the backend name."""
    import jax

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
