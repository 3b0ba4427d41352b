"""Runtime platform/dtype setup for CLI entry points.

Environment quirks this handles (documented in .claude/skills/verify/SKILL.md):
  * hosts may pre-select a platform via JAX_PLATFORMS that fails to
    initialize in subprocesses — fall back gracefully;
  * float64 linalg (slogdet/LU) is unsupported on TPU backends, so f64 runs
    (used for parity against the float64 reference) are pinned to CPU, while
    f32 runs prefer the accelerator.
"""

from __future__ import annotations


def _enable_compile_cache(jax, platform=None) -> None:
    """Persistent executable cache shared across processes.

    First compiles on the accelerator go through a remote-compile HTTP
    helper and can take MINUTES per program (the bench headline tile
    measured 663 s); the persistent cache makes every later process pay
    ~1 s instead (measured cross-process on the axon backend). Opt out
    with AMF_COMPILE_CACHE=0, or point it elsewhere with a path.

    CPU-backend processes never enable it: in this environment even
    XLA:CPU compiles can route through the remote helper, whose host has
    different machine features — the AOT loader then warns
    "could lead to execution errors such as SIGILL" on every load
    (observed round 4 on the d4 rc arm). Local CPU compiles are fast;
    the cache only ever pays for accelerator programs. ``platform`` is
    the effective platform when the caller knows it ("cpu" skips);
    callers on the accelerator path pass "tpu" or leave it None."""
    import os

    if platform == "cpu":
        return
    cache = os.environ.get("AMF_COMPILE_CACHE")
    if cache == "0":
        return
    if not cache:
        cache = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..",
                         ".jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


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
        _enable_compile_cache(jax, platform=forced)
        if use_x64:
            jax.config.update("jax_enable_x64", True)
        return jax.default_backend()

    if use_x64:
        # f64 linalg is CPU-only here; no persistent cache on CPU (see
        # _enable_compile_cache docstring)
        jax.config.update("jax_enable_x64", True)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        return jax.default_backend()

    try:
        backend = jax.default_backend()
    except RuntimeError:
        # configured platform failed to initialize (e.g. stale JAX_PLATFORMS)
        jax.config.update("jax_platforms", "")
        backend = jax.default_backend()
    _enable_compile_cache(jax, platform=backend)
    return backend
