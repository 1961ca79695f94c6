"""Persistent XLA compilation cache + model-build device selection.

The f64 model build runs ~3x faster on the TPU than on the host CPU
(55 ms vs ~160 ms per optimizer eval at 3x3 on this image, parity
<= 7e-9 relative — the f64 solves use the f32-LU + iterative-refinement
path of core/linalg.py), but its first compile through the remote tunnel
takes minutes; the persistent cache makes that a one-time cost per
machine and topology.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache", "build_device"]

_DONE = False


def enable_compilation_cache():
    """Persist XLA compilations across runs (first TPU compile of the
    decode kernels / model build is minutes; subsequent invocations start
    hot).  Opt out with ITRAILS_NO_CACHE=1."""
    global _DONE
    if _DONE or os.environ.get("ITRAILS_NO_CACHE"):
        return
    import jax

    if jax.default_backend() != "tpu":
        # XLA:CPU AOT cache entries warn about machine-feature mismatches
        # on reload (potential SIGILL); only the minutes-long TPU tunnel
        # compiles are worth persisting
        return

    cache_dir = os.environ.get(
        "ITRAILS_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "itrails_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True
    except Exception:  # cache is an optimization, never a hard failure
        pass


def build_device(n_int_AB: int = 3, n_int_ABC: int = 3) -> str | None:
    """Device for the per-eval model build: the accelerator for small
    topologies (None = JAX default device; 55 ms vs ~160 ms CPU at 3x3),
    the host CPU otherwise — at 7x7 the f64-emulated TPU build measured
    ~100x slower than CPU (the deep Van Loan chains blow up under
    emulation), so large interval counts stay on the host (2.7 s at 7x7).
    Override with ITRAILS_BUILD_DEVICE=cpu|tpu."""
    import jax

    forced = os.environ.get("ITRAILS_BUILD_DEVICE", "").lower()
    if forced == "cpu":
        return "cpu"
    if forced in ("tpu", "default"):
        return None
    if jax.default_backend() != "tpu":
        return "cpu"
    return None if n_int_AB * n_int_ABC <= 12 else "cpu"
