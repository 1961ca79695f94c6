"""Persistent caches + model-build device selection.

Three layers, all opt-out via ``ITRAILS_NO_CACHE=1``:

1. **XLA compilation cache** (`enable_compilation_cache`): persists
   compiled executables across processes.  The cache directory is keyed
   by a hash of the host CPU feature flags + the jax version, because
   XLA:CPU AOT executables embed ISA-specific code — reloading one on a
   different machine can SIGILL; the feature tag turns a foreign entry
   into a clean miss instead.  TPU (tunnel) executables share the same
   directory (their keys embed the accelerator, so they never collide).
2. **Model-artifact cache** (`model_artifact_get`/`put`): the built
   (a, b, pi, cuts) tensors for an exact parameter point, reused across
   processes.  The optimize -> viterbi -> posterior pipeline rebuilds the
   SAME best-fit model in each CLI process; the artifact hit turns that
   cold-process rebuild into a ~10 ms npz load.
3. **Build device** (`build_device`): always the host CPU.  Round-5
   measurements on this image (quiet machine, support-sliced round-4
   build): CPU cached build 36 ms vs TPU 42 ms at 3x3 — and CPU first
   compile is 10 s vs 45-150 s through the remote TPU tunnel (the
   round-2 numbers that favoured TPU, 55 vs 160 ms, predate the
   support-sliced build).  f64 parity between the two is <= 7e-9
   relative, so nothing depends on the choice.
"""

from __future__ import annotations

import hashlib
import os

__all__ = [
    "enable_compilation_cache", "build_device",
    "model_artifact_get", "model_artifact_put", "model_artifact_key",
    "accel_builder_handle",
]

_DONE = False
_ARTIFACT_SCHEMA = "v1"  # bump to invalidate all stored model artifacts
_ARTIFACT_KEEP = 64  # newest entries kept by the LRU prune


def _cache_root() -> str:
    return os.environ.get(
        "ITRAILS_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "itrails_tpu"),
    )


def _host_tag() -> str:
    """Hash of the CPU feature flags + jax version (see module docstring)."""
    import jax

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha1(
        f"{flags}|{jax.__version__}".encode()
    ).hexdigest()[:12]


def enable_compilation_cache():
    """Persist XLA compilations across runs (first TPU compile of the
    decode kernels through the tunnel is minutes, the f64 CPU model build
    ~10 s; subsequent processes start hot).  Opt out with
    ITRAILS_NO_CACHE=1."""
    global _DONE
    if _DONE or os.environ.get("ITRAILS_NO_CACHE"):
        return
    import jax

    cache_dir = os.path.join(_cache_root(), f"xla-{_host_tag()}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True
    except Exception:  # cache is an optimization, never a hard failure
        pass


def build_device(n_int_AB: int = 3, n_int_ABC: int = 3) -> str | None:
    """Device for the per-eval model build: the host CPU (see module
    docstring for the round-5 measurements; at 7x7 the f64-emulated TPU
    build is ~100x slower than CPU — the deep Van Loan chains blow up
    under emulation).  Override with ITRAILS_BUILD_DEVICE=cpu|tpu."""
    forced = os.environ.get("ITRAILS_BUILD_DEVICE", "").lower()
    if forced in ("tpu", "default"):
        return None
    return "cpu"


# --- background accelerator-builder warmer ----------------------------------
#
# The CPU-first build policy (build_device above) trades steady-state
# per-eval latency for cold start: with the build on the host, the f32
# tables cross the PCIe/tunnel link every optimizer evaluation (measured
# 0.075-0.083 s/eval at 3x3 on the tunneled v5e vs 0.043 s when the build
# lives on the TPU — the round-4 configuration — where build and decode
# pipeline in the device queue with no host round-trip).  The warmer
# recovers both ends: evals start immediately on the CPU builder, while a
# daemon thread compiles the accelerator builder (45-150 s through the
# tunnel on a cold XLA cache, seconds on a warm one); once the compiled
# builder is verified — f64 parity vs the CPU build and per-build time not
# worse than 2x the CPU's — the optimizer hot loop switches over at the
# next evaluation boundary.  The ~1e-9-relative build difference at the
# switch is far below the f32 decode quantization the outer optimizer
# already tolerates.  Disable with ITRAILS_WARM_ACCEL_BUILDER=0.


class _BuilderWarmer:
    """One lazily-started warm attempt for an accelerator model builder.

    ``fn_if_ready(args)`` is the only entry point the hot loop needs: it
    kicks the background compile on first call (using ``args`` as the
    representative parameter point) and returns the accelerator builder
    once verified, else None.  States: idle -> compiling -> ready |
    rejected | failed.  TRANSIENT outcomes (an exception, a non-finite
    verify point, a lost timing race) are retried on a later evaluation
    point, up to ``MAX_ATTEMPTS``; a parity mismatch is deterministic
    evidence and stays rejected.

    The warm thread is a daemon deliberately: a non-daemon thread would
    block process exit for the full remote compile (25-356 s) on every
    short optimize run.  CPython freezes daemon threads at finalization
    only when they next acquire the GIL — an in-flight XLA/tunnel
    compile completes its native call first, and the six-CLI smoke
    (tools/smoke_cli.py, --maxiter 2 optimize with the thread mid-
    compile at exit) exits cleanly on the real TPU.
    """

    SLOWDOWN_LIMIT = 2.0  # reject if accel build > LIMIT x CPU build
    MAX_ATTEMPTS = 3  # total warm attempts for transient outcomes

    def __init__(self, family: str, n_int_AB: int, n_int_ABC: int,
                 dtype_name: str):
        self.family = family
        self.n_int_AB = n_int_AB
        self.n_int_ABC = n_int_ABC
        self.dtype_name = dtype_name
        self.state = "idle"
        self.fn = None
        self.detail = ""
        self.warm_seconds = None
        self.transient = False  # last settle retryable?
        self.attempts = 0
        import threading

        self._lock = threading.Lock()
        self._done = threading.Event()

    def _make_fn(self, device):
        if self.family == "int":
            from itrails_tpu.introgression.builder import (
                build_model_introgression_fn,
            )

            return build_model_introgression_fn(
                self.n_int_AB, self.n_int_ABC, self.dtype_name, device=device
            )
        from itrails_tpu.core.model import build_model_fn

        return build_model_fn(
            self.n_int_AB, self.n_int_ABC, self.dtype_name, device=device
        )

    def _warm(self, args):
        import time

        import numpy as np

        try:
            # timings below materialize via np.asarray: the tunneled
            # backend memoizes identical calls and its block_until_ready
            # does not wait, so every timed call uses a fresh parameter
            # point and fetches a value
            args2 = list(args)
            # additive + multiplicative: multiplicative alone is a no-op
            # at t_A == 0, which would re-enable memoization of the timed
            # call
            args2[0] = args2[0] * (1.0 + 1e-9) + 1e-13
            cpu_fn = self._make_fn("cpu")
            accel_fn = self._make_fn(None)  # default device = accelerator
            ref = [np.asarray(x) for x in cpu_fn(*args)]  # compile + parity ref
            t0 = time.perf_counter()
            np.asarray(cpu_fn(*args2)[0])
            t_cpu = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = [np.asarray(x) for x in accel_fn(*args)]  # compile + run
            self.warm_seconds = time.perf_counter() - t0
            args3 = list(args)
            args3[0] = args3[0] * (1.0 + 2e-9) + 2e-13
            t0 = time.perf_counter()
            np.asarray(accel_fn(*args3)[0])
            t_accel = time.perf_counter() - t0
            for name, r, o in zip(("a", "b", "pi", "cut_AB", "cut_ABC"),
                                  ref, out):
                # scale-aware parity: the accelerator build (f32 LU +
                # iterative refinement) reproduces entries to ~1e-8 of
                # the ARRAY scale; sub-1e-8-magnitude emission entries
                # carry ~1% relative error, which is immaterial to the
                # f32 decode (measured on v5e: b max_abs diff 1.6e-10 at
                # table scale 0.24).  Per entry: |r-o| <= 1e-5|r| +
                # 1e-7 x scale.
                fin = np.isfinite(r)
                if not np.array_equal(fin, np.isfinite(o)):
                    self.state = "rejected"
                    self.detail = f"parity mismatch vs CPU build ({name})"
                    return
                if not fin.any():
                    # an all-non-finite verify point (e.g. a bound-corner
                    # start) would make the comparison vacuous — refuse
                    # rather than accept on no evidence; a later eval
                    # point retries (transient)
                    self.state = "rejected"
                    self.detail = f"non-finite verify point ({name})"
                    self.transient = True
                    return
                rf, of = r[fin], o[fin]
                scale = float(np.max(np.abs(rf)))
                if not np.allclose(of, rf, rtol=1e-5, atol=1e-7 * scale):
                    self.state = "rejected"
                    self.detail = f"parity mismatch vs CPU build ({name})"
                    return
            if t_accel > self.SLOWDOWN_LIMIT * max(t_cpu, 1e-3):
                # single timing samples can lose to host contention (the
                # optimizer hot loop shares the CPU) — retryable
                self.state = "rejected"
                self.detail = (
                    f"accel build {t_accel * 1e3:.0f} ms > "
                    f"{self.SLOWDOWN_LIMIT}x CPU {t_cpu * 1e3:.0f} ms"
                )
                self.transient = True
                return
            self.fn = accel_fn
            self.state = "ready"
            self.detail = (
                f"accel {t_accel * 1e3:.0f} ms vs CPU {t_cpu * 1e3:.0f} ms"
            )
        except Exception as e:  # warming is an optimization, never fatal
            self.state = "failed"
            self.detail = f"{type(e).__name__}: {e}"[:200]
            self.transient = True
        finally:
            self._done.set()

    def kick(self, args) -> None:
        import threading

        with self._lock:
            if self.state != "idle":
                return
            self.state = "compiling"
            self.attempts += 1
        threading.Thread(
            target=self._warm, args=(tuple(args),), daemon=True,
            name=f"itrails-warm-{self.family}-{self.n_int_AB}x"
                 f"{self.n_int_ABC}",
        ).start()

    def wait(self, timeout: float | None = None) -> bool:
        """Block until the warm attempt settles; True iff ready."""
        self._done.wait(timeout)
        return self.state == "ready"

    def fn_if_ready(self, args):
        if (self.state in ("rejected", "failed") and self.transient
                and self.attempts < self.MAX_ATTEMPTS):
            with self._lock:
                if self.state in ("rejected", "failed"):
                    self.state = "idle"
                    self.transient = False
                    self._done.clear()
        if self.state == "idle":
            self.kick(args)
        return self.fn if self.state == "ready" else None


_WARMERS: dict = {}


def accel_builder_handle(family: str, n_int_AB: int, n_int_ABC: int,
                         dtype_name: str = "float64"):
    """Warm handle for the accelerator builder of one model config, or
    None when warming does not apply: no accelerator default backend,
    build already routed to the accelerator, a topology deeper than 3x3
    (the f64-emulated accelerator build loses ~100x at 7x7), or
    ``ITRAILS_WARM_ACCEL_BUILDER=0``."""
    if os.environ.get("ITRAILS_WARM_ACCEL_BUILDER", "1") == "0":
        return None
    if max(n_int_AB, n_int_ABC) > 3:
        return None
    if build_device(n_int_AB, n_int_ABC) != "cpu":
        return None  # build already lives on the accelerator
    import jax

    if jax.default_backend() == "cpu":
        return None
    key = (family, n_int_AB, n_int_ABC, dtype_name)
    if key not in _WARMERS:
        _WARMERS[key] = _BuilderWarmer(family, n_int_AB, n_int_ABC,
                                       dtype_name)
    return _WARMERS[key]


# --- model-artifact cache ---------------------------------------------------


def model_artifact_key(family: str, n_int_AB: int, n_int_ABC: int,
                       dtype_name: str, params, cut_AB=None,
                       cut_ABC=None) -> str:
    """Content key for one built model: family/topology/dtype + the exact
    f64 bit patterns of every parameter (and manual cutpoints, if any).
    The package version and a schema tag are folded in so upgrades
    invalidate cleanly."""
    import numpy as np

    from itrails_tpu import __version__

    h = hashlib.sha1()
    h.update(
        f"{_ARTIFACT_SCHEMA}|{__version__}|{family}|{n_int_AB}|{n_int_ABC}|"
        f"{dtype_name}|".encode()
    )
    h.update(np.asarray(params, np.float64).tobytes())
    for cut in (cut_AB, cut_ABC):
        h.update(b"|")
        if cut is not None:
            h.update(np.asarray(cut, np.float64).tobytes())
    return h.hexdigest()


def _artifact_dir() -> str:
    return os.path.join(_cache_root(), "models")


def model_artifact_get(key: str):
    """Load a cached build, or None.  Returns dict of numpy arrays
    (a, b, pi, cut_AB, cut_ABC) in their stored dtype — bit-identical to
    the build that stored them (the key embeds the build dtype)."""
    if os.environ.get("ITRAILS_NO_CACHE"):
        return None
    path = os.path.join(_artifact_dir(), key + ".npz")
    try:
        import numpy as np

        with np.load(path, allow_pickle=False) as z:
            out = {k: z[k] for k in ("a", "b", "pi", "cut_AB", "cut_ABC")}
        os.utime(path)  # LRU touch
        return out
    except Exception:
        return None


def model_artifact_put(key: str, a, b, pi, cut_AB, cut_ABC) -> None:
    if os.environ.get("ITRAILS_NO_CACHE"):
        return
    import numpy as np

    d = _artifact_dir()
    try:
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{key}.{os.getpid()}.tmp")
        with open(tmp, "wb") as f:
            np.savez(f, a=np.asarray(a), b=np.asarray(b),
                     pi=np.asarray(pi), cut_AB=np.asarray(cut_AB),
                     cut_ABC=np.asarray(cut_ABC))
        os.replace(tmp, os.path.join(d, key + ".npz"))
        # LRU prune: keep the newest _ARTIFACT_KEEP entries
        entries = sorted(
            (e for e in os.scandir(d) if e.name.endswith(".npz")),
            key=lambda e: e.stat().st_mtime, reverse=True,
        )
        for e in entries[_ARTIFACT_KEEP:]:
            try:
                os.unlink(e.path)
            except OSError:
                pass
    except Exception:  # cache is an optimization, never a hard failure
        pass
