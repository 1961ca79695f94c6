"""Background accelerator-builder warmer (utils/cache.py).

The warmer lets optimizer evaluations start on the CPU builder immediately
while the accelerator builder compiles in a daemon thread, then switches
the hot loop once the compiled builder passes a parity + speed check.  On
this CPU-only test platform the gate itself must stay closed (there is no
accelerator); the mechanism is exercised by instantiating the warmer
directly with both "devices" mapped to CPU builders.
"""

import numpy as np
import pytest

from itrails_tpu.utils.cache import _BuilderWarmer, accel_builder_handle

PLAIN_ARGS = (0.0024, 0.0024, 0.0024, 0.0004, 0.00745069, 0.009312,
              0.0005, 0.0005, 1.0)


def test_handle_gate_closed_without_accelerator():
    # default backend here is cpu -> warming never applies
    assert accel_builder_handle("plain", 1, 1, "float64") is None


def test_handle_gate_closed_for_deep_topologies():
    # even if an accelerator were present, 7x7 must never warm (the
    # f64-emulated accelerator build loses ~100x there)
    assert accel_builder_handle("plain", 7, 7, "float64") is None


def _cpu_only_warmer(monkeypatch, accel_wrap=None):
    """A warmer whose 'accelerator' builder is the CPU builder (optionally
    wrapped), so the full thread/verify/switch path runs on this platform."""
    w = _BuilderWarmer("plain", 1, 1, "float64")
    w.SLOWDOWN_LIMIT = 1e6  # timing jitter must not flake the test
    real_make = _BuilderWarmer._make_fn

    def fake_make(self, device):
        fn = real_make(self, "cpu")
        if device is None and accel_wrap is not None:
            return accel_wrap(fn)
        return fn

    monkeypatch.setattr(_BuilderWarmer, "_make_fn", fake_make)
    return w


def test_warmer_switches_after_compile(monkeypatch):
    w = _cpu_only_warmer(monkeypatch)
    assert w.fn_if_ready(PLAIN_ARGS) is None  # kick: still compiling
    assert w.wait(120.0), w.detail
    fn = w.fn_if_ready(PLAIN_ARGS)
    assert fn is not None
    from itrails_tpu.core.model import build_model_fn

    ref = build_model_fn(1, 1, "float64", device="cpu")(*PLAIN_ARGS)
    out = fn(*PLAIN_ARGS)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=1e-12, atol=0)
    assert w.warm_seconds is not None and w.warm_seconds > 0


def test_warmer_rejects_on_parity_mismatch(monkeypatch):
    def corrupt(fn):
        def bad(*args, **kwargs):
            a, b, pi, cab, cabc = fn(*args, **kwargs)
            return a * (1.0 + 1e-3), b, pi, cab, cabc

        return bad

    w = _cpu_only_warmer(monkeypatch, accel_wrap=corrupt)
    w.kick(PLAIN_ARGS)
    assert not w.wait(120.0)
    assert w.state == "rejected"
    assert "parity" in w.detail
    assert w.fn_if_ready(PLAIN_ARGS) is None  # never switches


def test_warmer_failure_is_contained(monkeypatch):
    def boom(fn):
        def bad(*args, **kwargs):
            raise RuntimeError("compile exploded")

        return bad

    w = _cpu_only_warmer(monkeypatch, accel_wrap=boom)
    w.kick(PLAIN_ARGS)
    assert not w.wait(120.0)
    assert w.state == "failed"
    assert "compile exploded" in w.detail
    assert w.fn_if_ready(PLAIN_ARGS) is None


@pytest.mark.slow
def test_engine_switch_preserves_loglik(monkeypatch):
    """End to end: an engine whose warm handle resolves (to a CPU 'accel'
    builder) must produce the same loglik before and after the switch."""
    from itrails_tpu.optim.cases import resolve_times
    from itrails_tpu.optim.optimizer import LoglikEngine

    rng = np.random.default_rng(7)
    v_lst = [rng.integers(0, 625, size=120).astype(np.int64)]
    eng = LoglikEngine(v_lst, 1, 1, dtype="float64")
    assert eng._warm is None  # gate closed on this platform
    eng._warm = _cpu_only_warmer(monkeypatch)

    fixed = {"n_int_AB": 1, "n_int_ABC": 1, "t_2": 0.0004,
             "t_upper": 0.00745069, "N_AB": 0.0005, "r": 1.0,
             "t_1": 0.0024, "N_ABC": 0.0005}
    params = resolve_times(frozenset(["t_1"]), dict(fixed))
    ll_cpu = eng.loglik(params)  # kicks the warm thread
    assert eng._warm.wait(120.0), eng._warm.detail
    ll_warm = eng.loglik(params)  # served by the switched builder
    np.testing.assert_allclose(ll_warm, ll_cpu, rtol=1e-12)


def test_warmer_rejects_nonfinite_verify_point(monkeypatch):
    """A bound-corner start that builds to non-finite values must refuse
    the switch (the parity comparison would otherwise be vacuous)."""
    w = _cpu_only_warmer(monkeypatch)
    bad_args = (1e3, 1e3, 1e3, 1e3, 1e3, 2e3, 1e-30, 1e-30, 1e3)
    w.kick(bad_args)
    assert not w.wait(120.0)
    assert w.state in ("rejected", "failed"), w.detail
    assert w.fn_if_ready(bad_args) is None


def test_warmer_retries_transient_failure(monkeypatch):
    """A transient compile failure must retry on a later call (up to
    MAX_ATTEMPTS) and succeed; a parity mismatch stays rejected."""
    calls = {"n": 0}

    def flaky(fn):
        def f(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient tunnel flake")
            return fn(*a, **k)

        return f

    w = _cpu_only_warmer(monkeypatch, accel_wrap=flaky)
    w.kick(PLAIN_ARGS)
    assert not w.wait(120.0)
    assert w.state == "failed" and w.transient
    assert w.fn_if_ready(PLAIN_ARGS) is None  # triggers the retry
    assert w.wait(120.0), w.detail  # second attempt succeeds
    assert w.fn_if_ready(PLAIN_ARGS) is not None
    assert w.attempts == 2
