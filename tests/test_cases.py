"""Time-parameterization case algebra vs the reference formulas
(optimizer.py:417-541, int_optimizer.py:397-588), transcribed independently
here as the oracle."""

import math

import numpy as np
import pytest

from itrails_tpu.optim.cases import (
    ALLOWED_CASES,
    resolve_times,
    resolve_times_introgression,
)

D = dict(t_2=0.0004, t_upper=0.006, N_AB=0.0004, N_ABC=0.0005, r=1.0,
         n_int_AB=3, n_int_ABC=3)


def _cut_last(n):
    # cutpoints_ABC(n, 1)[-2] == log(n)
    return math.log(n)


def _tail(d):
    return _cut_last(d["n_int_ABC"]) * d["N_ABC"] + d["t_upper"] + 2 * d["N_ABC"]


def test_case_t1_only():
    d = dict(D, t_1=0.0024)
    out = resolve_times(frozenset(["t_1"]), d)
    assert out["t_A"] == out["t_B"] == 0.0024
    assert out["t_C"] == 0.0024 + D["t_2"]
    np.testing.assert_allclose(out["t_out"], 0.0024 + D["t_2"] + _tail(D))


def test_case_tA_tB_tC():
    d = dict(D, t_A=0.002, t_B=0.003, t_C=0.004)
    out = resolve_times(frozenset(["t_A", "t_B", "t_C"]), d)
    mid = (0.002 + 0.003) / 2 + D["t_2"]
    np.testing.assert_allclose(out["t_out"], (mid + 0.004) / 2 + _tail(D))


def test_case_tA_tC_derives_tB():
    d = dict(D, t_A=0.002, t_C=0.004)
    out = resolve_times(frozenset(["t_A", "t_C"]), d)
    t_b = (0.002 + 0.004 - D["t_2"]) / 2
    np.testing.assert_allclose(out["t_B"], t_b)
    mid = (0.002 + t_b) / 2 + D["t_2"]
    np.testing.assert_allclose(out["t_out"], (mid + 0.004) / 2 + _tail(D))


def test_fixed_t_out_always_wins():
    d = dict(D, t_1=0.0024, t_out=0.123)
    out = resolve_times(frozenset(["t_1"]), d)
    assert out["t_out"] == 0.123


def test_invalid_case_raises():
    with pytest.raises(ValueError):
        resolve_times(frozenset(["t_A"]), dict(D, t_A=1.0))
    assert frozenset(["t_A"]) not in ALLOWED_CASES


def test_int_case_t1():
    d = dict(D, t_1=0.0024, t_m=0.0008)
    out = resolve_times_introgression(frozenset(["t_1"]), d)
    assert out["t_A"] == 0.0024
    assert out["t_B"] == out["t_C"] == 0.0024 - 0.0008
    np.testing.assert_allclose(out["t_out"], 0.0024 + D["t_2"] + _tail(D))


def test_int_case_tA_tB_tC():
    d = dict(D, t_A=0.002, t_B=0.0015, t_C=0.0014, t_m=0.0008)
    out = resolve_times_introgression(frozenset(["t_A", "t_B", "t_C"]), d)
    expect = ((0.002 + (0.0015 + 0.0008)) / 2 + D["t_2"]) + (
        0.0014 + 0.0008 + D["t_2"]
    ) / 2 + _tail(D)
    np.testing.assert_allclose(out["t_out"], expect)


def test_int_case_tA_tB_derives_tC():
    d = dict(D, t_A=0.002, t_B=0.0015, t_m=0.0008)
    out = resolve_times_introgression(frozenset(["t_A", "t_B"]), d)
    np.testing.assert_allclose(out["t_C"], (0.0015 + 0.002 + 0.0008) / 2)
