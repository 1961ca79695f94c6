"""Parity of cutpoints, emissions and the full (a, b, pi) model build."""

import numpy as np
import pytest

from itrails_tpu.core.cutpoints import cutpoints_ab, cutpoints_abc
from itrails_tpu.core.model import build_model
from itrails_tpu.core.schedule import hidden_state_list
from tests.conftest import load_golden

PARAMS = dict(t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004,
              t_upper=0.00745069, t_out=0.009312, N_AB=0.0005, N_ABC=0.0005,
              r=1.0)
PARAMS2 = dict(t_A=0.002, t_B=0.0031, t_C=0.0041, t_2=0.0007, t_upper=0.005,
               t_out=0.01, N_AB=0.0002, N_ABC=0.0006, r=0.4)


def test_cutpoints_match_reference():
    g = load_golden("cutpoints.npz")
    for n in (1, 2, 3, 5):
        np.testing.assert_allclose(
            np.asarray(cutpoints_ab(n, 0.8, 1.3)), g[f"cut_AB_{n}"], rtol=1e-12
        )
        ref = g[f"cut_ABC_{n}"]
        mine = np.asarray(cutpoints_abc(n, 0.7))
        np.testing.assert_allclose(mine[:-1], ref[:-1], rtol=1e-12)
        assert np.isinf(ref[-1]) and mine[-1] == 0.0


CASES = [("1x2", PARAMS, 1, 2), ("3x3", PARAMS, 3, 3), ("2x3_p2", PARAMS2, 2, 3)]


@pytest.mark.parametrize("tag,params,n_ab,n_abc", CASES)
def test_model_matches_reference(tag, params, n_ab, n_abc):
    g = load_golden(f"model_{tag}.npz")
    model = build_model(n_int_AB=n_ab, n_int_ABC=n_abc, **params)

    ref_hidden = [tuple(row) for row in g["hidden"]]
    assert model.hidden_states == ref_hidden
    assert model.hidden_states == hidden_state_list(n_ab, n_abc)

    # observed token order must be the canonical 4-mer order
    obs = list(g["observed"])
    alphabet = "ACTG"
    expect = [a + b + c + d for a in alphabet for b in alphabet
              for c in alphabet for d in alphabet]
    assert obs == expect

    np.testing.assert_allclose(np.asarray(model.pi), g["pi"], rtol=1e-7, atol=1e-13)
    np.testing.assert_allclose(np.asarray(model.a), g["a"], rtol=1e-6, atol=1e-13)
    np.testing.assert_allclose(np.asarray(model.b), g["b"], rtol=1e-6, atol=1e-13)


def test_model_invariants():
    model = build_model(n_int_AB=2, n_int_ABC=2, **PARAMS)
    a = np.asarray(model.a)
    b = np.asarray(model.b)
    pi = np.asarray(model.pi)
    np.testing.assert_allclose(a.sum(1), 1.0, atol=1e-9)
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-9)
    np.testing.assert_allclose(b.sum(1), 1.0, atol=1e-8)
    assert (b >= -1e-15).all()


def test_cutpoints_ab_extreme_truncation_stays_finite():
    """coal*t > ~37 rounds the naive truncation mass 1 - exp(-a) to
    exactly 1.0 in f64 and the last quantile overflows to inf (hit
    mid-optimization at an N_AB bound corner by the 2x2 trajectory
    golden); the expm1 form plus the exact endpoint must stay finite with
    the last cutpoint exactly t_AB."""
    import jax.numpy as jnp

    from itrails_tpu.core.cutpoints import cutpoints_ab

    for coal, t_ab in ((15.7, 2.43), (50.0, 5.0), (1000.0, 1.0)):
        cut = np.asarray(cutpoints_ab(4, t_ab, coal, jnp.float64))
        assert np.isfinite(cut).all(), (coal, t_ab, cut)
        assert cut[0] == 0.0
        assert cut[-1] == t_ab
        assert (np.diff(cut) > 0).all()
