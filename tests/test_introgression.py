"""Introgression-model parity vs the reference legacy table engine."""

import numpy as np
import pytest

from itrails_tpu.core.schedule import hidden_state_list
from itrails_tpu.core.statespace import partial_state_space
from itrails_tpu.introgression.builder import build_model_introgression
from tests.conftest import load_golden

INT_PARAMS = dict(
    t_A=0.0024, t_B=0.0016, t_C=0.0016, t_2=0.0004, t_upper=0.00745069,
    t_out=0.009312, t_m=0.0008, N_AB=0.0005, N_BC=0.0004, N_ABC=0.0005,
    r=1.0, m=0.1,
)


def test_partial_spaces_match_reference_size():
    # reference hard-codes 2x5-state missing-lineage chains
    # (int_get_joint_prob_mat.py:306-339)
    assert partial_state_space((0, 1), (0,)).n_states == 5
    assert partial_state_space((0,), (0, 1)).n_states == 5


@pytest.mark.parametrize("tag,n_ab,n_abc", [("1x2", 1, 2), ("2x2", 2, 2),
                                            ("3x3", 3, 3)])
def test_int_model_matches_reference(tag, n_ab, n_abc):
    g = load_golden(f"int_model_{tag}.npz")
    model = build_model_introgression(n_int_AB=n_ab, n_int_ABC=n_abc,
                                      **INT_PARAMS)
    ref_hidden = [tuple(row) for row in g["hidden"]]
    assert model.hidden_states == hidden_state_list(n_ab, n_abc, True)
    assert model.hidden_states == ref_hidden

    np.testing.assert_allclose(np.asarray(model.pi), g["pi"], rtol=1e-6,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(model.a), g["a"], rtol=1e-5,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(model.b), g["b"], rtol=1e-6,
                               atol=1e-12)


def test_int_model_invariants():
    model = build_model_introgression(n_int_AB=2, n_int_ABC=2, **INT_PARAMS)
    np.testing.assert_allclose(float(np.asarray(model.pi).sum()), 1.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.b).sum(1), 1.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.a).sum(1), 1.0, atol=1e-8)
