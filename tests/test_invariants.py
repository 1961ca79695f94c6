"""Model invariants at configurations without reference goldens."""

import numpy as np
import pytest

from itrails_tpu.core.model import build_model
from itrails_tpu.introgression.builder import build_model_introgression

PARAMS = dict(t_A=0.0021, t_B=0.0026, t_C=0.003, t_2=0.0005,
              t_upper=0.006, t_out=0.0095, N_AB=0.0004, N_ABC=0.0006, r=0.8)


@pytest.mark.parametrize("n_ab,n_abc", [(4, 2), (2, 4), (1, 5)])
def test_plain_model_invariants_asymmetric(n_ab, n_abc):
    m = build_model(n_int_AB=n_ab, n_int_ABC=n_abc, **PARAMS)
    a = np.asarray(m.a)
    pi = np.asarray(m.pi)
    b = np.asarray(m.b)
    n_states = n_ab * n_abc + 3 * n_abc + 3 * (n_abc * (n_abc - 1)) // 2
    assert len(pi) == n_states
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-8)
    np.testing.assert_allclose(a.sum(1), 1.0, atol=1e-8)
    np.testing.assert_allclose(b.sum(1), 1.0, atol=1e-7)
    assert (np.asarray(m.a) >= -1e-12).all()
    # exchangeability: the joint is symmetric, so pi-weighted a is symmetric
    joint = a * pi[:, None]
    np.testing.assert_allclose(joint, joint.T, rtol=1e-6, atol=1e-14)


def test_int_model_invariants_asymmetric():
    m = build_model_introgression(
        n_int_AB=3, n_int_ABC=2, t_A=0.0024, t_B=0.0014, t_C=0.0015,
        t_2=0.0004, t_upper=0.006, t_out=0.0095, t_m=0.001, N_AB=0.0004,
        N_BC=0.0003, N_ABC=0.0005, r=0.9, m=0.25,
    )
    pi = np.asarray(m.pi)
    n_states = 2 * 3 * 2 + 3 * 2 + 3 * 1
    assert len(pi) == n_states
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.b).sum(1), 1.0, atol=1e-7)


def test_config_validation_errors(tmp_path):
    from itrails_tpu.cli.common import prepare_optimize_setup

    base = {
        "fixed_parameters": {"mu": 1e-8, "t_2": 40000, "N_AB": 50000,
                             "N_ABC": 50000, "r": 1e-8, "t_upper": 700000},
        "optimized_parameters": {},
        "settings": {"n_int_AB": 3, "n_int_ABC": 3, "method": "Nelder-Mead"},
    }
    # invalid time combination
    cfg = {**base, "fixed_parameters": {**base["fixed_parameters"],
                                        "t_A": 1.0}}
    with pytest.raises(ValueError, match="Invalid combination"):
        prepare_optimize_setup(cfg)
    # both fixed and optimized
    cfg = {**base,
           "fixed_parameters": {**base["fixed_parameters"], "t_1": 240000},
           "optimized_parameters": {"t_1": [240000, 1000, 1e7]}}
    with pytest.raises(ValueError, match="both fixed and optimized"):
        prepare_optimize_setup(cfg)
    # t_out must be fixed
    cfg = {**base,
           "fixed_parameters": {**base["fixed_parameters"], "t_1": 240000},
           "optimized_parameters": {"t_out": [1e6, 1e5, 1e7]}}
    with pytest.raises(ValueError, match="t_out"):
        prepare_optimize_setup(cfg)
    # bad method
    cfg = {**base, "fixed_parameters": {**base["fixed_parameters"],
                                        "t_1": 240000}}
    cfg["settings"] = {**cfg["settings"], "method": "adam"}
    with pytest.raises(ValueError, match="Method"):
        prepare_optimize_setup(cfg)
    # negative t_upper
    cfg = {**base, "fixed_parameters": {**base["fixed_parameters"],
                                        "t_1": 240000, "t_upper": -5.0}}
    with pytest.raises(ValueError, match="t_upper"):
        prepare_optimize_setup(cfg)
