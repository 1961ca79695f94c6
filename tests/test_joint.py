"""End-to-end parity of the transition-probability pipeline (state-space
compiler + schedule + jitted executor) against reference goldens."""

import jax.numpy as jnp
import numpy as np
import pytest

from itrails_tpu.core.ctmc import joint_matrix
from itrails_tpu.core.schedule import build_plan, hidden_state_list
from tests.conftest import load_golden

# parameter sets used by tools/make_goldens.py
PARAMS = dict(t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004, N_AB=0.0005,
              N_ABC=0.0005, r=1.0)
PARAMS2 = dict(t_A=0.002, t_B=0.0031, t_C=0.0041, t_2=0.0007, N_AB=0.0002,
               N_ABC=0.0006, r=0.4)


def compute_joint(params, n_int_AB, n_int_ABC, cut_ab, cut_abc):
    n_ref = params["N_ABC"]
    coal_ab = n_ref / params["N_AB"]
    rho = n_ref * params["r"]
    plan = build_plan(n_int_AB, n_int_ABC)
    joint = joint_matrix(
        plan,
        coal_A=coal_ab,
        coal_B=coal_ab,
        coal_C=coal_ab,
        coal_AB=coal_ab,
        coal_ABC=1.0,
        rho_A=rho,
        rho_B=rho,
        rho_C=rho,
        rho_AB=rho,
        rho_ABC=rho,
        t_A=params["t_A"] / n_ref,
        t_B=params["t_B"] / n_ref,
        t_C=params["t_C"] / n_ref,
        cut_AB=cut_ab,
        cut_ABC=np.concatenate([cut_abc[:-1], [0.0]]),  # last entry unused
        dtype=jnp.float64,
    )
    return plan, np.asarray(joint)


CASES = [
    ("1x2", PARAMS, 1, 2),
    ("2x2", PARAMS, 2, 2),
    ("2x3_p2", PARAMS2, 2, 3),
    ("3x3", PARAMS, 3, 3),
]


@pytest.mark.parametrize("tag,params,n_ab,n_abc", CASES)
def test_joint_matches_reference(tag, params, n_ab, n_abc):
    g = load_golden(f"joint_{tag}.npz")
    plan, joint = compute_joint(params, n_ab, n_abc, g["cut_ab"], g["cut_abc"])

    hidden = hidden_state_list(n_ab, n_abc)
    hidden_idx = {h: i for i, h in enumerate(hidden)}
    ref = np.zeros_like(joint)
    for row, val in zip(g["keys"], g["vals"]):
        li = hidden_idx[tuple(row[:3])]
        ri = hidden_idx[tuple(row[3:])]
        ref[li, ri] = val

    assert abs(joint.sum() - 1.0) < 1e-9
    np.testing.assert_allclose(joint, ref, rtol=1e-7, atol=1e-14)
