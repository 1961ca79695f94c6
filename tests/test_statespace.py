"""State-space compiler parity vs the reference implementation
(goldens generated from /root/reference via tools/make_goldens.py)."""

import numpy as np
import pytest

from itrails_tpu.core import statespace as ss
from tests.conftest import load_golden


@pytest.mark.parametrize("n,expected", [(2, 2), (4, 15), (6, 203)])
def test_bell_numbers(n, expected):
    assert ss.bell_number(n) == expected


@pytest.mark.parametrize("species", [1, 2, 3])
def test_state_enumeration_matches_reference(species):
    g = load_golden("statespace.npz")
    ref_states = {tuple(row) for row in g[f"states_{species}"]}
    mine = {tuple(int(v) for v in row) for row in ss.state_space(species).states}
    assert mine == ref_states
    assert len(mine) == ss.bell_number(2 * species)


@pytest.mark.parametrize("species", [1, 2, 3])
def test_rate_matrix_matches_reference(species):
    g = load_golden("statespace.npz")
    ref_states = [tuple(row) for row in g[f"states_{species}"]]
    sp = ss.state_space(species)
    perm = np.array([sp.index[s] for s in ref_states])  # ref idx -> my idx

    for key, coal, rho in (("q_coal", 1.0, 0.0), ("q_rho", 0.0, 1.0)):
        ref_q = g[f"{key}_{species}"]
        mine = sp.rate_matrix(coal, rho)[np.ix_(perm, perm)]
        np.testing.assert_allclose(mine, ref_q, atol=0)


@pytest.mark.parametrize("species", [1, 2, 3])
def test_omega_classification_matches_reference(species):
    g = load_golden("statespace.npz")
    ref_states = [tuple(row) for row in g[f"states_{species}"]]
    ref_omega = g[f"omega_of_state_{species}"]
    sp = ss.state_space(species)
    for state, (lo, ro) in zip(ref_states, ref_omega):
        idx = sp.index[state]
        assert tuple(sp.omega_pairs[idx]) == (lo, ro)


def test_rate_matrix_rows_sum_to_zero():
    for species in (1, 2, 3):
        q = ss.state_space(species).rate_matrix(1.3, 0.4)
        np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-12)


def test_combine_map_is_doubly_stochastic_partition():
    # Every product state maps to exactly one combined state.
    for s1, s2 in ((1, 1), (2, 1)):
        c = ss.combine_partitions_map(s1, s2)
        np.testing.assert_allclose(c.sum(axis=0), 1.0)
