"""The 133-state flagship configuration (BASELINE config 3: 7x7 intervals).

Structural invariants of the full-size model build (reference state count:
get_emission_prob_mat.py:789-791) plus golden parity at 4x4 / 7x7 when the
reference-generated fixtures exist (tools/make_goldens.py --only model4x4 /
model7x7 — hours of pure-Python reference runtime)."""

import numpy as np
import pytest

from tests.conftest import load_golden


@pytest.fixture(scope="module")
def model77():
    from itrails_tpu.core.model import build_model

    return build_model(
        t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004,
        t_upper=0.00745069, t_out=0.009312, N_AB=0.0005, N_ABC=0.0005,
        r=1.0, n_int_AB=7, n_int_ABC=7, dtype="float64", device="cpu",
    )


@pytest.mark.slow
def test_7x7_invariants(model77):
    a = np.asarray(model77.a)
    b = np.asarray(model77.b)
    pi = np.asarray(model77.pi)
    assert len(pi) == 7 * 7 + 3 * 7 + 3 * (7 * 6 // 2) == 133
    assert len(model77.hidden_states) == 133
    np.testing.assert_allclose(a.sum(1), 1.0, atol=1e-9)
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-9)
    np.testing.assert_allclose(b.sum(1), 1.0, atol=1e-6)
    assert (a >= -1e-15).all() and (b >= -1e-12).all() and (pi >= 0).all()
    # detailed-balance-like symmetry of the joint (reference
    # get_tab.py:292-316): joint = pi_i * a_ij is symmetric
    joint = pi[:, None] * a
    np.testing.assert_allclose(joint, joint.T, rtol=1e-6, atol=1e-14)


@pytest.mark.slow
def test_7x7_decoders_run(model77):
    import jax.numpy as jnp

    from itrails_tpu.data.tokens import aggregation_matrix
    from itrails_tpu.hmm import decoders

    a = jnp.asarray(model77.a)
    pi = jnp.asarray(model77.pi)
    bfull = decoders.emission_table(
        jnp.asarray(model77.b), jnp.asarray(aggregation_matrix(), jnp.float64)
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 625, size=(2, 200)), jnp.int32)
    ll = float(decoders.forward_loglik(a, bfull, pi, tokens))
    assert np.isfinite(ll)
    post = np.asarray(decoders.posterior(a, bfull, pi, tokens))
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-9)
    path = np.asarray(decoders.viterbi(a, bfull, pi, tokens))
    assert path.shape == (2, 200) and (path < 133).all()


def _golden_parity(tag, n_ab, n_abc):
    from itrails_tpu.core.model import build_model

    g = load_golden(f"model_{tag}.npz")
    m = build_model(
        t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004,
        t_upper=0.00745069, t_out=0.009312, N_AB=0.0005, N_ABC=0.0005,
        r=1.0, n_int_AB=n_ab, n_int_ABC=n_abc, dtype="float64", device="cpu",
    )
    np.testing.assert_allclose(np.asarray(m.pi), g["pi"], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(m.a), g["a"], rtol=1e-6,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.b), g["b"], rtol=1e-5,
                               atol=1e-12)
    hidden = np.array([list(h) for h in m.hidden_states])
    np.testing.assert_array_equal(hidden, g["hidden"])


@pytest.mark.slow
def test_model_4x4_matches_reference():
    _golden_parity("4x4", 4, 4)


@pytest.mark.slow
def test_model_7x7_matches_reference():
    _golden_parity("7x7", 7, 7)
