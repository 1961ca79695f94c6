"""Data-parallel decoding on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import decoders, sharding, windows
from tests.conftest import load_golden


def _model():
    m = load_golden("model_1x2.npz")
    a = jnp.asarray(m["a"])
    bfull = decoders.emission_table(jnp.asarray(m["b"]), aggregation_matrix())
    return a, bfull, jnp.asarray(m["pi"])


def test_eight_virtual_devices_available():
    assert jax.device_count() == 8


def test_sharded_loglik_matches_local():
    a, bfull, pi, = _model()
    h = load_golden("hmm_1x2.npz")
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 625, size=n) for n in (100, 257, 31, 400, 8, 123)]
    tokens, lengths, owner = windows.pack_windows(seqs, pad_windows_to=8)
    assert tokens.shape[0] % 8 == 0

    mesh = sharding.data_mesh()
    ll_sharded = sharding.sharded_forward_loglik(a, bfull, pi, tokens, mesh)

    ll_ref = 0.0
    for s in seqs:
        _, ll = decoders.forward(a, bfull, pi, jnp.asarray(s, jnp.int32)[None])
        ll_ref += float(ll[0])
    np.testing.assert_allclose(float(ll_sharded), ll_ref, rtol=1e-10)


def test_sharded_posterior_and_viterbi_match_unsharded():
    a, bfull, pi = _model()
    rng = np.random.default_rng(1)
    seqs = [rng.integers(0, 625, size=n) for n in (64, 120, 99)]
    tokens, lengths, owner = windows.pack_windows(seqs, pad_windows_to=8)
    mesh = sharding.data_mesh()

    post_sh = np.asarray(sharding.sharded_posterior(a, bfull, pi, jnp.asarray(tokens), mesh))
    vit_sh = np.asarray(sharding.sharded_viterbi(a, bfull, pi, jnp.asarray(tokens), mesh))

    post_local = np.asarray(decoders.posterior(a, bfull, pi, jnp.asarray(tokens)))
    vit_local = np.asarray(decoders.viterbi(a, bfull, pi, jnp.asarray(tokens)))
    np.testing.assert_allclose(post_sh, post_local, rtol=1e-12)
    np.testing.assert_array_equal(vit_sh, vit_local)

    rows = windows.unpack_rows(post_sh.transpose(1, 0, 2), lengths, owner, len(seqs))
    assert [r.shape[0] for r in rows] == [64, 120, 99]
    np.testing.assert_allclose(rows[0].sum(axis=1), 1.0, atol=1e-9)
