"""Mesh-sharded sequence parallelism vs the single-device decoders."""

import jax.numpy as jnp
import numpy as np

from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import decoders
from itrails_tpu.hmm.longseq import forward_loglik_long
from itrails_tpu.hmm.longseq_sharded import (
    sharded_forward_loglik_long,
    sharded_posterior_long,
)
from itrails_tpu.hmm.sharding import data_mesh
from tests.conftest import load_golden


def _model():
    m = load_golden("model_1x2.npz")
    a = jnp.asarray(m["a"])
    bfull = decoders.emission_table(jnp.asarray(m["b"]), aggregation_matrix())
    return a, bfull, jnp.asarray(m["pi"])


def test_sharded_long_loglik_matches_sequential():
    a, bfull, pi = _model()
    mesh = data_mesh()
    rng = np.random.default_rng(21)
    for t_len, chunk in ((3000, 32), (513, 64), (9, 8)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        ll_sh = float(
            sharded_forward_loglik_long(a, bfull, pi, tokens, mesh, chunk=chunk)
        )
        _, ll_seq = decoders.forward(a, bfull, pi, tokens[None])
        np.testing.assert_allclose(ll_sh, float(ll_seq[0]), rtol=1e-9,
                                   err_msg=f"T={t_len} chunk={chunk}")


def test_sharded_long_loglik_matches_single_device_long():
    a, bfull, pi = _model()
    mesh = data_mesh()
    rng = np.random.default_rng(22)
    tokens = jnp.asarray(rng.integers(0, 625, size=1777), jnp.int32)
    ll_sh = float(
        sharded_forward_loglik_long(a, bfull, pi, tokens, mesh, chunk=64)
    )
    ll_1 = float(forward_loglik_long(a, bfull, pi, tokens, chunk=64))
    np.testing.assert_allclose(ll_sh, ll_1, rtol=1e-9)


def test_sharded_posterior_long_matches_sequential():
    a, bfull, pi = _model()
    mesh = data_mesh()
    rng = np.random.default_rng(23)
    for t_len, chunk in ((1500, 32), (257, 16), (40, 8)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        post_sh = sharded_posterior_long(a, bfull, pi, tokens, mesh,
                                         chunk=chunk)
        post_seq = np.asarray(
            decoders.posterior(a, bfull, pi, tokens[None])
        )[:, 0, :]
        assert post_sh.shape == post_seq.shape
        np.testing.assert_allclose(post_sh, post_seq, rtol=5e-6, atol=1e-9,
                                   err_msg=f"T={t_len} chunk={chunk}")
        np.testing.assert_allclose(post_sh.sum(axis=1), 1.0, rtol=1e-12)


def test_sharded_posterior_long_with_ambiguity_tokens():
    a, bfull, pi = _model()
    mesh = data_mesh()
    rng = np.random.default_rng(24)
    tokens = jnp.asarray(rng.integers(0, 625, size=333), jnp.int32)
    # force some N-containing tokens (indices >= 256)
    tokens = tokens.at[::7].set(624)
    post_sh = sharded_posterior_long(a, bfull, pi, tokens, mesh, chunk=16)
    post_seq = np.asarray(decoders.posterior(a, bfull, pi, tokens[None]))[:, 0, :]
    np.testing.assert_allclose(post_sh, post_seq, rtol=5e-6, atol=1e-9)


def test_sharded_viterbi_long_matches_sequential():
    from itrails_tpu.hmm.longseq_sharded import sharded_viterbi_long

    a, bfull, pi = _model()
    mesh = data_mesh()
    rng = np.random.default_rng(25)
    for t_len, chunk in ((1200, 16), (257, 8), (2, 8)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        path_sh = sharded_viterbi_long(a, bfull, pi, tokens, mesh, chunk=chunk)
        path_ref = np.asarray(decoders.viterbi(a, bfull, pi, tokens[None]))[0]
        np.testing.assert_array_equal(path_sh, path_ref,
                                      err_msg=f"T={t_len} chunk={chunk}")


def test_sharded_viterbi_segmented_matches_sequential():
    from itrails_tpu.hmm.longseq import viterbi_segmented
    from itrails_tpu.hmm.longseq_sharded import sharded_viterbi_segmented

    a, bfull, pi = _model()
    mesh = data_mesh()
    rng = np.random.default_rng(26)
    for t_len, chunk, seg_chunks in ((3000, 16, 8), (513, 8, 8), (1, 8, 8)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        path_sh = sharded_viterbi_segmented(
            a, bfull, pi, tokens, mesh, chunk=chunk, seg_chunks=seg_chunks
        )
        path_seg = viterbi_segmented(a, bfull, pi, tokens, chunk=chunk,
                                     seg_chunks=seg_chunks)
        path_ref = np.asarray(decoders.viterbi(a, bfull, pi, tokens[None]))[0]
        np.testing.assert_array_equal(path_sh, path_ref,
                                      err_msg=f"T={t_len}")
        np.testing.assert_array_equal(path_seg, path_ref,
                                      err_msg=f"T={t_len} (single-dev)")
