"""Sequence-parallel forward vs the sequential decoder."""

import jax.numpy as jnp
import numpy as np

from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import decoders
from itrails_tpu.hmm.longseq import forward_loglik_long
from tests.conftest import load_golden


def _model():
    m = load_golden("model_1x2.npz")
    a = jnp.asarray(m["a"])
    bfull = decoders.emission_table(jnp.asarray(m["b"]), aggregation_matrix())
    return a, bfull, jnp.asarray(m["pi"])


def test_long_forward_matches_sequential():
    a, bfull, pi = _model()
    rng = np.random.default_rng(5)
    for t_len, chunk in ((1000, 64), (513, 128), (64, 256), (2, 16)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        ll_long = float(forward_loglik_long(a, bfull, pi, tokens, chunk=chunk))
        _, ll_seq = decoders.forward(a, bfull, pi, tokens[None])
        np.testing.assert_allclose(ll_long, float(ll_seq[0]), rtol=1e-9,
                                   err_msg=f"T={t_len} chunk={chunk}")


def test_long_forward_handles_exact_multiple():
    a, bfull, pi = _model()
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(0, 625, size=257), jnp.int32)  # 1+256
    ll_long = float(forward_loglik_long(a, bfull, pi, tokens, chunk=256))
    _, ll_seq = decoders.forward(a, bfull, pi, tokens[None])
    np.testing.assert_allclose(ll_long, float(ll_seq[0]), rtol=1e-9)


def test_posterior_long_matches_sequential():
    from itrails_tpu.hmm.longseq import posterior_long

    a, bfull, pi = _model()
    rng = np.random.default_rng(9)
    for t_len, chunk in ((700, 64), (256, 64), (129, 128)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        post_long = np.asarray(posterior_long(a, bfull, pi, tokens, chunk=chunk))
        post_seq = np.asarray(decoders.posterior(a, bfull, pi, tokens[None]))[:, 0, :]
        np.testing.assert_allclose(post_long, post_seq, rtol=5e-6, atol=1e-9,
                                   err_msg=f"T={t_len} chunk={chunk}")


def test_viterbi_long_matches_sequential():
    from itrails_tpu.hmm.longseq import viterbi_long

    a, bfull, pi = _model()
    rng = np.random.default_rng(11)
    for t_len, chunk in ((500, 64), (257, 128), (64, 64)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        path_long = viterbi_long(a, bfull, pi, tokens, chunk=chunk)
        path_seq = np.asarray(decoders.viterbi(a, bfull, pi, tokens[None]))[0]
        np.testing.assert_array_equal(path_long, path_seq,
                                      err_msg=f"T={t_len} chunk={chunk}")


def test_viterbi_segmented_matches_sequential():
    from itrails_tpu.hmm.longseq import viterbi_segmented

    a, bfull, pi = _model()
    rng = np.random.default_rng(13)
    for t_len, chunk, seg in ((900, 32, 4), (257, 16, 2), (64, 64, 1),
                              (1025, 128, 3), (2, 8, 2)):
        tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)
        path_seg = viterbi_segmented(a, bfull, pi, tokens, chunk=chunk,
                                     seg_chunks=seg)
        path_ref = np.asarray(decoders.viterbi(a, bfull, pi, tokens[None]))[0]
        np.testing.assert_array_equal(path_seg, path_ref,
                                      err_msg=f"T={t_len} chunk={chunk} seg={seg}")


def test_viterbi_segmented_matches_viterbi_long():
    from itrails_tpu.hmm.longseq import viterbi_long, viterbi_segmented

    a, bfull, pi = _model()
    rng = np.random.default_rng(14)
    tokens = jnp.asarray(rng.integers(0, 625, size=3001), jnp.int32)
    p1 = viterbi_segmented(a, bfull, pi, tokens, chunk=64, seg_chunks=8)
    p2 = viterbi_long(a, bfull, pi, tokens, chunk=64)
    np.testing.assert_array_equal(p1, p2)
