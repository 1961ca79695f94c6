"""Parity tests for the fused Pallas Viterbi kernel (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm import decoders, pallas_viterbi


def _random_model(m, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    bfull = rng.random((m, 625)) * 0.01 + 1e-4
    pi = rng.random(m)
    pi /= pi.sum()
    return (
        jnp.asarray(a, jnp.float32),
        jnp.asarray(bfull, jnp.float32),
        jnp.asarray(pi, jnp.float32),
    )


@pytest.mark.parametrize("m", [27, 133])
def test_fused_viterbi_matches_scan(m):
    a, bfull, pi = _random_model(m)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 625, size=(3, 53)), jnp.int32)
    p_ref = np.asarray(decoders.viterbi(a, bfull, pi, tokens))
    p_ker = np.asarray(pallas_viterbi.viterbi_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=8, interpret=True
    ))
    np.testing.assert_array_equal(p_ker, p_ref)


@pytest.mark.parametrize("m", [27, 133])
def test_fused_viterbi_respects_padding(m):
    a, bfull, pi = _random_model(m, seed=2)
    rng = np.random.default_rng(3)
    tokens = np.asarray(rng.integers(0, 625, size=(3, 40)), np.int32)
    tokens[1, 25:] = PAD_TOKEN
    tokens[2, 6:] = PAD_TOKEN
    p_ref = np.asarray(decoders.viterbi(a, bfull, pi, jnp.asarray(tokens)))
    p_ker = np.asarray(pallas_viterbi.viterbi_fused(
        a, bfull, pi, jnp.asarray(tokens), block_w=128, chunk_t=8,
        interpret=True,
    ))
    np.testing.assert_array_equal(p_ker, p_ref)


def test_viterbi_fast_dispatch_cpu():
    a, bfull, pi = _random_model(9, seed=4)
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, 625, size=(2, 31)), jnp.int32)
    p_fast = np.asarray(decoders.viterbi_fast(a, bfull, pi, tokens))
    p_ref = np.asarray(decoders.viterbi(a, bfull, pi, tokens))
    np.testing.assert_array_equal(p_fast, p_ref)
