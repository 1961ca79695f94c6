"""HMM decoder parity vs reference numba kernels (hmm_* goldens)."""

import jax.numpy as jnp
import numpy as np
import pytest

from itrails_tpu.data.tokens import PAD_TOKEN, aggregation_matrix
from itrails_tpu.hmm import decoders
from tests.conftest import load_golden


def _load(tag):
    m = load_golden(f"model_{tag}.npz")
    h = load_golden(f"hmm_{tag}.npz")
    a = jnp.asarray(m["a"])
    bfull = decoders.emission_table(jnp.asarray(m["b"]), aggregation_matrix())
    pi = jnp.asarray(m["pi"])
    return a, bfull, pi, h


@pytest.mark.parametrize("tag", ["1x2", "3x3", "4x4", "7x7"])
@pytest.mark.parametrize("seq", ["v1", "v2"])
def test_forward_loglik_matches(tag, seq):
    a, bfull, pi, h = _load(tag)
    tokens = jnp.asarray(h[f"{seq}_tokens"])[None, :]
    _, ll = decoders.forward(a, bfull, pi, tokens)
    np.testing.assert_allclose(float(ll[0]), float(h[f"{seq}_loglik"]), rtol=1e-10)


@pytest.mark.parametrize("tag", ["1x2", "4x4"])
@pytest.mark.parametrize("seq", ["v1", "v2"])
def test_posterior_matches(tag, seq):
    a, bfull, pi, h = _load(tag)
    tokens = jnp.asarray(h[f"{seq}_tokens"])[None, :]
    post = np.asarray(decoders.posterior(a, bfull, pi, tokens))[:, 0, :]
    np.testing.assert_allclose(post, h[f"{seq}_post"], rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("tag", ["1x2", "4x4"])
@pytest.mark.parametrize("seq", ["v1", "v2"])
def test_viterbi_matches(tag, seq):
    a, bfull, pi, h = _load(tag)
    tokens = jnp.asarray(h[f"{seq}_tokens"])[None, :]
    path = np.asarray(decoders.viterbi(a, bfull, pi, tokens))[0]
    np.testing.assert_array_equal(path, h[f"{seq}_viterbi"])


def test_padding_is_neutral():
    a, bfull, pi, h = _load("1x2")
    tokens = np.asarray(h["v1_tokens"])
    padded = np.full(len(tokens) + 37, PAD_TOKEN, dtype=np.int64)
    padded[: len(tokens)] = tokens
    batch = jnp.asarray(np.stack([padded, padded]))
    _, ll = decoders.forward(a, bfull, pi, batch)
    np.testing.assert_allclose(np.asarray(ll), float(h["v1_loglik"]), rtol=1e-10)
    path = np.asarray(decoders.viterbi(a, bfull, pi, batch))[0][: len(tokens)]
    np.testing.assert_array_equal(path, h["v1_viterbi"])


def test_batched_windows_equal_individual():
    a, bfull, pi, h = _load("1x2")
    t1 = np.asarray(h["v1_tokens"])[:300]
    t2 = np.asarray(h["v2_tokens"])[:300]
    batch = jnp.asarray(np.stack([t1, t2]))
    _, ll = decoders.forward(a, bfull, pi, batch)
    _, l1 = decoders.forward(a, bfull, pi, jnp.asarray(t1)[None])
    _, l2 = decoders.forward(a, bfull, pi, jnp.asarray(t2)[None])
    np.testing.assert_allclose(np.asarray(ll), [float(l1[0]), float(l2[0])], rtol=1e-12)
