"""Fused gradient kernel parity (interpret mode) vs reverse-mode autodiff
of the remat scan forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm import pallas_grad
from itrails_tpu.hmm.grad import forward_loglik_remat


def _random_model(m, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    bfull = rng.random((m, 625)) * 0.01 + 1e-4
    pi = rng.random(m)
    pi /= pi.sum()
    return (jnp.asarray(a, jnp.float32), jnp.asarray(bfull, jnp.float32),
            jnp.asarray(pi, jnp.float32))


def _compare(m, tokens, seed=0, rtol=2e-3):
    a, bfull, pi = _random_model(m, seed)
    tokens = jnp.asarray(tokens, jnp.int32)
    ll, (da, db, dpi) = pallas_grad.loglik_and_grads_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=16, interpret=True
    )
    vg = jax.value_and_grad(
        lambda a_, b_, p_: forward_loglik_remat(
            a_.astype(jnp.float64), b_.astype(jnp.float64),
            p_.astype(jnp.float64), tokens, chunk=32),
        argnums=(0, 1, 2),
    )
    ll_r, (da_r, db_r, dpi_r) = vg(a, bfull, pi)
    np.testing.assert_allclose(float(ll), float(ll_r), rtol=1e-4)
    scale = np.abs(np.asarray(da_r)).max()
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_r),
                               rtol=rtol, atol=rtol * scale)
    scale = np.abs(np.asarray(db_r)).max()
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_r),
                               rtol=rtol, atol=rtol * scale)
    scale = np.abs(np.asarray(dpi_r)).max()
    np.testing.assert_allclose(np.asarray(dpi), np.asarray(dpi_r),
                               rtol=rtol, atol=rtol * scale)


def test_grads_match_autodiff_basic():
    rng = np.random.default_rng(1)
    _compare(9, rng.integers(0, 625, size=(3, 70)))


def test_grads_match_autodiff_padding():
    rng = np.random.default_rng(2)
    tokens = np.asarray(rng.integers(0, 625, size=(4, 45)), np.int32)
    tokens[1, 30:] = PAD_TOKEN
    tokens[2, 5:] = PAD_TOKEN
    tokens[3, :] = PAD_TOKEN  # fully empty window
    _compare(7, tokens, seed=3)


def test_grads_match_autodiff_m27():
    rng = np.random.default_rng(4)
    _compare(27, rng.integers(0, 625, size=(2, 130)), seed=5)


def test_grads_single_column():
    rng = np.random.default_rng(6)
    _compare(5, rng.integers(0, 625, size=(2, 1)), seed=7)


@pytest.mark.parametrize("t_len", [15, 16, 17, 33])
def test_grads_chunk_boundaries(t_len):
    rng = np.random.default_rng(8)
    _compare(6, rng.integers(0, 625, size=(2, t_len)), seed=9)
