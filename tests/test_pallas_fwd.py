"""Parity tests for the fused Pallas forward kernel (interpret mode on CPU).

The kernel's scaled-linear recurrence and bf16 hi+lo emission split must
reproduce the log-space scan decoder (hmm.decoders.forward) to f32 noise.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm import decoders, pallas_fwd


def _random_model(m, seed=0):
    """Random model with an aggregation-CONSISTENT emission table
    (bfull[:, t] = sum of the compatible base columns), as every production
    table is — the multihot emission path relies on that identity."""
    from itrails_tpu.data.tokens import aggregation_matrix

    rng = np.random.default_rng(seed)
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    b = rng.random((m, 256)) * 0.01 + 1e-4
    bfull = decoders.emission_table(
        jnp.asarray(b, jnp.float32),
        jnp.asarray(aggregation_matrix(), jnp.float32),
    )
    pi = rng.random(m)
    pi /= pi.sum()
    return (
        jnp.asarray(a, jnp.float32),
        jnp.asarray(bfull, jnp.float32),
        jnp.asarray(pi, jnp.float32),
    )


@pytest.mark.parametrize("m", [27, 133])
def test_fused_forward_matches_scan(m):
    a, bfull, pi = _random_model(m)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 625, size=(4, 61)), jnp.int32)
    alpha_ref, ll_ref = decoders.forward(a, bfull, pi, tokens)
    al, ll = pallas_fwd.forward_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), atol=2e-4)
    log_alpha = jnp.log(al) + ll[:, None]
    np.testing.assert_allclose(
        np.asarray(log_alpha), np.asarray(alpha_ref), atol=2e-4
    )


def test_fused_forward_respects_padding():
    a, bfull, pi = _random_model(27, seed=2)
    rng = np.random.default_rng(3)
    tokens = np.asarray(rng.integers(0, 625, size=(3, 40)), np.int32)
    tokens[1, 25:] = PAD_TOKEN
    tokens[2, 7:] = PAD_TOKEN
    _, ll_ref = decoders.forward(a, bfull, pi, jnp.asarray(tokens))
    _, ll = pallas_fwd.forward_fused(
        a, bfull, pi, jnp.asarray(tokens), block_w=128, chunk_t=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), atol=2e-4)


def test_fast_dispatch_cpu_falls_back():
    a, bfull, pi = _random_model(27, seed=4)
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, 625, size=(2, 33)), jnp.int32)
    ll_fast = float(decoders.forward_loglik_fast(a, bfull, pi, tokens))
    ll_ref = float(decoders.forward_loglik(a, bfull, pi, tokens))
    np.testing.assert_allclose(ll_fast, ll_ref, rtol=1e-6)


@pytest.mark.parametrize("m", [9, 27])
def test_fused_posterior_matches_scan(m):
    a, bfull, pi = _random_model(m, seed=7)
    rng = np.random.default_rng(8)
    tokens = np.asarray(rng.integers(0, 625, size=(3, 41)), np.int32)
    tokens[1, 30:] = PAD_TOKEN
    tokens = jnp.asarray(tokens)
    p_ref = np.asarray(decoders.posterior(a, bfull, pi, tokens))
    p_ker = np.asarray(pallas_fwd.posterior_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=8, interpret=True
    ))
    mask = (np.asarray(tokens) != PAD_TOKEN).T[:, :, None]
    np.testing.assert_allclose(
        np.where(mask, p_ker, 0.0), np.where(mask, p_ref, 0.0), atol=2e-5
    )


def test_posterior_fast_dispatch_cpu():
    a, bfull, pi = _random_model(9, seed=9)
    rng = np.random.default_rng(10)
    tokens = jnp.asarray(rng.integers(0, 625, size=(2, 23)), jnp.int32)
    p_fast = np.asarray(decoders.posterior_fast(a, bfull, pi, tokens))
    p_ref = np.asarray(decoders.posterior(a, bfull, pi, tokens))
    np.testing.assert_allclose(p_fast, p_ref, rtol=1e-6)


def test_split_bf16_is_bit_exact_under_jit():
    """The triple-bf16 emission split must reconstruct f32 EXACTLY, and it
    must do so *under jit*: the naive ``x - bf16(x)`` formulation is elided
    by XLA's excess-precision rule on TPU (residuals silently become zero,
    degrading the table to 8-bit significand), which flipped ~3% of Viterbi
    states on hardware.  The integer-masked split cannot be elided."""
    import jax

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        np.float32([-1e4, -5.25, -0.001, -9984.0, -10016.0, 0.0, -0.0]),
        rng.normal(0, 100, 512).astype(np.float32),
        np.exp(rng.normal(-10, 8, 512)).astype(np.float32),
    ]).reshape(1, -1)
    cat = np.asarray(jax.jit(pallas_fwd.split_bf16)(jnp.asarray(vals)),
                     np.float32)
    rec = cat[0] + cat[1] + cat[2]
    np.testing.assert_array_equal(rec, vals[0])
    # residual parts must actually carry bits (elision would zero them)
    assert (np.abs(cat[1]) > 0).any()
    assert (np.abs(cat[2]) > 0).any()


@pytest.mark.parametrize("m", [27, 133])
def test_fused_forward_fastmix_matches_scan(m):
    """The throughput-tuned precision mix used by the TPU fast dispatch
    (16-bit emission table + manual 3-pass transition, see
    decoders.forward_loglik_fast) must agree with the scan decoder to the
    documented ~1e-6-relative tolerance."""
    a, bfull, pi = _random_model(m, seed=13)
    rng = np.random.default_rng(14)
    tokens = np.asarray(rng.integers(0, 625, size=(3, 50)), np.int32)
    tokens[1, 30:] = PAD_TOKEN
    tokens = jnp.asarray(tokens)
    _, ll_ref = decoders.forward(a, bfull, pi, tokens)
    _, ll = pallas_fwd.forward_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=8, interpret=True,
        table_parts=2, trans="split3",
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), atol=2e-3)


@pytest.mark.parametrize("m", [9, 27])
def test_fused_posterior_fastmix_matches_scan(m):
    """posterior_fast's kernel configuration (table_parts=2, split3)."""
    a, bfull, pi = _random_model(m, seed=15)
    rng = np.random.default_rng(16)
    tokens = np.asarray(rng.integers(0, 625, size=(3, 41)), np.int32)
    tokens[1, 30:] = PAD_TOKEN
    tokens = jnp.asarray(tokens)
    p_ref = np.asarray(decoders.posterior(a, bfull, pi, tokens))
    p_ker = np.asarray(pallas_fwd.posterior_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=8, interpret=True,
        table_parts=2, trans="split3",
    ))
    mask = (np.asarray(tokens) != PAD_TOKEN).T[:, :, None]
    np.testing.assert_allclose(
        np.where(mask, p_ker, 0.0), np.where(mask, p_ref, 0.0), atol=1e-4
    )


@pytest.mark.parametrize("m", [27, 133])
@pytest.mark.parametrize("parts", [2, 3])
def test_fused_forward_multihot_matches_scan(m, parts):
    """The multihot emission path (bit-code half-split construction) must
    match the scan decoder; with parts=3 the unambiguous-token rows are
    bit-exact, ambiguous rows agree to f32 roundoff."""
    a, bfull, pi = _random_model(m, seed=11)
    rng = np.random.default_rng(12)
    tokens = np.asarray(rng.integers(0, 625, size=(3, 50)), np.int32)
    tokens[1, 30:] = PAD_TOKEN
    tokens = jnp.asarray(tokens)
    _, ll_ref = decoders.forward(a, bfull, pi, tokens)
    _, ll = pallas_fwd.forward_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=8, interpret=True,
        emission="multihot", table_parts=parts,
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), atol=2e-4)


def test_post_block_w_fits_vmem_budget():
    """The posterior window block must shrink with mp so the backward
    pass's 4 live (tc>=8, mp, bw) f32 buffers fit the VMEM budget — at
    mp=136 the former default block_w=2048 demanded ~35 MB (ADVICE r3)."""
    for mp in (32, 64, 136, 208, 512):
        for block_w in (512, 2048, 4096):
            bw = pallas_fwd._post_block_w(mp, 10**6, block_w)
            assert bw >= 128 and bw % 128 == 0
            # one tc=1 stream buffer within the per-buffer cap => six
            # live buffers stay below the compile-helper crash region
            assert mp * bw * 4 <= pallas_fwd._POST_BLOCK_MB * 2**20
    # small models keep the full default block
    assert pallas_fwd._post_block_w(32, 10**6, 4096) == 4096
    # the M=133 flagship runs 2048-lane blocks at tc=1 (6.7 MB; 13.4 MB
    # configurations crash the Mosaic compile helper)
    assert pallas_fwd._post_block_w(136, 10**6, 4096) == 2048


def test_fused_posterior_m133_default_block():
    """mp=136 at the default block_w: the capped block must both compile
    (interpret) and keep scan parity — the uncapped shape could not
    allocate on hardware."""
    a, bfull, pi = _random_model(133, seed=21)
    rng = np.random.default_rng(22)
    tokens = jnp.asarray(rng.integers(0, 625, size=(640, 5)), jnp.int32)
    p_ref = np.asarray(decoders.posterior(a, bfull, pi, tokens))
    p_ker = np.asarray(pallas_fwd.posterior_fused(
        a, bfull, pi, tokens, interpret=True, table_parts=2, trans="split3",
    ))
    np.testing.assert_allclose(p_ker, p_ref, atol=1e-4)


def test_posterior_fused_rejects_unknown_layout():
    a, bfull, pi = _random_model(9, seed=17)
    tokens = jnp.zeros((2, 8), jnp.int32)
    with pytest.raises(ValueError, match="layout"):
        pallas_fwd.posterior_fused(a, bfull, pi, tokens, layout="wtm",
                                   interpret=True)


def test_fast_precision_env_opt_out(monkeypatch):
    """ITRAILS_TPU_EXACT_DECODE=1 must route every fast dispatch (and so
    the sharded/optimizer objective) to the bit-exact configuration."""
    monkeypatch.delenv("ITRAILS_TPU_EXACT_DECODE", raising=False)
    assert decoders._fast_precision() == {"table_parts": 2,
                                          "trans": "split3"}
    monkeypatch.setenv("ITRAILS_TPU_EXACT_DECODE", "1")
    assert decoders._fast_precision() == {"table_parts": 3,
                                          "trans": "highest"}


def test_fwd_block_w_caps_large_models():
    """The forward window block must shrink with mp: mp=136 at 4096 lanes
    crashes the Mosaic compile helper; 2048 is the proven config."""
    assert pallas_fwd._fwd_block_w(32, 10**6, 4096) == 4096
    assert pallas_fwd._fwd_block_w(136, 10**6, 4096) == 2048
    for mp in (32, 72, 136, 208, 512):
        bw = pallas_fwd._fwd_block_w(mp, 10**6, 8192)
        assert bw >= 128 and bw % 128 == 0
        assert (640 * 2 + mp * 8 + 3 * mp * 4) * bw <= 12 * 2**20


def test_fused_total_accumulates_in_f64():
    """Genome-scale regression (round-5 int5p stall): the fused forward's
    TOTAL loglik must be the f64 sum of the per-window values — an f32
    total at |ll| ~ 1e6 quantizes at 0.125 nats, which collapsed short
    L-BFGS-B steps to zero objective change and stalled the optimizer at
    its start point."""
    import jax

    a, bfull, pi = _random_model(27, seed=3)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 625, size=(64, 256)), jnp.int32)
    total = pallas_fwd.forward_loglik_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=16, interpret=True)
    assert total.dtype == jnp.float64
    _, per_window = pallas_fwd.forward_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=16, interpret=True)
    want = np.sum(np.asarray(per_window, np.float64))
    # exact f64 summation of the same per-window values (not f32-rounded)
    np.testing.assert_allclose(float(total), want, rtol=0, atol=1e-9)

    from itrails_tpu.hmm import pallas_grad

    ll_g, _ = pallas_grad.loglik_and_grads_fused(
        a, bfull, pi, tokens, block_w=128, chunk_t=16, interpret=True)
    assert ll_g.dtype == jnp.float64
    np.testing.assert_allclose(float(ll_g), want, rtol=0, atol=0.5)
