"""Scan-based HMM decoders: forward, backward, posterior, Viterbi.

The reference implements these as numba loops over one sequence at a time
(optimizer.py:145-354) and parallelises across alignment blocks with joblib
process pools.  Here each decoder is a ``lax.scan`` whose per-step state is a
(batch, M) matrix, so a whole batch of windows advances with one (W, M) @
(M, M) matmul per alignment column on the MXU; batching over windows is the
data-parallel axis that shards across chips (see hmm.sharding).

Numerics mirror the reference exactly: log-space alpha/beta with a per-step
max shift (optimizer.py:165-188, 191-213), posterior = row-softmax(alpha +
beta) (:216-238), Viterbi = max-plus recursion with backpointer matrix and
reverse backtrack (:305-354).

Padding: windows are right-padded with ``PAD_TOKEN``; padded steps carry
state through unchanged so every quantity equals the unpadded computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from itrails_tpu.data.tokens import PAD_TOKEN

__all__ = [
    "emission_table",
    "emission_table_new_method",
    "forward",
    "forward_loglik",
    "forward_loglik_fast",
    "backward",
    "posterior",
    "posterior_fast",
    "viterbi",
    "viterbi_fast",
]


def emission_table(b, agg):
    """(M, 625) emission table over the full (ambiguity-resolved) alphabet:
    ``b @ agg.T`` where agg is data.tokens.aggregation_matrix()."""
    return b @ jnp.asarray(agg, b.dtype).T


def emission_table_new_method(b, pad_to: int | None = None):
    """(M, 125) emission table over the 3-species ("new method") alphabet:
    the (M, 256) four-species emission matrix marginalized over the
    outgroup nucleotide, then ambiguity-resolved (reference
    read_data.py:27-43 + optimizer.py:68-91 — present but broken there;
    a working decode path here via the CLIs' ``--obs-mode new-method``).
    Every decoder in this module accepts it directly with
    maf.maf_tokens_new_method tokens.  ``pad_to=625`` zero-pads the
    columns to the standard table width so the fused TPU kernels (fixed
    KP=640 one-hot) and the XLA scans share one shape — tokens only ever
    index 0..124, and PAD_TOKEN handling never reads the table."""
    from itrails_tpu.data.tokens import aggregation_matrix_3

    m = b.shape[0]
    b3 = b.reshape(m, 64, 4).sum(-1)
    out = b3 @ jnp.asarray(aggregation_matrix_3(), b.dtype).T
    if pad_to is not None and pad_to > out.shape[1]:
        out = jnp.concatenate(
            [out, jnp.zeros((m, pad_to - out.shape[1]), out.dtype)], axis=1
        )
    return out


def _gather_emis(bfull, tokens):
    """Per-step emission rows for a (W,) token vector -> (W, M); padded
    positions get all-ones (no-op)."""
    safe = jnp.maximum(tokens, 0)
    e = bfull.T[safe]  # (W, M)
    return jnp.where((tokens == PAD_TOKEN)[:, None], jnp.ones_like(e), e)


def forward(a, bfull, pi, tokens):
    """Log-space forward pass over a (W, T) token batch.

    Returns ``(alpha_T, logliks)``: the final (W, M) log state vector and the
    per-window log-likelihoods (W,).
    """
    w = tokens.shape[0]
    alpha0 = jnp.log(pi[None, :] * _gather_emis(bfull, tokens[:, 0]))

    def step(alpha, tok):
        x = jnp.max(alpha, axis=1, keepdims=True)
        e = _gather_emis(bfull, tok)
        new = jnp.log((jnp.exp(alpha - x) @ a) * e) + x
        new = jnp.where((tok == PAD_TOKEN)[:, None], alpha, new)
        return new, None

    alpha, _ = lax.scan(step, alpha0, tokens[:, 1:].T)
    x = jnp.max(alpha, axis=1)
    loglik = jnp.log(jnp.sum(jnp.exp(alpha - x[:, None]), axis=1)) + x
    return alpha, loglik


def forward_loglik(a, bfull, pi, tokens):
    """Total log-likelihood of a (W, T) token batch (sum over windows)."""
    _, ll = forward(a, bfull, pi, tokens)
    return jnp.sum(ll)


def _fast_precision():
    """Precision mix for the fused-kernel fast dispatch, resolved at trace
    time.  Default: the throughput-tuned mix (16-significand-bit emission
    table + 3-pass transition matmul, ~2e-6 relative agreement with the
    f32 scan).  Setting ``ITRAILS_TPU_EXACT_DECODE=1`` switches every fast
    path (including the sharded/optimizer objective, which only reaches
    the kernels through this dispatch) to the bit-exact-vs-f32-scan
    configuration.

    The variable is read at TRACE time: set it before the first call of
    each jitted wrapper in the process.  Changing it afterwards is
    silently ignored for already-compiled shapes (jit caches the traced
    choice); there is deliberately no runtime re-check, which would leak
    a host read into every dispatch."""
    import os

    if os.environ.get("ITRAILS_TPU_EXACT_DECODE", "0") not in ("", "0"):
        return {"table_parts": 3, "trans": "highest"}
    return {"table_parts": 2, "trans": "split3"}


def forward_loglik_fast(a, bfull, pi, tokens):
    """Total log-likelihood, dispatched at trace time to the fused Pallas
    TPU kernel (hmm.pallas_fwd) when on a TPU backend, else the XLA scan.
    The TPU path runs the throughput-tuned precision mix (16-significand-
    bit emission table + 3-pass transition matmul): agreement with the f32
    scan is ~2e-6 relative on the total — the same order as the f32 scan's
    own deviation from f64 — and ~1.4x the bit-exact kernel's throughput
    at M=133 (tools/exp_fwd_precision.py).  For the bit-exact-vs-f32-scan
    configuration set ``ITRAILS_TPU_EXACT_DECODE=1`` (or call
    pallas_fwd.forward_loglik_fused directly; its defaults:
    table_parts=3, trans="highest")."""
    from itrails_tpu.hmm import pallas_fwd

    if pallas_fwd.supported():
        return pallas_fwd.forward_loglik_fused(
            a, bfull, pi, tokens, **_fast_precision()
        )
    return forward_loglik(a, bfull, pi, tokens)


def posterior_fast(a, bfull, pi, tokens):
    """Posterior probabilities, dispatched at trace time to the fused
    Pallas forward+backward kernels (hmm.pallas_fwd.posterior_fused) on
    TPU, else the XLA scans.  ``ITRAILS_TPU_EXACT_DECODE=1`` selects the
    bit-exact precision configuration (see forward_loglik_fast)."""
    from itrails_tpu.hmm import pallas_fwd

    if pallas_fwd.supported():
        return pallas_fwd.posterior_fused(
            a, bfull, pi, tokens, **_fast_precision()
        )
    return posterior(a, bfull, pi, tokens)


def viterbi_fast(a, bfull, pi, tokens):
    """Viterbi path, dispatched at trace time to the fused Pallas kernel
    (hmm.pallas_viterbi) on TPU, else the XLA scan.  The kernel also
    rescales omega per step, preserving f32 resolution on state
    differences for arbitrarily long windows."""
    from itrails_tpu.hmm import pallas_viterbi

    if pallas_viterbi.supported():
        return pallas_viterbi.viterbi_fused(a, bfull, pi, tokens)
    return viterbi(a, bfull, pi, tokens)


def _forward_all(a, bfull, pi, tokens):
    """Forward pass keeping every step's alpha: (T, W, M)."""
    alpha0 = jnp.log(pi[None, :] * _gather_emis(bfull, tokens[:, 0]))

    def step(alpha, tok):
        x = jnp.max(alpha, axis=1, keepdims=True)
        e = _gather_emis(bfull, tok)
        new = jnp.log((jnp.exp(alpha - x) @ a) * e) + x
        new = jnp.where((tok == PAD_TOKEN)[:, None], alpha, new)
        return new, new

    _, rest = lax.scan(step, alpha0, tokens[:, 1:].T)
    return jnp.concatenate([alpha0[None], rest], axis=0)


def backward(a, bfull, tokens):
    """Log-space backward pass; returns (T, W, M) beta values."""
    t_len = tokens.shape[1]
    beta_last = jnp.zeros((tokens.shape[0], a.shape[0]), bfull.dtype)

    def step(beta, tok):
        x = jnp.max(beta, axis=1, keepdims=True)
        e = _gather_emis(bfull, tok)
        # NOTE: `@ a` (not `@ a.T`) reproduces the reference recursion
        # (optimizer.py:210), which contracts over the *source* state.  The
        # textbook backward would use a.T; we mirror the reference because
        # its posteriors are the parity target (the joint matrix is
        # exchange-symmetric, so the difference is a per-state pi reweight).
        new = jnp.log((jnp.exp(beta - x) * e) @ a) + x
        new = jnp.where((tok == PAD_TOKEN)[:, None], beta, new)
        return new, new

    _, rest = lax.scan(step, beta_last, tokens[:, 1:].T[::-1])
    return jnp.concatenate([rest[::-1], beta_last[None]], axis=0)


def posterior(a, bfull, pi, tokens):
    """Posterior state probabilities, (T, W, M); padded steps are garbage
    (mask with ``tokens != PAD_TOKEN``)."""
    alpha = _forward_all(a, bfull, pi, tokens)
    beta = backward(a, bfull, tokens)
    post = alpha + beta
    post -= jnp.max(post, axis=2, keepdims=True)
    post = jnp.exp(post)
    return post / jnp.sum(post, axis=2, keepdims=True)


def viterbi(a, bfull, pi, tokens):
    """Most-probable state path per window: (W, T) int32.

    Padded steps repeat the last real state; mask with
    ``tokens != PAD_TOKEN`` when consuming.

    The recursion mirrors the fused kernel (hmm.pallas_viterbi) operation
    for operation — log-probabilities clamped at -1e4 (never -inf), omega
    rescaled by its per-window max every step (f32 stability for
    unbounded T), and the argmax over PRE-emission scores (the
    source-independent emission term cannot change the true argmax, and
    max_i fl(s_i) + e == max_i fl(s_i + e) by monotonicity) — so the
    scan and the kernel take bit-identical decisions even at f32
    rounding-tie margins.  In f64 on real models this is the reference
    max-plus recursion (optimizer.py:305-333) exactly: rescaling shifts
    all scores per window and never changes an argmax at real-model
    margins."""
    neg = jnp.asarray(-1e4, bfull.dtype)
    log_clip = lambda x: jnp.maximum(  # noqa: E731
        jnp.log(jnp.maximum(x, jnp.zeros_like(x))), neg
    )
    log_a = log_clip(a)
    logb = log_clip(bfull)

    def loge(tok):
        e = logb.T[jnp.maximum(tok, 0)]  # (W, M)
        return jnp.where((tok == PAD_TOKEN)[:, None], jnp.zeros_like(e), e)

    omega0 = log_clip(pi)[None, :] + loge(tokens[:, 0])
    omega0 = omega0 - jnp.max(omega0, axis=1, keepdims=True)

    def fwd(omega, tok):
        scores = omega[:, :, None] + log_a[None, :, :]
        ptr = jnp.argmax(scores, axis=1).astype(jnp.int32)  # (W, M)
        new = jnp.max(scores, axis=1) + loge(tok)
        new = new - jnp.max(new, axis=1, keepdims=True)
        pad = (tok == PAD_TOKEN)[:, None]
        new = jnp.where(pad, omega, new)
        # padded steps: identity backpointer
        ident = jnp.broadcast_to(
            jnp.arange(new.shape[1], dtype=jnp.int32)[None, :], ptr.shape
        )
        ptr = jnp.where(pad, ident, ptr)
        return new, ptr

    omega, ptrs = lax.scan(fwd, omega0, tokens[:, 1:].T)  # ptrs: (T-1, W, M)
    last = jnp.argmax(omega, axis=1).astype(jnp.int32)  # (W,)

    def back(state, ptr):
        prev = jnp.take_along_axis(ptr, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, states_rev = lax.scan(back, last, ptrs[::-1])
    path = jnp.concatenate([states_rev[::-1], last[None]], axis=0)  # (T, W)
    return path.T
