"""Sequence-parallel forward pass for chromosome-scale blocks.

The HMM forward recurrence is sequential in the alignment position, so a
single long block cannot use the window-batch data parallelism of
``hmm.decoders`` (one window => one (1, M) matvec per column, latency-bound
at ~10us/column).  The associative reformulation: the per-column update is
``alpha' = alpha @ (A diag(e_t))``, so any chunk of columns collapses into a
single M x M *transfer operator* — the ordered product of its per-column
operators — and chunk operators combine associatively.  This file computes

  1. all chunk operators in parallel (a scan of length ``chunk`` over
     batched (C, M, M) matmuls — the sequential depth drops from T to
     ``chunk``), with per-step rescaling into log-space to avoid underflow;
  2. their ordered product via ``lax.associative_scan`` (log2(C) rounds);
  3. the log-likelihood from ``(pi * e_0) @ P``.

This is the "ring/blocked-parallel" analogue for HMMs named in SURVEY.md
section 5: per-column state is tiny but T is huge, so we trade O(M) extra
flops per column for T/chunk-fold parallelism.  Results match the
sequential forward to ~1e-5 relative (different floating-point summation
order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from itrails_tpu.data.tokens import PAD_TOKEN

__all__ = ["forward_loglik_long", "chunk_operators"]


def chunk_operators(a, bfull, tokens, chunk: int):
    """Per-chunk transfer operators for a 1-D token array whose length is a
    multiple of ``chunk`` (pad with PAD_TOKEN; pad columns are identity).

    Returns ``(ops, logscale)``: (C, M, M) rescaled operators and (C,)
    accumulated log scale factors.
    """
    m = a.shape[0]
    c = tokens.shape[0] // chunk
    tok = tokens.reshape(c, chunk)

    def step(carry, t_col):
        g, logz = carry  # g: (C, M, M)
        e = bfull.T[jnp.maximum(t_col, 0)]  # (C, M)
        new = (g @ a) * e[:, None, :]
        z = jnp.max(new, axis=(1, 2), keepdims=True)
        z = jnp.maximum(z, jnp.finfo(new.dtype).tiny)
        new = new / z
        valid = (t_col != PAD_TOKEN)[:, None, None]
        g = jnp.where(valid, new, g)
        logz = logz + jnp.where(valid[:, 0, 0], jnp.log(z[:, 0, 0]), 0.0)
        return (g, logz), None

    g0 = jnp.broadcast_to(jnp.eye(m, dtype=a.dtype), (c, m, m))
    logz0 = jnp.zeros((c,), a.dtype)
    (g, logz), _ = lax.scan(step, (g0, logz0), tok.T)
    return g, logz


def _combine(left, right):
    """Associative combine of rescaled transfer operators."""
    gl, zl = left
    gr, zr = right
    g = gl @ gr
    z = jnp.max(g, axis=(-2, -1), keepdims=True)
    z = jnp.maximum(z, jnp.finfo(g.dtype).tiny)
    return g / z, zl + zr + jnp.log(z[..., 0, 0])


def forward_loglik_long(a, bfull, pi, tokens, chunk: int = 256):
    """Log-likelihood of one long token sequence, sequence-parallel.

    ``tokens``: (T,) int array; internally right-padded to a multiple of
    ``chunk`` (padding is neutral).
    """
    t_len = tokens.shape[0]
    padded = ((t_len - 1 + chunk - 1) // chunk) * chunk
    first = tokens[0]
    rest = tokens[1:]
    rest = jnp.concatenate(
        [rest, jnp.full((padded - (t_len - 1),), PAD_TOKEN, tokens.dtype)]
    )
    ops, logz = chunk_operators(a, bfull, rest, chunk)
    # ordered product of all chunk operators (prefix scan, take the last)
    g_all, z_all = lax.associative_scan(_combine, (ops, logz))
    g = g_all[-1]
    z = z_all[-1]
    alpha0 = pi * bfull.T[jnp.maximum(first, 0)]
    total = jnp.sum(alpha0 @ g)
    return jnp.log(total) + z
