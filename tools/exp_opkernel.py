"""NEGATIVE RESULT (round 2): fused Pallas chunk-operator kernel.

Hypothesis: replacing longseq.chunk_operators' XLA scan (emission gather +
batched (C, M, M) @ (M, M) matmuls) with a fused kernel using the
identity-rows layout and the one-hot emission matmul would beat the XLA
path (~143-190 Mcol/s on v5e at M=27).

Measured (10 Mcol block, v5e): fused 55-60 Mcol/s vs XLA 143 Mcol/s — the
(Mp, Mp) @ (Mp, Mp*Cb) HIGHEST-precision matmul with contraction dim 32
under-utilizes the MXU far more than XLA's batched layout, and the
per-column row normalisation + emission tiling add VPU cost.  Interpret-
mode parity vs chunk_operators holds to f32 tolerance (2e-5), so the
implementation is correct — just slower.  Kept as an experiment; the
production long path stays on the XLA operator scan.

Run: PYTHONPATH=... python tools/exp_opkernel.py (see /tmp-style harness
in git history).
"""


from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm.pallas_fwd import split_bf16

__all__ = ["chunk_operators_fused", "supported"]

_K = 625
_KP = 640


def supported(platform: str | None = None) -> bool:
    if platform is None:
        platform = jax.default_backend()
    return platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(tok_ref, btcat_ref, at_ref, g_ref, acc_ref, *, mp: int,
            cb: int, chunk: int, renorm: int):
    btcat = btcat_ref[:]
    at = at_ref[:]
    width = mp * cb
    # lane l belongs to row i = l // cb of chunk c = l % cb
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (mp, width), 1) // cb
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, width), 0)
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, cb), 0)

    al0 = (sub_ids == lane_row).astype(jnp.float32)  # identity rows
    acc0 = jnp.zeros((1, width), jnp.float32)

    def step(t, carry):
        al, acc = carry
        tok = tok_ref[0, pl.ds(t, 1), :]  # (1, Cb)
        oh = (tok == kio).astype(jnp.bfloat16)
        e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
        e = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]  # (Mp, Cb) f32-exact
        et = jnp.concatenate([e] * mp, axis=1)  # (Mp, Mp*Cb) tiled rows
        padt = jnp.concatenate([tok == PAD_TOKEN] * mp, axis=1)  # (1, width)
        nx = jnp.dot(at, al, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) * et
        al = jnp.where(padt, al, nx)

        # rescale every `renorm` columns (f32 range headroom: each column
        # shrinks by >= min(e) ~ 1e-6, so renorm <= 4 keeps us above tiny)
        def rs(args):
            al, acc = args
            s = jnp.maximum(jnp.sum(al, axis=0, keepdims=True),
                            jnp.float32(1e-37))
            return al / s, acc + jnp.log(s)

        al, acc = jax.lax.cond(
            (t + 1) % renorm == 0, rs, lambda args: args, (al, acc)
        )
        return al, acc

    al, acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk), step,
                                (al0, acc0))
    # final normalisation so every row sums to 1 with its log-scale in acc
    s = jnp.maximum(jnp.sum(al, axis=0, keepdims=True), jnp.float32(1e-37))
    g_ref[0] = al / s
    acc_ref[0] = acc + jnp.log(s)


@functools.partial(jax.jit, static_argnames=("chunk", "cb", "renorm",
                                             "interpret"))
def chunk_operators_fused(a, bfull, stream, *, chunk: int = 512,
                          cb: int = 128, renorm: int = 4,
                          interpret: bool = False):
    """Per-chunk transfer operators of a 1-D token stream.

    Args:
      a: (M, M) transition matrix; bfull: (M, 625) emission table;
      stream: (C, chunk) int32 token matrix (pad columns = PAD_TOKEN,
      identity).

    Returns ``(ops, logz)``: (C, M, M) operators whose ROWS each sum to 1,
    and (C, M) per-row log scale factors — fold with
    ``ops * exp(logz - logz.max(-1))`` (see forward_loglik_long_fused).
    """
    m = a.shape[0]
    c = stream.shape[0]
    assert stream.shape[1] == chunk
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32

    at = jnp.zeros((mp, mp), f32).at[:m, :m].set(a.T.astype(f32))
    bt = jnp.zeros((mp, _KP), f32).at[:m, :_K].set(bfull.astype(f32))
    btcat = split_bf16(bt)

    cp = _round_up(max(c, cb), cb)
    tok = jnp.full((cp, chunk), PAD_TOKEN, jnp.int32)
    tok = tok.at[:c].set(stream.astype(jnp.int32))
    tok = tok.T.reshape(chunk, cp // cb, cb).transpose(1, 0, 2)  # (Cg, chunk, Cb)

    width = mp * cb
    grid = (cp // cb,)
    g, acc = pl.pallas_call(
        functools.partial(_kernel, mp=mp, cb=cb, chunk=chunk,
                          renorm=renorm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, cb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * mp, _KP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, mp, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp // cb, mp, width), f32),
            jax.ShapeDtypeStruct((cp // cb, 1, width), f32),
        ],
        interpret=interpret,
    )(tok, btcat, at)

    # unscramble: g[grp, j, i*Cb + cc] = G_{grp*Cb+cc}[i, j]
    g = g.reshape(cp // cb, mp, mp, cb)  # (grp, j, i, cc)
    ops = g.transpose(0, 3, 2, 1).reshape(cp, mp, mp)[:c, :m, :m]
    acc = acc.reshape(cp // cb, mp, cb).transpose(0, 2, 1).reshape(cp, mp)
    return ops, acc[:c, :m]


def forward_loglik_long_fused(a, bfull, pi, tokens, chunk: int = 512,
                              cb: int = 128, interpret: bool = False):
    """Sequence-parallel log-likelihood of ONE long block with the fused
    operator kernel (same value as longseq.forward_loglik_long to f32
    tolerance)."""
    from itrails_tpu.hmm.longseq import _combine

    t_len = tokens.shape[0]
    first = tokens[0]
    stream_len = t_len - 1
    padded = max(_round_up(stream_len, chunk), chunk)
    stream = jnp.concatenate(
        [tokens[1:], jnp.full((padded - stream_len,), PAD_TOKEN,
                              tokens.dtype)]
    ).reshape(-1, chunk)
    ops, logz = chunk_operators_fused(a, bfull, stream, chunk=chunk, cb=cb,
                                      interpret=interpret)
    # fold per-row scales into (G, scalar logz) pairs for the combine
    z = jnp.max(logz, axis=1)  # (C,)
    g = ops * jnp.exp(logz - z[:, None])[:, :, None]
    g_all, z_all = jax.lax.associative_scan(_combine, (g, z))
    alpha0 = (pi * bfull.T[jnp.maximum(first, 0)]).astype(g.dtype)
    total = jnp.sum(alpha0 @ g_all[-1])
    return jnp.log(total) + z_all[-1]
