"""Fused Pallas TPU kernel for the Viterbi forward (max-plus) pass.

The XLA scan Viterbi (hmm.decoders.viterbi) materialises a (W, M, M) score
tensor per column plus the same slow emission gather as the forward pass;
on TPU it reaches only ~50 (M=27) / ~12 (M=133) Mcol/s.  This kernel:

* keeps the (Mp, BW) omega carry in VMEM across the whole scan (transposed
  layout: states on sublanes, windows on lanes);
* looks up *log*-emission rows on the MXU via the same triple-bf16
  one-hot matmul as hmm.pallas_fwd (bit-exact f32; near-degenerate
  coalescent states need the full 24 bits — a lossy split measurably
  degrades paths, see split_bf16's note on XLA eliding cast round-trips);
* runs the max-plus contraction as a VPU broadcast-and-reduce, tiled over
  small groups of destination states (``slab[j, i, w] = lat[j, i] +
  om[i, w]``, max/argmin-index reductions over i) — no dynamic indexing;
* rescales omega by its per-window max every step, so f32 keeps full
  resolution on state *differences* regardless of sequence length (the
  plain scan decoder lets |omega| grow ~ -8 per column, drowning small
  differences for T >~ 1e5);
* writes int32 backpointers blocked (chunk_t, Mp, BW); the backtrack is a
  cheap XLA scan over them.

No -inf anywhere: log-probabilities are clamped at ``_NEG`` (-1e30 would
break the one-hot matmul: 0 * inf = NaN in the f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm.pallas_fwd import split_bf16

__all__ = ["viterbi_fused", "supported"]

_K = 625
_KP = 640
_NEG = -1e4  # "impossible" log-prob; bounded so max-plus arithmetic stays finite


def supported(platform: str | None = None) -> bool:
    if platform is None:
        platform = jax.default_backend()
    return platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(tok_ref, om0_ref, logbt_ref, lat_ref, ptr_ref, omf_ref, om_s,
            *, mp: int, chunk_t: int, m: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        om_s[:] = om0_ref[:]

    logbt = logbt_ref[:]  # (3Mp, KP) bf16 hi/mid/lo log-emission
    lat = lat_ref[:]  # (Mp, Mp) f32: lat[j_state, i_state] = log a[i, j]

    bw = tok_ref.shape[1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, bw), 0)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (1, mp, bw), 1)
    # j-tile size for the (TJ, Mp, BW) max-plus slab: small tiles keep the
    # slab close to vector registers (measured best at 8)
    tj = 8

    def step(t, om):
        tok = tok_ref[pl.ds(t, 1), :]  # (1, BW)
        oh = (tok == kio).astype(jnp.bfloat16)
        e2 = jnp.dot(logbt, oh, preferred_element_type=jnp.float32)
        loge = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]  # (Mp, BW) f32-exact

        # max-plus contraction, tiled over destination states j:
        # slab[j, i, w] = lat[j, i] + om[i, w]; reduce (max, argmax) over i
        curs, ptrs_ = [], []
        for jt in range(mp // tj):
            lat_t = lat[jt * tj:(jt + 1) * tj, :]  # (TJ, Mp)
            slab = lat_t[:, :, None] + om[None, :, :]  # (TJ, Mp, BW)
            mx = jnp.max(slab, axis=1)  # (TJ, BW)
            eq = slab == mx[:, None, :]
            # jnp.int32(mp): a bare python int promotes the where() to i64
            # under jax_enable_x64, which Mosaic cannot convert back
            idx = jnp.min(jnp.where(eq, iota_i, jnp.int32(mp)), axis=1)
            curs.append(mx)
            ptrs_.append(idx.astype(jnp.int32))
        cur = jnp.concatenate(curs, axis=0)  # (Mp, BW)
        ptr = jnp.concatenate(ptrs_, axis=0)
        new = cur + loge
        new = new - jnp.max(new, axis=0, keepdims=True)  # rescale

        pad = tok == PAD_TOKEN
        om = jnp.where(pad, om, new)
        ptr = jnp.where(pad, sub_ids, ptr)
        ptr_ref[pl.ds(t, 1), :, :] = ptr[None]
        return om

    om = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(chunk_t), step, om_s[:]
    )
    om_s[:] = om

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        omf_ref[:] = om_s[:]


@functools.partial(
    jax.jit, static_argnames=("block_w", "chunk_t", "interpret")
)
def viterbi_fused(a, bfull, pi, tokens, *, block_w: int = 512,
                  chunk_t: int = 128, interpret: bool = False):
    """Most-probable state path per window, (W, T) int32 (same contract as
    decoders.viterbi: padded steps repeat the last real state)."""
    m = a.shape[0]
    w, t_len = tokens.shape
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32

    log_clip = lambda x: jnp.maximum(  # noqa: E731
        jnp.log(jnp.maximum(x.astype(f32), jnp.float32(0.0))), f32(_NEG)
    )
    lat = jnp.full((mp, mp), f32(_NEG)).at[:m, :m].set(log_clip(a).T)
    logbt = jnp.full((mp, _KP), f32(_NEG)).at[:m, :_K].set(log_clip(bfull))
    logbt_cat = split_bf16(logbt)

    bw = min(block_w, _round_up(w, 128))
    wp = _round_up(w, bw)
    # the (tc, Mp, BW) int32 backpointer block is the VMEM hog; cap it at
    # ~4 MB per pipeline buffer
    tc_cap = max(8, (4 * 2**20 // (mp * bw * 4)) // 8 * 8)
    chunk_t = min(chunk_t, tc_cap)

    tok0 = tokens[:, 0]
    e0 = log_clip(bfull).T[jnp.maximum(tok0, 0)]  # (W, M)
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.zeros_like(e0), e0)
    om0 = log_clip(pi)[None, :] + e0
    om0 = om0 - jnp.max(om0, axis=1, keepdims=True)
    om0_p = jnp.full((mp, wp), f32(_NEG)).at[:m, :w].set(om0.T)

    tc = chunk_t
    rest = tokens[:, 1:]
    tp = max(_round_up(rest.shape[1], tc), tc)
    tok_t = jnp.full((tp, wp), PAD_TOKEN, jnp.int32)
    tok_t = tok_t.at[: rest.shape[1], :w].set(rest.T.astype(jnp.int32))

    grid = (wp // bw, tp // tc)
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731
    ptrs, omf = pl.pallas_call(
        functools.partial(_kernel, mp=mp, chunk_t=tc, m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * mp, _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, mp, bw), lambda i, j: (j, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, mp, wp), jnp.int32),
            jax.ShapeDtypeStruct((mp, wp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((mp, bw), f32)],
        interpret=interpret,
    )(tok_t, om0_p, logbt_cat, lat)

    # backtrack (XLA): ptrs[t, j, w] = best predecessor of state j at t+1
    last = jnp.argmax(omf[:m, :w], axis=0).astype(jnp.int32)  # (W,)
    n_real = rest.shape[1]
    ptrs_r = ptrs[:n_real, :m, :w]  # (T-1, M, W)

    def back(state, ptr):
        prev = jnp.take_along_axis(ptr, state[None, :], axis=0)[0]
        return prev, prev

    _, states_rev = jax.lax.scan(back, last, ptrs_r[::-1])
    path = jnp.concatenate([states_rev[::-1], last[None]], axis=0)  # (T, W)
    return path.T
