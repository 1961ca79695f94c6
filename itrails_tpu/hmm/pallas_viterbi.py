"""Fused Pallas TPU kernels for Viterbi decoding (max-plus forward +
pointer-walk backtrack).

The XLA scan Viterbi (hmm.decoders.viterbi) materialises a (W, M, M) score
tensor per column plus a slow emission gather, and its host-side backtrack
is a T-step scan of tiny gathers; on TPU it reaches only ~50 (M=27) Mcol/s.
This pair of kernels reaches ~135 Mcol/s (v5e, M=27, measured):

* forward: the (Mp, BW) omega carry lives in VMEM across the scan
  (transposed layout: states on sublanes, windows on lanes); log-emission
  rows come off the MXU via the triple-bf16 one-hot matmul of
  hmm.pallas_fwd (bit-exact f32); the max-plus contraction runs as an
  UNROLLED loop over source states with 2-D (Mp, BW) VPU ops — measured
  ~2x the 3-D slab formulation — keeping a running (max, argmax) pair
  with strict-greater updates (first-index tie-break, matching
  decoders.viterbi exactly);
* backpointers are stored in the narrowest int that holds a state index
  (int8 for M <= 127, e.g. the 27-state default): 4x less VMEM/HBM
  traffic than int32, which both widens the time-chunking and feeds the
  backtrack cheaply;
* backtrack: a second kernel walks the int8 pointer table in reverse grid
  order; the per-lane row-select ptr[t][state_w, w] (TPU has no per-lane
  gather) is an equality one-hot times the pointer block summed over
  sublanes — ~4*Mp*BW VPU ops per column, nearly free next to the
  forward;
* omega is rescaled by its per-window max every step, so f32 keeps full
  resolution on state *differences* regardless of sequence length.

Large M (> 64 states, e.g. the 133-state flagship) uses a VALUE-ONLY
forward + pointer-recompute backtrack instead (round 2, ~2x):

* the forward stores each step's INCOMING rescaled omega (f32) and skips
  all argmax bookkeeping — the grouped max-plus drops from ~5.3*Mp^2 to
  ~2.1*Mp^2 VPU ops/column, and at Mp=136 the argmax machinery (eq +
  min-iota + strict-> merge per 8-row group) was over half the kernel;
* the backtrack recomputes the ONE pointer actually needed per column:
  select row lat[state_w, :] for every lane via an exact one-hot matmul
  (split-bf16 lat, bit-exact f32 rows, on the MXU), add the stored
  omega, and arg-reduce over sublanes with the eq + min-iota trick.
  Scores are the same f32 sums the forward maximised, so ties break
  identically (first index) and parity with decoders.viterbi is exact;
* cost: omega storage is f32 (2x the bytes of int16 pointers), but the
  pointer-recompute rides the otherwise-idle MXU, and HBM stays far from
  the bound.

No -inf anywhere: log-probabilities are clamped at ``_NEG`` (-inf would
break the one-hot matmul: 0 * inf = NaN in the f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm.pallas_fwd import _tok_slice, split_bf16

__all__ = ["viterbi_fused", "supported"]

_K = 625
_KP = 640
_NEG = -1e4  # "impossible" log-prob; bounded so max-plus arithmetic stays finite
# large-M value-only forward: unrolled 2-D running max (True) vs grouped
# 3-D slab fori_loop (False) — see _fwd_kernel_vo
_VO_UNROLL2D = True
# VMEM cap (MB) for one (tc, Mp, BW) pointer/omega pipeline buffer; with
# ~16 MB of VMEM/core two live buffers plus tables must fit
_PTR_BLOCK_MB = 4.0
# timing diagnostic ONLY (wrong paths): skip the omega-stream store in the
# value-only forward to measure the compute ceiling at wide window blocks
_VO_NOSTORE = False
# states above this run the value-only forward + pointer-recompute
# backtrack; at or below it, the unrolled pointer forward.  Measured
# crossover on v5e (2048x2048 batches): pointer wins at mp=32 (353 vs
# 142 Mcol/s), value-only wins from mp=40 up (M=36: 131 vs 80; M=63:
# 94 vs 65)
_GROUPED_MIN_MP = 32


def supported(platform: str | None = None) -> bool:
    if platform is None:
        platform = jax.default_backend()
    return platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ptr_dtype(m: int):
    """Narrowest signed integer holding state indices 0..m-1 (int8 for the
    27-state default, int16 for the 133-state flagship)."""
    return jnp.int8 if m <= 127 else jnp.int16


def _fwd_kernel(tok_ref, om0_ref, logbt_ref, lat_ref, ptr_ref,
                omf_ref, om_s, *, mp: int, chunk_t: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        om_s[:] = om0_ref[:]

    logbt = logbt_ref[:]  # (3Mp, KP) bf16 hi/mid/lo log-emission
    lat = lat_ref[:]  # (Mp, Mp) f32: lat[j_state, i_state] = log a[i, j]
    bw = tok_ref.shape[1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, bw), 0)

    def maxplus_unrolled(om):
        # running (max, argmax) over source states i with 2-D ops; strict >
        # keeps the FIRST maximising index (reference argmax tie-break).
        # Fast for small M, but Mosaic keeps ~mp live slabs across the
        # unrolled chain, so bw must shrink as mp grows (see bw cap below).
        mx = lat[:, 0:1] + om[0:1, :]
        am = jnp.zeros((mp, bw), jnp.int32)
        for i in range(1, mp):
            cand = lat[:, i:i + 1] + om[i:i + 1, :]
            upd = cand > mx
            mx = jnp.where(upd, cand, mx)
            am = jnp.where(upd, jnp.int32(i), am)
        return mx, am

    def step(t, om):
        tok = tok_ref[pl.ds(t, 1), :]  # (1, BW)
        oh = (tok == kio).astype(jnp.bfloat16)
        e2 = jnp.dot(logbt, oh, preferred_element_type=jnp.float32)
        loge = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]  # (Mp, BW) f32-exact

        mx, am = maxplus_unrolled(om)
        new = mx + loge
        new = new - jnp.max(new, axis=0, keepdims=True)  # rescale

        pad = tok == PAD_TOKEN
        ptr_ref[pl.ds(t, 1), :, :] = jnp.where(pad, sub_ids, am).astype(
            ptr_ref.dtype
        )[None]
        return jnp.where(pad, om, new)

    # int32 bounds keep the induction variable i32 under jax_enable_x64
    om = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, om_s[:])
    om_s[:] = om

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        omf_ref[:] = om_s[:]


def _fwd_kernel_vo(tok_ref, om0_ref, logbt_ref, latt_ref, om_all_ref,
                   omf_ref, om_s, omtmp_s, *, mp: int, chunk_t: int,
                   unroll2d: bool = True):
    """Value-only forward for large M: stores each step's INCOMING rescaled
    omega (f32) instead of backpointers; the grouped max-plus keeps no
    argmax state (~2.5x fewer VPU ops/column than the pointer variant)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        om_s[:] = om0_ref[:]

    logbt = logbt_ref[:]  # (3Mp, KP) bf16 hi/mid/lo log-emission
    bw = tok_ref.shape[-1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)
    gsz = 8  # source-state group size

    if unroll2d:
        lat = latt_ref[:]  # (Mp, Mp): lat[dest, src] (passed untransposed)
        nacc = 4  # independent running-max chains (ILP)

        def maxplus_valonly(om):
            # fully unrolled 2-D running max over source states: the same
            # add+max op count as the slab form but all ops are flat
            # (Mp, BW) vectors — and split across ``nacc`` independent
            # accumulator chains so the VPU is not serialised on one
            # max-dependency chain (f32 max is exact and associative, so
            # any accumulation order is bit-identical to the scan
            # decoder's, ties included).
            accs = [lat[:, k:k + 1] + om[k:k + 1, :]
                    for k in range(min(nacc, mp))]
            for i in range(len(accs), mp):
                k = i % nacc
                accs[k] = jnp.maximum(accs[k],
                                      lat[:, i:i + 1] + om[i:i + 1, :])
            while len(accs) > 1:
                accs = [jnp.maximum(accs[k], accs[k + 1])
                        for k in range(0, len(accs) - 1, 2)] + (
                    [accs[-1]] if len(accs) % 2 else [])
            return accs[0]
    else:
        def maxplus_valonly(om):
            # fori_loop over groups of 8 source states: bounded live
            # buffers (one (8, Mp, BW) slab at a time).  Dynamic slicing
            # works on REFS only (Mosaic has no dynamic_slice on values),
            # so omega round-trips through scratch.
            omtmp_s[:] = om

            def group(g, mx):
                rows = latt_ref[pl.ds(g * gsz, gsz), :]  # (G, Mp)
                omg = omtmp_s[pl.ds(g * gsz, gsz), :]  # (G, BW)
                slab = rows[:, :, None] + omg[:, None, :]  # (G, Mp, BW)
                return jnp.maximum(mx, jnp.max(slab, axis=0))

            mx0 = jnp.full((mp, bw), jnp.float32(2 * _NEG))
            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(mp // gsz),
                                     group, mx0)

    def step(t, om):
        tok = _tok_slice(tok_ref, t)  # (1, BW)
        if not _VO_NOSTORE:
            om_all_ref[pl.ds(t, 1), :, :] = om[None]  # omega ENTERING t
        oh = (tok == kio).astype(jnp.bfloat16)
        e2 = jnp.dot(logbt, oh, preferred_element_type=jnp.float32)
        loge = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]  # (Mp, BW) f32-exact

        new = maxplus_valonly(om) + loge
        new = new - jnp.max(new, axis=0, keepdims=True)  # rescale
        pad = tok == PAD_TOKEN
        return jnp.where(pad, om, new)

    om = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, om_s[:])
    om_s[:] = om

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        omf_ref[:] = om_s[:]


def _bwd_kernel_vo(tok_ref, om_all_ref, latt3_ref, st0_ref, path_ref, st_s,
                   *, mp: int, chunk_t: int):
    """Pointer-recompute backtrack for the value-only path: at column t,
    select row lat[state_w, :] per lane via an exact one-hot matmul
    (split-bf16 latt3, f32-exact), add the stored incoming omega, and take
    the FIRST maximising source index (eq + min-iota).  The scores are the
    same f32 sums the forward maximised, so the path matches the pointer
    variant (and decoders.viterbi) exactly, ties included."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st_s[:] = st0_ref[:]

    latt3 = latt3_ref[:]  # (3Mp, Mp) bf16: split of lat.T (dest on lanes)
    bw = path_ref.shape[-1]
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, bw), 0)

    def step(k, st):
        t = chunk_t - 1 - k
        tok = _tok_slice(tok_ref, t)  # (1, BW)
        ohj = (st == sub_ids).astype(jnp.bfloat16)  # (Mp, BW) dest one-hot
        s2 = jnp.dot(latt3, ohj, preferred_element_type=jnp.float32)
        sel = s2[:mp] + s2[mp:2 * mp] + s2[2 * mp:]  # lat[st_w, i] per lane
        score = om_all_ref[t] + sel  # (Mp, BW)
        mx = jnp.max(score, axis=0, keepdims=True)
        prev = jnp.min(
            jnp.where(score == mx, sub_ids, jnp.int32(mp)), axis=0,
            keepdims=True,
        )
        prev = jnp.where(tok == PAD_TOKEN, st, prev)
        path_ref[pl.ds(t, 1), 0, :] = prev
        return prev

    st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, st_s[:])
    st_s[:] = st


def _bwd_kernel(ptr_ref, st0_ref, path_ref, st_s, *, mp: int, chunk_t: int):
    """Walk the int8 backpointer table in reverse: path_ref[t] = state at
    column t (the predecessor of the state at t+1)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st_s[:] = st0_ref[:]

    bw = path_ref.shape[1]
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, bw), 0)

    def step(k, st):
        t = chunk_t - 1 - k
        ohj = (st == sub_ids).astype(jnp.int32)  # (Mp, BW)
        # explicit i32 accumulation: under jax_enable_x64 the sum would
        # otherwise widen to i64, which Mosaic cannot legalize
        prev = jnp.sum(ohj * ptr_ref[t].astype(jnp.int32), axis=0,
                       keepdims=True, dtype=jnp.int32)
        path_ref[pl.ds(t, 1), :] = prev
        return prev

    st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, st_s[:])
    st_s[:] = st


@functools.partial(
    jax.jit, static_argnames=("block_w", "chunk_t", "interpret")
)
def viterbi_fused(a, bfull, pi, tokens, *, block_w: int = 2048,
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

    # Small M: unrolled max-plus (fastest, but Mosaic keeps ~mp live
    # (mp, bw) slabs across the unrolled chain, so mp^2 * bw * 4 must stay
    # <~ 12 MB of scoped VMEM).  Large M: value-only forward + pointer
    # recompute (grouped fori_loop, bounded liveness, wide window block).
    grouped = mp > _GROUPED_MIN_MP
    if grouped:
        # (round 4 tried widening to 2048 lanes at tc=4 — the 3-D
        # token/path blocks make sub-8 chunks legal — but Mosaic refuses
        # the 2048-lane compile and 1024 at tc=4 measured no faster than
        # tc=8: the dense max-plus is VPU-op bound, per
        # tools/exp_viterbi_census.py, so width does not help here)
        bw_cap = 1024
        pdt, pbytes = jnp.float32, 4  # stores f32 omegas, not pointers
    else:
        bw_cap = max(128, (12 * 2**20 // (4 * mp * mp)) // 128 * 128)
        pdt = _ptr_dtype(m)
        pbytes = jnp.dtype(pdt).itemsize
    bw = min(block_w, bw_cap, _round_up(w, 128))
    wp = _round_up(w, bw)
    # the (tc, Mp, BW) pointer/omega block is the VMEM hog; cap it at
    # ~_PTR_BLOCK_MB per pipeline buffer (int8: 4x the columns of int32).
    # tc below 8 is legal (the tiled dims of a 3-D block are the last
    # two) and worth it: the kernels are instruction-issue bound, so a
    # WIDER window block at a shallower time chunk is a large net win.
    tc = min(chunk_t,
             max(8, (int(_PTR_BLOCK_MB * 2**20) // (mp * bw * pbytes))
                 // 8 * 8))
    mp_out = mp
    nostore = grouped and _VO_NOSTORE
    if nostore:  # timing diagnostic: no omega stream, no backtrack
        tc, mp_out = min(chunk_t, 64), 8

    tok0 = tokens[:, 0]
    e0 = log_clip(bfull).T[jnp.maximum(tok0, 0)]  # (W, M)
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.zeros_like(e0), e0)
    om0 = log_clip(pi)[None, :] + e0
    om0 = om0 - jnp.max(om0, axis=1, keepdims=True)
    om0_p = jnp.full((mp, wp), f32(_NEG)).at[:m, :w].set(om0.T)

    rest = tokens[:, 1:]
    tp = max(_round_up(rest.shape[1], tc), tc)
    tok_t = jnp.full((tp, wp), PAD_TOKEN, jnp.int32)
    tok_t = tok_t.at[: rest.shape[1], :w].set(rest.T.astype(jnp.int32))
    if grouped:
        tok_t = tok_t[:, None, :]  # (tp, 1, wp): tc=4 needs 3-D blocks

    grid = (wp // bw, tp // tc)
    n_j = tp // tc
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731
    if grouped:
        fwd = functools.partial(_fwd_kernel_vo, mp=mp, chunk_t=tc,
                                unroll2d=_VO_UNROLL2D)
        fwd_inputs = (tok_t, om0_p, logbt_cat,
                      lat if _VO_UNROLL2D else lat.T)
        fwd_scratch = [pltpu.VMEM((mp, bw), f32), pltpu.VMEM((mp, bw), f32)]
    else:
        fwd = functools.partial(_fwd_kernel, mp=mp, chunk_t=tc)
        fwd_inputs = (tok_t, om0_p, logbt_cat, lat)
        fwd_scratch = [pltpu.VMEM((mp, bw), f32)]
    tok_spec = (pl.BlockSpec((tc, 1, bw), lambda i, j: (j, i * 0, i),
                             memory_space=pltpu.VMEM)
                if grouped else
                pl.BlockSpec((tc, bw), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM))
    ptrs, omf = pl.pallas_call(
        fwd,
        grid=grid,
        in_specs=[
            tok_spec,
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * mp, _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, mp_out, bw), lambda i, j: (j, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, mp_out, wp), pdt),
            jax.ShapeDtypeStruct((mp, wp), f32),
        ],
        scratch_shapes=fwd_scratch,
        interpret=interpret,
    )(*fwd_inputs)

    last = jnp.argmax(omf[:m, :w], axis=0).astype(jnp.int32)  # (W,)
    n_real = rest.shape[1]
    if nostore:
        # forward-ceiling diagnostic: the omega stream was not written, so
        # no backtrack is possible — return the final state broadcast over
        # t (WRONG paths, timing only; see _VO_NOSTORE)
        return jnp.broadcast_to(last[:, None], (w, t_len))
    last_p = jnp.zeros((1, wp), jnp.int32).at[0, :w].set(last)
    rev = lambda i, j: (i * 0 + n_j - 1 - j, i)  # noqa: E731
    rev3 = lambda i, j: (i * 0 + n_j - 1 - j, i * 0, i)  # noqa: E731
    revp = lambda i, j: (i * 0 + n_j - 1 - j, i)  # noqa: E731
    if grouped:
        latt3 = split_bf16(lat.T)  # (3Mp, Mp) exact split of lat.T
        path = pl.pallas_call(
            functools.partial(_bwd_kernel_vo, mp=mp, chunk_t=tc),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tc, 1, bw), rev3, memory_space=pltpu.VMEM),
                pl.BlockSpec((tc, mp, bw), rev3, memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * mp, mp), zz, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tc, 1, bw), rev3,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tp, 1, wp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, bw), jnp.int32)],
            interpret=interpret,
        )(tok_t, ptrs, latt3, last_p)[:, 0, :]
    else:
        path = pl.pallas_call(
            functools.partial(_bwd_kernel, mp=mp, chunk_t=tc),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tc, mp, bw), rev3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tc, bw), revp,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tp, wp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, bw), jnp.int32)],
            interpret=interpret,
        )(ptrs, last_p)
    full = jnp.concatenate([path[:n_real, :w], last[None, :]], axis=0)
    return full.T
