"""Fused Pallas TPU kernels for the forward log-likelihood GRADIENT.

The exact-gradient optimizer path (hmm.grad.forward_loglik_remat +
jax.grad) runs as an XLA scan roughly an order of magnitude slower than
the fused value kernel (hmm.pallas_fwd).  This module computes
``(total loglik, (dL/da, dL/dbfull, dL/dpi))`` with two fused kernels at
near value-kernel speed:

* forward: the scaled-linear forward of hmm.pallas_fwd, additionally
  emitting the alpha carry at each time-chunk entry (a (T/tc, Mp, W)
  checkpoint — memory O(T/tc), not O(T));
* backward: walks the chunks in reverse; each chunk recomputes its alpha
  rows forward from the checkpoint into VMEM scratch (the classic
  checkpoint/recompute trade), then sweeps backward keeping the scaled
  beta carry and accumulating the Baum-Welch sufficient statistics in
  VMEM:

      dL/da[i,j]      = sum_t  alpha_{t-1}(i) e_t(j) beta_t(j) / P
                      = sum_t  u_i (e*beta)_j / Z_t          (scale-free)
      dL/dbfull[j,v_t] = sum_t (u @ a)_j beta_t(j) / Z_t
      Z_t = sum_j (u @ a)_j (e*beta)_j,  u = alpha-hat_{t-1}

  Every per-step normalisation cancels inside the per-step Z, so no log
  bookkeeping is needed anywhere.  The dbfull scatter runs on the MXU as
  ``w_e @ onehot^T`` — the transpose of the value kernel's emission
  lookup.  The t=0 column (pi and its emission) is handled on the XLA
  side from the returned beta-at-origin.

Gradient parity vs jax.grad(forward_loglik_remat) is pinned in
tests/test_pallas_grad.py (f32 kernel vs f64 autodiff, rtol ~1e-4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm.pallas_fwd import split_bf16

__all__ = ["loglik_and_grads_fused", "supported"]

_K = 625
_KP = 640


def supported(platform: str | None = None) -> bool:
    if platform is None:
        platform = jax.default_backend()
    return platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref,
                ll_ref, chk_ref, al_s, acc_s, *, mp: int, chunk_t: int):
    """Scaled forward emitting the chunk-entry alpha checkpoint."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        al_s[:] = al0_ref[:]
        acc_s[:] = acc0_ref[:]

    chk_ref[:] = al_s[:][None]  # carry BEFORE this chunk's first column

    btcat = btcat_ref[:]
    at = at_ref[:]
    bw = tok_ref.shape[1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)

    def step(t, carry):
        al, acc = carry
        tok = tok_ref[pl.ds(t, 1), :]
        oh = (tok == kio).astype(jnp.bfloat16)
        e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
        e = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]
        nx = jnp.dot(at, al, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) * e
        s = jnp.sum(nx, axis=0, keepdims=True)
        pad = tok == PAD_TOKEN
        snz = jnp.where(pad, 1.0, s)
        al = jnp.where(pad, al, nx / snz)
        acc = acc + jnp.where(pad, 0.0, jnp.log(snz))
        return al, acc

    al, acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(chunk_t), step, (al_s[:], acc_s[:])
    )
    al_s[:] = al
    acc_s[:] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        ll_ref[:] = acc_s[:]


def _bwd_kernel(tok_ref, chk_ref, btcat_ref, at_ref, afwd_ref,
                da_ref, db_ref, bef_ref, be_s, da_s, db_s, alsc, esc,
                *, mp: int, chunk_t: int):
    """Reverse sweep: recompute the chunk's alphas from the checkpoint,
    then accumulate dA/dB statistics while propagating scaled beta."""
    i = pl.program_id(0)
    j = pl.program_id(1)  # REVERSE chunk order (index maps flip j)

    @pl.when(j == 0)
    def _():
        be_s[:] = jnp.ones_like(be_s)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        da_s[:] = jnp.zeros_like(da_s)
        db_s[:] = jnp.zeros_like(db_s)

    btcat = btcat_ref[:]
    at = at_ref[:]  # (Mp, Mp): at[j, i] = a[i, j]
    afwd = afwd_ref[:]  # (Mp, Mp): a[i, j]
    bw = tok_ref.shape[1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)
    tiny = jnp.float32(1e-30)

    # pass 1: recompute pre-update alphas + emission rows for this chunk
    def fwd_step(t, al):
        alsc[pl.ds(t, 1), :, :] = al[None]
        tok = tok_ref[pl.ds(t, 1), :]
        oh = (tok == kio).astype(jnp.bfloat16)
        e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
        e = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]
        esc[pl.ds(t, 1), :, :] = e[None]
        nx = jnp.dot(at, al, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) * e
        s = jnp.sum(nx, axis=0, keepdims=True)
        pad = tok == PAD_TOKEN
        return jnp.where(pad, al, nx / jnp.where(pad, 1.0, s))

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), fwd_step,
                      chk_ref[0])

    # pass 2: reverse, accumulating statistics
    def bwd_step(k, carry):
        be, da, db = carry
        t = chunk_t - 1 - k
        tok = tok_ref[pl.ds(t, 1), :]
        pad = tok == PAD_TOKEN
        # NB: (~pad).astype, not jnp.where(pad, 0.0, 1.0) — a where over
        # two bare Python floats traces to f64 under jax_enable_x64, and
        # a 64-bit vector aborts the Mosaic TPU compiler (layout.h
        # bitwidth check)
        live = (~pad).astype(jnp.float32)  # (1, BW)
        u = alsc[t]  # (Mp, BW) alpha-hat_{t-1}
        e = esc[t]
        atu = jnp.dot(at, u, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        v = e * be
        z = jnp.sum(atu * v, axis=0, keepdims=True)
        zinv = live / jnp.maximum(z, tiny)  # 0 on pad columns
        da = da + jax.lax.dot_general(
            u, v * zinv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        w_e = atu * be * zinv
        oh = (tok == kio).astype(jnp.float32)  # (KP, BW)
        db = db + jax.lax.dot_general(
            w_e, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        nx = jnp.dot(afwd, v, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        s = jnp.sum(nx, axis=0, keepdims=True)
        be = jnp.where(pad, be, nx / jnp.maximum(s, tiny))
        return be, da, db

    be, da, db = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(chunk_t), bwd_step,
        (be_s[:], da_s[:], db_s[:]),
    )
    be_s[:] = be
    da_s[:] = da
    db_s[:] = db

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        bef_ref[:] = be_s[:]

    @pl.when(jnp.logical_and(i == pl.num_programs(0) - 1,
                             j == pl.num_programs(1) - 1))
    def _():
        da_ref[:] = da_s[:]
        db_ref[:] = db_s[:]


@functools.partial(
    jax.jit, static_argnames=("block_w", "chunk_t", "interpret")
)
def loglik_and_grads_fused(a, bfull, pi, tokens, *, block_w: int = 512,
                           chunk_t: int = 64, interpret: bool = False):
    """``(total loglik, (da, dbfull, dpi))`` of a (W, T) token batch.

    Same contract as ``jax.value_and_grad(hmm.grad.forward_loglik_remat,
    argnums=(0, 1, 2))`` — pad windows/columns contribute nothing.
    """
    m = a.shape[0]
    w, t_len = tokens.shape
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32

    at = jnp.zeros((mp, mp), f32).at[:m, :m].set(a.T.astype(f32))
    afwd = jnp.zeros((mp, mp), f32).at[:m, :m].set(a.astype(f32))
    bt = jnp.zeros((mp, _KP), f32).at[:m, :_K].set(bfull.astype(f32))
    btcat = split_bf16(bt)

    bw = min(block_w, _round_up(w, 128))
    wp = _round_up(w, bw)
    # VMEM: alsc+esc are (tc, Mp, BW) f32 scratch each; cap ~3 MB apiece
    tc = min(chunk_t, max(8, (3 * 2**20 // (mp * bw * 4)) // 8 * 8))

    # column 0 on the XLA side
    tok0 = tokens[:, 0]
    e0 = bt[:m, :_K].T[jnp.maximum(tok0, 0)]  # (W, M)
    live0 = (tok0 != PAD_TOKEN).astype(f32)
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.ones_like(e0), e0)
    al0 = pi[None, :].astype(f32) * e0
    s0 = jnp.sum(al0, axis=1)
    al0 = al0 / s0[:, None]
    acc0 = jnp.log(s0) * live0
    al0_p = jnp.zeros((mp, wp), f32).at[:m, :w].set(al0.T)
    al0_p = al0_p.at[0, w:].set(1.0)
    acc0_p = jnp.zeros((1, wp), f32).at[0, :w].set(acc0)

    rest = tokens[:, 1:]
    tp = max(_round_up(rest.shape[1], tc), tc)
    tok_t = jnp.full((tp, wp), PAD_TOKEN, jnp.int32)
    tok_t = tok_t.at[: rest.shape[1], :w].set(rest.T.astype(jnp.int32))

    grid = (wp // bw, tp // tc)
    n_j = tp // tc
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731

    ll, chk = pl.pallas_call(
        functools.partial(_fwd_kernel, mp=mp, chunk_t=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * mp, _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, bw), lambda i, j: (j, i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, wp), f32),
            jax.ShapeDtypeStruct((n_j, mp, wp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp, bw), f32),
            pltpu.VMEM((1, bw), f32),
        ],
        interpret=interpret,
    )(tok_t, al0_p, acc0_p, btcat, at)

    rev2 = lambda i, j: (i * 0 + n_j - 1 - j, i)  # noqa: E731
    rev3 = lambda i, j: (i * 0 + n_j - 1 - j, i * 0, i)  # noqa: E731
    da_p, db_p, bef = pl.pallas_call(
        functools.partial(_bwd_kernel, mp=mp, chunk_t=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, bw), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * mp, _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((mp, mp), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, mp), f32),
            jax.ShapeDtypeStruct((mp, _KP), f32),
            jax.ShapeDtypeStruct((mp, wp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp, bw), f32),
            pltpu.VMEM((mp, mp), f32),
            pltpu.VMEM((mp, _KP), f32),
            pltpu.VMEM((tc, mp, bw), f32),
            pltpu.VMEM((tc, mp, bw), f32),
        ],
        interpret=interpret,
    )(tok_t, chk, btcat, at, afwd)

    # t = 0 column (pi and its emission) on the XLA side:
    #   dpi_j      = e0_j beta0_j / (Z0 s0)
    #   dbfull[j, v0] += pi_j beta0_j / (Z0 s0)
    bef_w = bef[:m, :w].T  # (W, M) scaled beta at the origin
    z0 = jnp.sum(al0 * bef_w, axis=1)  # (W,)
    # NOTE: dpi is deliberately NOT masked for all-pad windows, matching
    # grad.forward_loglik_remat: an empty window contributes log(sum(pi))
    # (identically 0 in value but grad 1/sum(pi) per element — a null
    # direction of the model, since sum(pi) == 1 for every parameter).
    coef = 1.0 / jnp.maximum(z0 * s0, 1e-30)
    dpi = jnp.sum(e0 * bef_w * coef[:, None], axis=0).astype(a.dtype)
    q0 = pi[None, :].astype(f32) * bef_w * coef[:, None]  # (W, M)
    oh0 = (jnp.maximum(tok0, 0)[:, None]
           == jnp.arange(_K, dtype=tok0.dtype)[None, :]).astype(f32)
    db0 = q0.T @ (oh0 * live0[:, None])  # (M, K)

    da = da_p[:m, :m].astype(a.dtype)
    db = (db_p[:m, :_K] + db0).astype(a.dtype)
    # f64 accumulation of the per-window logliks: at genome scale the
    # total is ~1e6 nats, where one f32 ULP is 0.125 — coarse enough that
    # a short L-BFGS-B line-search step can quantize to ZERO objective
    # change and trigger scipy's relative-reduction stop at the start
    # point (the round-5 int5p stall).  Summing the (W,) f32 values in
    # f64 keeps the objective continuous at ~per-window-ULP (5e-4)
    # resolution.  (No-op when x64 is disabled.)
    total = jnp.sum(ll[0, :w].astype(jnp.float64))
    return total, (da, db, dpi.astype(a.dtype))
