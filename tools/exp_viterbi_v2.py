"""Prototype: Viterbi fused kernel v2 — omega-history forward + recompute
backtrack.  Compares accuracy vs decoders.viterbi and measures throughput
of (a) the current kernel, (b) forward-without-argmax, (c) v2 end-to-end.

Run on TPU: python tools/exp_viterbi_v2.py
"""
import functools
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.core.model import build_model
from itrails_tpu.data.tokens import PAD_TOKEN, aggregation_matrix
from itrails_tpu.hmm import decoders
from itrails_tpu.hmm.pallas_fwd import split_bf16
from itrails_tpu.hmm.pallas_viterbi import viterbi_fused

_K, _KP = 625, 640
_NEG = -1e4


def _round_up(x, m):
    return -(-x // m) * m


def _fwd_kernel(tok_ref, om0_ref, logbt_ref, lat_ref, omh_ref, omf_ref, om_s,
                *, mp, chunk_t):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        om_s[:] = om0_ref[:]

    logbt = logbt_ref[:]
    lat = lat_ref[:]
    bw = tok_ref.shape[1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)
    tj = 8

    def step(t, om):
        # store the omega USED at this step (carry from t-1)
        omh_ref[pl.ds(t, 1), :, :] = om[None]
        tok = tok_ref[pl.ds(t, 1), :]
        oh = (tok == kio).astype(jnp.bfloat16)
        e2 = jnp.dot(logbt, oh, preferred_element_type=jnp.float32)
        loge = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]
        curs = []
        for jt in range(mp // tj):
            lat_t = lat[jt * tj:(jt + 1) * tj, :]
            slab = lat_t[:, :, None] + om[None, :, :]
            curs.append(jnp.max(slab, axis=1))
        cur = jnp.concatenate(curs, axis=0)
        new = cur + loge
        new = new - jnp.max(new, axis=0, keepdims=True)
        pad = tok == PAD_TOKEN
        return jnp.where(pad, om, new)

    om = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, om_s[:])
    om_s[:] = om

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        omf_ref[:] = om_s[:]


def _bwd_kernel(tok_ref, omh_ref, latt_ref, state0_ref, path_ref, st_s,
                *, mp, chunk_t):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st_s[:] = state0_ref[:]

    latt = latt_ref[:]  # (3Mp, Mp) bf16 split of lat.T (exact f32 select)
    bw = tok_ref.shape[1]
    sio = jax.lax.broadcasted_iota(jnp.int32, (mp, bw), 0)

    def step(k, st):
        t = chunk_t - 1 - k  # walk the chunk in reverse
        # st: (1, BW) int32 current state at time t+1
        ohj = (st == sio).astype(jnp.bfloat16)  # (Mp, BW)
        s2 = jnp.dot(latt, ohj, preferred_element_type=jnp.float32)
        sel = s2[:mp] + s2[mp:2 * mp] + s2[2 * mp:]  # sel[i,w] = lat[st_w, i]
        om = omh_ref[t]  # (Mp, BW) carry used at step t
        scores = om + sel
        mx = jnp.max(scores, axis=0, keepdims=True)
        eq = scores == mx
        prev = jnp.min(jnp.where(eq, sio, jnp.int32(mp)), axis=0,
                       keepdims=True)
        tok = tok_ref[pl.ds(t, 1), :]
        pad = tok == PAD_TOKEN
        prev = jnp.where(pad, st, prev)
        path_ref[pl.ds(t, 1), :] = prev
        return prev

    st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, st_s[:])
    st_s[:] = st


@functools.partial(jax.jit, static_argnames=("block_w", "chunk_t"))
def viterbi_v2(a, bfull, pi, tokens, *, block_w=1024, chunk_t=64):
    m = a.shape[0]
    w, t_len = tokens.shape
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32
    log_clip = lambda x: jnp.maximum(  # noqa: E731
        jnp.log(jnp.maximum(x.astype(f32), f32(0.0))), f32(_NEG))
    lat = jnp.full((mp, mp), f32(_NEG)).at[:m, :m].set(log_clip(a).T)
    logbt = jnp.full((mp, _KP), f32(_NEG)).at[:m, :_K].set(log_clip(bfull))
    logbt_cat = split_bf16(logbt)
    latt_cat = split_bf16(lat.T)  # (3Mp, Mp) for exact bf16 row selection

    bw = min(block_w, _round_up(w, 128))
    wp = _round_up(w, bw)
    # (tc, Mp, BW) f32 omega-history block is the VMEM hog; ~2 MB/buffer
    tc_cap = max(8, (2 * 2**20 // (mp * bw * 4)) // 8 * 8)
    chunk_t = min(chunk_t, tc_cap)
    tok0 = tokens[:, 0]
    e0 = log_clip(bfull).T[jnp.maximum(tok0, 0)]
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.zeros_like(e0), e0)
    om0 = log_clip(pi)[None, :] + e0
    om0 = om0 - jnp.max(om0, axis=1, keepdims=True)
    om0_p = jnp.full((mp, wp), f32(_NEG)).at[:m, :w].set(om0.T)

    tc = chunk_t
    rest = tokens[:, 1:]
    tp = max(_round_up(rest.shape[1], tc), tc)
    tok_t = jnp.full((tp, wp), PAD_TOKEN, jnp.int32)
    tok_t = tok_t.at[:rest.shape[1], :w].set(rest.T.astype(jnp.int32))

    grid = (wp // bw, tp // tc)
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731
    omh, omf = pl.pallas_call(
        functools.partial(_fwd_kernel, mp=mp, chunk_t=tc),
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
            jax.ShapeDtypeStruct((tp, mp, wp), f32),
            jax.ShapeDtypeStruct((mp, wp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((mp, bw), f32)],
    )(tok_t, om0_p, logbt_cat, lat)

    last = jnp.argmax(omf[:m, :w], axis=0).astype(jnp.int32)
    last_p = jnp.zeros((1, wp), jnp.int32).at[0, :w].set(last)

    rev = lambda i, j: (i * 0 + pl.num_programs(1) - 1 - j, i)  # noqa: E731
    rev3 = lambda i, j: (i * 0 + pl.num_programs(1) - 1 - j, i * 0, i)  # noqa: E731
    path_rest = pl.pallas_call(
        functools.partial(_bwd_kernel, mp=mp, chunk_t=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, mp, bw), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * mp, mp), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, bw), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, bw), jnp.int32)],
    )(tok_t, omh, latt_cat, last_p)

    # path_rest[t] = state at global time t (t in 0..T-2); last = state T-1
    path = jnp.concatenate(
        [path_rest[:rest.shape[1], :w], last[None, :]], axis=0)
    return path.T


def main():
    m = build_model(
        t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004,
        t_upper=0.00745069, t_out=0.009312, N_AB=0.0005, N_ABC=0.0005,
        r=1.0, n_int_AB=3, n_int_ABC=3, dtype="float64", device="cpu")
    a = jnp.asarray(np.asarray(m.a, np.float32))
    pi = jnp.asarray(np.asarray(m.pi, np.float32))
    bfull = decoders.emission_table(
        jnp.asarray(np.asarray(m.b, np.float32)),
        jnp.asarray(aggregation_matrix(), jnp.float32))
    rng = np.random.default_rng(0)

    # correctness
    tokc = np.asarray(rng.integers(0, 625, size=(8, 515)))
    tokc[3, 200:] = PAD_TOKEN
    tokcj = jnp.asarray(tokc, jnp.int32)
    v_ref = np.asarray(decoders.viterbi(a, bfull, pi, tokcj))
    v_new = np.asarray(viterbi_v2(a, bfull, pi, tokcj, block_w=128,
                                  chunk_t=64))
    mask = tokc != PAD_TOKEN
    print("v2 mismatch vs scan (real cols):",
          (v_ref != v_new)[mask].mean())

    # perf
    W, T = 1024, 2048
    bufs = [jnp.asarray(rng.integers(0, 625, size=(W, T)), jnp.int32)
            for _ in range(4)]
    for name, fn in (
        ("v1", lambda t: viterbi_fused(a, bfull, pi, t)[:, -1].sum()),
        ("v2 bw=1024", lambda t: viterbi_v2(a, bfull, pi, t)[:, -1].sum()),
        ("v2 bw=2048", lambda t: viterbi_v2(
            a, bfull, pi, t, block_w=2048)[:, -1].sum()),
    ):
        f = jax.jit(fn)
        float(f(bufs[0]))
        ts = []
        for b in bufs[1:]:
            t0 = time.time()
            float(f(b))
            ts.append(time.time() - t0)
        print(f"{name}: {W*T/np.median(ts)/1e6:.1f} Mcol/s")


if __name__ == "__main__":
    main()
