"""Max-plus forward-pass microbenchmark: find a VPU-friendly formulation.

Variants (forward value pass only, omega history stored):
  slab : current (TJ, Mp, BW) 3-D broadcast slabs
  iun  : unrolled loop over source state i with 2-D (Mp, BW) ops
  iun2 : iun with pairwise max tree
Run on TPU: PYTHONPATH=... python tools/exp_viterbi_v3.py
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

_K, _KP = 625, 640
_NEG = -1e4


def _round_up(x, m):
    return -(-x // m) * m


def make_fwd(variant, mp, chunk_t):
    def kern(tok_ref, om0_ref, logbt_ref, lat_ref, omh_ref, omf_ref, om_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            om_s[:] = om0_ref[:]

        logbt = logbt_ref[:]
        lat = lat_ref[:]  # (Mp_j, Mp_i): lat[j, i] = log a[i, j]
        bw = tok_ref.shape[1]
        kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)

        def step(t, om):
            omh_ref[pl.ds(t, 1), :, :] = om[None]
            tok = tok_ref[pl.ds(t, 1), :]
            oh = (tok == kio).astype(jnp.bfloat16)
            e2 = jnp.dot(logbt, oh, preferred_element_type=jnp.float32)
            loge = e2[:mp] + e2[mp:2 * mp] + e2[2 * mp:]

            if variant == "slab":
                tj = 8
                curs = []
                for jt in range(mp // tj):
                    lat_t = lat[jt * tj:(jt + 1) * tj, :]
                    slab = lat_t[:, :, None] + om[None, :, :]
                    curs.append(jnp.max(slab, axis=1))
                cur = jnp.concatenate(curs, axis=0)
            elif variant == "iun":
                cur = lat[:, 0:1] + om[0:1, :]
                for i in range(1, mp):
                    cur = jnp.maximum(cur, lat[:, i:i + 1] + om[i:i + 1, :])
            elif variant == "iun2":
                cands = [lat[:, i:i + 1] + om[i:i + 1, :] for i in range(mp)]
                while len(cands) > 1:
                    cands = [
                        jnp.maximum(cands[2 * k], cands[2 * k + 1])
                        for k in range(len(cands) // 2)
                    ] + ([cands[-1]] if len(cands) % 2 else [])
                cur = cands[0]
            new = cur + loge
            new = new - jnp.max(new, axis=0, keepdims=True)
            pad = tok == PAD_TOKEN
            return jnp.where(pad, om, new)

        om = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, om_s[:])
        om_s[:] = om

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            omf_ref[:] = om_s[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "block_w", "chunk_t"))
def fwd_only(a, bfull, pi, tokens, *, variant, block_w=1024, chunk_t=64):
    m = a.shape[0]
    w, t_len = tokens.shape
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32
    log_clip = lambda x: jnp.maximum(  # noqa: E731
        jnp.log(jnp.maximum(x.astype(f32), f32(0.0))), f32(_NEG))
    lat = jnp.full((mp, mp), f32(_NEG)).at[:m, :m].set(log_clip(a).T)
    logbt = jnp.full((mp, _KP), f32(_NEG)).at[:m, :_K].set(log_clip(bfull))
    logbt_cat = split_bf16(logbt)

    bw = min(block_w, _round_up(w, 128))
    wp = _round_up(w, bw)
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
    tok_t = tok_t.at[: rest.shape[1], :w].set(rest.T.astype(jnp.int32))

    grid = (wp // bw, tp // tc)
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731
    omh, omf = pl.pallas_call(
        make_fwd(variant, mp, tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i), memory_space=pltpu.VMEM),
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
    return omf


def main():
    model = build_model(
        t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004, t_upper=0.00745069,
        t_out=0.009312, N_AB=0.0005, N_ABC=0.0005, r=1.0,
        n_int_AB=3, n_int_ABC=3, dtype="float64", device="cpu",
    )
    cast = jnp.float32
    a = jnp.asarray(model.a, cast)
    pi = jnp.asarray(model.pi, cast)
    bfull = decoders.emission_table(
        jnp.asarray(model.b, cast), jnp.asarray(aggregation_matrix(), cast)
    )
    dev = jax.devices()[0]
    a, pi, bfull = jax.device_put((a, pi, bfull), dev)
    rng = np.random.default_rng(0)
    W, T = 2048, 4096
    bufs = [jax.device_put(jnp.asarray(
        rng.integers(0, 625, size=(W, T)), jnp.int32), dev) for _ in range(4)]

    ref = None
    for variant in ("slab", "iun", "iun2"):
        for bw in (1024, 2048):
            f = lambda tk: fwd_only(a, bfull, pi, tk, variant=variant,
                                    block_w=bw)
            out = np.asarray(f(bufs[0]))
            if ref is None:
                ref = out
            else:
                assert np.allclose(out, ref, atol=1e-5), f"{variant} mismatch"
            ts = []
            for tk in bufs[1:]:
                t0 = time.time()
                jax.block_until_ready(f(tk))
                ts.append(time.time() - t0)
            print(f"{variant} bw={bw}: {W*T/np.median(ts)/1e6:.1f} Mcol/s")


if __name__ == "__main__":
    main()
