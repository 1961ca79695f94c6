"""NEGATIVE RESULT (round 2): two-pass emission-precompute decode plan.

Stage 1: E = btcat @ onehot(tokens) for the whole batch, as a chunked XLA
         einsum (MXU utilization for the gather-as-matmul).
Stage 2: a forward scan kernel that reads precomputed E from HBM instead of
         building one-hot emissions per step (HBM-bandwidth bound).

Measured (v5e, M=27, 32 Mcol batch): stage 1 ALONE runs at 0.475 Gcol/s
(f32 out) / 0.818 Gcol/s (bf16 out) — no faster than the entire fused
one-pass kernel (0.58 Gcol/s), so the plan cannot win even with a free
stage 2; and the stage-2 stream kernel VMEM-OOMs at any (tc, Mp, BW)
block worth keeping (the (tc, 32, 4096) E block + its double buffer blow
the 16 MB budget).  The production one-pass kernel stays.  In-kernel
variants are explored in exp_fwd_pipe.py instead.

Run on the real TPU; prints Gcol/s per stage and combined.
"""
import time, json
import numpy as np
import jax, jax.numpy as jnp
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.hmm.pallas_fwd import split_bf16, _round_up, _KP, _K
from itrails_tpu.data.tokens import PAD_TOKEN

M = 27
MP = 32
W, T = 4096, 8192
rng = np.random.default_rng(0)


def timeit(fn, bufs, reps=3):
    fn(bufs[0])  # compile+warm
    ts = []
    for i in range(1, reps + 1):
        t0 = time.time()
        fn(bufs[i])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    dev = jax.devices()[0]
    a = np.abs(rng.standard_normal((M, M))).astype(np.float32)
    a /= a.sum(1, keepdims=True)
    bfull = np.abs(rng.standard_normal((M, _K))).astype(np.float32)
    bfull /= bfull.sum(1, keepdims=True)
    pi = (np.ones(M) / M).astype(np.float32)
    a, bfull, pi = map(lambda x: jax.device_put(jnp.asarray(x), dev), (a, bfull, pi))

    bufs = [
        jax.device_put(jnp.asarray(
            rng.integers(0, 625, size=(W, T)), jnp.int32), dev)
        for _ in range(4)
    ]

    bt = jnp.zeros((MP, _KP), jnp.float32).at[:M, :_K].set(bfull)
    btcat = split_bf16(bt)  # (3MP, KP)

    # ---- stage 1: chunked one-hot einsum over the full batch ----
    @functools.partial(jax.jit, static_argnames=("ct",))
    def estage(tokens, ct=512):
        tt = tokens.T.reshape(T // ct, ct, W)  # (nc, ct, W)
        def chunk(tok):  # (ct, W)
            oh = (tok[:, None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (1, _KP, 1), 1)).astype(jnp.bfloat16)
            e2 = jnp.einsum("mk,tkw->tmw", btcat, oh,
                            preferred_element_type=jnp.float32)
            return e2[:, :MP] + e2[:, MP:2*MP] + e2[:, 2*MP:]
        return jax.lax.map(chunk, tt)  # (nc, ct, MP, W)

    def run_e(tok):
        return jax.block_until_ready(estage(tok))
    dt_e = timeit(run_e, bufs)
    print("stage1 einsum f32-out:", round(W*T/dt_e/1e9, 3), "Gcol/s",
          round(dt_e*1e3, 1), "ms")

    # variant: bf16 output (half stream bytes)
    @functools.partial(jax.jit, static_argnames=("ct",))
    def estage_bf16(tokens, ct=512):
        tt = tokens.T.reshape(T // ct, ct, W)
        def chunk(tok):
            oh = (tok[:, None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (1, _KP, 1), 1)).astype(jnp.bfloat16)
            e = jnp.einsum("mk,tkw->tmw", bt.astype(jnp.bfloat16), oh,
                           preferred_element_type=jnp.float32)
            return e.astype(jnp.bfloat16)
        return jax.lax.map(chunk, tt)
    def run_eb(tok):
        return jax.block_until_ready(estage_bf16(tok))
    dt_eb = timeit(run_eb, bufs)
    print("stage1 einsum bf16-out:", round(W*T/dt_eb/1e9, 3), "Gcol/s",
          round(dt_eb*1e3, 1), "ms")

    # ---- stage 2: scan kernel streaming E from HBM ----
    def _scan_kernel(e_ref, tok_ref, at_ref, ll_ref, al_s, acc_s,
                     *, chunk_t):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            al_s[:] = jnp.zeros_like(al_s) + 1.0 / MP
            acc_s[:] = jnp.zeros_like(acc_s)

        at = at_ref[:]

        def step(t, carry):
            al, acc = carry
            e = e_ref[t]  # (MP, BW)
            tok = tok_ref[pl.ds(t, 1), :]
            nx = jnp.dot(at, al, preferred_element_type=jnp.float32) \
                * e.astype(jnp.float32)
            s = jnp.sum(nx, axis=0, keepdims=True)
            pad = tok == PAD_TOKEN
            snz = jnp.where(pad, 1.0, s)
            al = jnp.where(pad, al, nx / snz)
            acc = acc + jnp.where(pad, 0.0, jnp.log(snz))
            return al, acc

        al, acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk_t), step, (al_s[:], acc_s[:]))
        al_s[:] = al
        acc_s[:] = acc

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            ll_ref[:] = acc_s[:]

    @functools.partial(jax.jit, static_argnames=("bw", "tc", "edt"))
    def scan_stream(tokens, bw=2048, tc=256, edt=jnp.float32):
        at = jnp.zeros((MP, MP), jnp.float32).at[:M, :M].set(a.T)
        e_all = estage(tokens) if edt == jnp.float32 else estage_bf16(tokens)
        e_all = e_all.reshape(T, MP, W).astype(edt)
        tok_t = tokens.T
        grid = (W // bw, T // tc)
        zi = lambda i, j: (i * 0, i)
        zz = lambda i, j: (i * 0, i * 0)
        ll = pl.pallas_call(
            functools.partial(_scan_kernel, chunk_t=tc),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tc, MP, bw), lambda i, j: (j, i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tc, bw), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MP, MP), zz, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((MP, bw), jnp.float32),
                pltpu.VMEM((1, bw), jnp.float32),
            ],
        )(e_all, tok_t, at)
        return jnp.sum(ll)

    for edt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for bw in (1024, 2048):
            for tc in (128, 256):
                try:
                    fn = lambda tok: float(scan_stream(tok, bw=bw, tc=tc, edt=edt))
                    dt = timeit(fn, bufs)
                    print(f"combined e-stream {name} bw={bw} tc={tc}:",
                          round(W*T/dt/1e9, 3), "Gcol/s", round(dt*1e3, 1), "ms")
                except Exception as ex:
                    print(f"combined {name} bw={bw} tc={tc}: FAIL {type(ex).__name__}: {ex}")
                    break

    # current fused kernel for comparison
    from itrails_tpu.hmm.pallas_fwd import forward_loglik_fused
    fn = lambda tok: float(forward_loglik_fused(a, bfull, pi, tok))
    dt0 = timeit(fn, bufs)
    print("current fused kernel:", round(W*T/dt0/1e9, 3), "Gcol/s",
          round(dt0*1e3, 1), "ms")


if __name__ == "__main__":
    main()
