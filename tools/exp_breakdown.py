"""Breakdown: per-piece cost of the fused forward kernel.

Variants (all sequential grid, same layout as pallas_fwd._kernel):
  full3   - current: 3-split exact emission matmul + recursion
  full1   - single bf16 table (M rows 32 not 96)
  full2   - 2-split table (64 rows)
  noemis  - recursion only (e = 1)
  emisonly- one-hot + matmul only, no recursion
  i16oh   - full3 but one-hot compare in int16-ish packing (bf16 iota)
"""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.hmm.pallas_fwd import split_bf16, _KP, _K
from itrails_tpu.data.tokens import PAD_TOKEN

M, MP = 27, 32
W, T = 4096, 8192
rng = np.random.default_rng(0)


def make_kernel(variant, nparts):
    def kern(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref, ll_ref, alf_ref,
             al_s, acc_s, *, mp, chunk_t):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            al_s[:] = al0_ref[:]
            acc_s[:] = acc0_ref[:]

        btcat = btcat_ref[:]
        at = at_ref[:]
        bw = tok_ref.shape[1]
        if variant == "i16oh":
            # TIMING PROBE ONLY — numerically invalid: bf16 cannot
            # represent all integers up to 624, so token ids >= 257 can
            # collide after rounding and the one-hot may mis-match.
            kio = jax.lax.broadcasted_iota(
                jnp.int32, (_KP, bw), 0).astype(jnp.bfloat16)
        else:
            kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)

        def step(t, carry):
            al, acc = carry
            tok = tok_ref[pl.ds(t, 1), :]
            if variant == "noemis":
                e = 1.0
            else:
                if variant == "i16oh":
                    oh = (tok.astype(jnp.bfloat16) == kio).astype(jnp.bfloat16)
                else:
                    oh = (tok == kio).astype(jnp.bfloat16)
                e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
                e = e2[:mp]
                for p in range(1, nparts):
                    e = e + e2[p * mp:(p + 1) * mp]
            if variant == "emisonly":
                nx = e + al
            else:
                nx = jnp.dot(at, al, preferred_element_type=jnp.float32) * e
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
            alf_ref[:] = al_s[:]
    return kern


@functools.partial(jax.jit, static_argnames=("variant", "nparts", "bw", "tc"))
def run(a, bfull, pi, tokens, variant="full3", nparts=3, bw=4096, tc=128):
    f32 = jnp.float32
    at = jnp.zeros((MP, MP), f32).at[:M, :M].set(a.T)
    bt = jnp.zeros((MP, _KP), f32).at[:M, :_K].set(bfull)
    if nparts == 1:
        btcat = bt.astype(jnp.bfloat16)
    else:
        btcat = split_bf16(bt, parts=nparts)
    al0 = jnp.ones((MP, W), f32) / MP
    acc0 = jnp.zeros((1, W), f32)
    tok_t = tokens.T
    grid = (W // bw, T // tc)
    zi = lambda i, j: (i * 0, i)
    zz = lambda i, j: (i * 0, i * 0)
    ll, alf = pl.pallas_call(
        functools.partial(make_kernel(variant, nparts), mp=MP, chunk_t=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((nparts * MP, _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, MP), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, W), f32),
            jax.ShapeDtypeStruct((MP, W), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((MP, bw), f32),
            pltpu.VMEM((1, bw), f32),
        ],
    )(tok_t, al0, acc0, btcat, at)
    return jnp.sum(ll)


def main():
    dev = jax.devices()[0]
    a = np.abs(rng.standard_normal((M, M))).astype(np.float32)
    a /= a.sum(1, keepdims=True)
    bfull = np.abs(rng.standard_normal((M, _K))).astype(np.float32)
    bfull /= bfull.sum(1, keepdims=True)
    pi = (np.ones(M) / M).astype(np.float32)
    a, bfull, pi = map(lambda x: jax.device_put(jnp.asarray(x), dev),
                       (a, bfull, pi))
    bufs = [jax.device_put(jnp.asarray(
        rng.integers(0, 625, size=(W, T)), jnp.int32), dev) for _ in range(4)]

    cases = [
        ("full3", 3, 4096, 128), ("full2", 2, 4096, 128),
        ("full1", 1, 4096, 128), ("noemis", 1, 4096, 128),
        ("emisonly", 1, 4096, 128), ("i16oh", 3, 4096, 128),
        ("full3", 3, 2048, 128), ("full3", 3, 4096, 256),
        ("full3", 3, 4096, 512),
    ]
    for variant, nparts, bw, tc in cases:
        try:
            fn = lambda tok: float(run(a, bfull, pi, tok, variant=variant,
                                       nparts=nparts, bw=bw, tc=tc))
            fn(bufs[0])
            ts = []
            for i in range(1, 4):
                t0 = time.time()
                fn(bufs[i])
                ts.append(time.time() - t0)
            dt = float(np.median(ts))
            print(f"{variant} p={nparts} bw={bw} tc={tc}: "
                  f"{W*T/dt/1e9:.3f} Gcol/s  {dt*1e3:.1f} ms")
        except Exception as ex:
            print(f"{variant} p={nparts} bw={bw} tc={tc}: FAIL {type(ex).__name__}")


if __name__ == "__main__":
    main()
