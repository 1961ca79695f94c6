"""Experiment: unrolled fast loglik kernel. fori over tc//U with a U-step
statically-unrolled body (static tok slices), one renorm per U steps.
"""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.hmm.pallas_fwd import split_bf16, _KP, _K, forward_loglik_fused
from itrails_tpu.data.tokens import PAD_TOKEN

M, MP = 27, 32
W, T = 4096, 8192
rng = np.random.default_rng(0)


def make_kernel(nparts, U):
    def kern(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref, ll_ref,
             al_s, acc_s, *, mp, chunk_t):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            al_s[:] = al0_ref[:]
            acc_s[:] = acc0_ref[:]

        btcat = btcat_ref[:]
        at = at_ref[:]
        bw = tok_ref.shape[1]
        kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)

        def emis(tok):  # (1, BW) -> (MP, BW) f32
            oh = (tok == kio).astype(jnp.bfloat16)
            e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
            e = e2[:mp]
            for p in range(1, nparts):
                e = e + e2[p * mp:(p + 1) * mp]
            return e

        def outer(t, carry):
            al, acc = carry
            base = t * U
            toks = tok_ref[pl.ds(base, U), :]  # one (U, BW) read
            for q in range(U):
                e = emis(toks[q:q + 1])
                al = jnp.dot(at, al, preferred_element_type=jnp.float32) * e
            s = jnp.sum(al, axis=0, keepdims=True)
            al = al * (1.0 / s)
            acc = acc + jnp.log(s)
            return al, acc

        al, acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk_t // U), outer, (al_s[:], acc_s[:]))
        al_s[:] = al
        acc_s[:] = acc

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            ll_ref[:] = acc_s[:]
    return kern


@functools.partial(jax.jit, static_argnames=("nparts", "U", "bw", "tc"))
def fastll(a, bfull, pi, tokens, nparts=3, U=4, bw=4096, tc=128):
    f32 = jnp.float32
    at = jnp.zeros((MP, MP), f32).at[:M, :M].set(a.T.astype(f32))
    bt = jnp.zeros((MP, _KP), f32).at[:M, :_K].set(bfull.astype(f32))
    bt = bt.at[:M, _K:].set(1.0)
    btcat = split_bf16(bt, parts=nparts) if nparts > 1 else bt.astype(jnp.bfloat16)

    tok0 = tokens[:, 0]
    e0 = bfull.T.astype(f32)[jnp.maximum(tok0, 0)]
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.ones_like(e0), e0)
    al0 = pi[None, :].astype(f32) * e0
    s0 = jnp.sum(al0, axis=1)
    al0 = al0 / s0[:, None]
    acc0 = jnp.log(s0)
    al0_p = jnp.zeros((MP, W), f32).at[:M].set(al0.T)
    acc0_p = acc0[None]

    rest = tokens[:, 1:]
    tp = max(-(-rest.shape[1] // tc) * tc, tc)
    tok_t = jnp.full((tp, W), _K, jnp.int32)
    tok_t = tok_t.at[:rest.shape[1]].set(
        jnp.where(rest.T == PAD_TOKEN, _K, rest.T).astype(jnp.int32))

    grid = (W // bw, tp // tc)
    zi = lambda i, j: (i * 0, i)
    zz = lambda i, j: (i * 0, i * 0)
    ll = pl.pallas_call(
        functools.partial(make_kernel(nparts, U), mp=MP, chunk_t=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((btcat.shape[0], _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, MP), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, W), f32),
        scratch_shapes=[
            pltpu.VMEM((MP, bw), f32),
            pltpu.VMEM((1, bw), f32),
        ],
    )(tok_t, al0_p, acc0_p, btcat, at)
    return jnp.sum(ll)


def main():
    dev = jax.devices()[0]
    a = np.abs(rng.standard_normal((M, M))).astype(np.float32)
    a /= a.sum(1, keepdims=True)
    bfull = np.abs(rng.standard_normal((M, _K))).astype(np.float32) ** 4 + 1e-8
    bfull /= bfull.sum(1, keepdims=True)
    pi = (np.ones(M) / M).astype(np.float32)
    a, bfull, pi = map(lambda x: jax.device_put(jnp.asarray(x), dev),
                       (a, bfull, pi))
    bufs = [jax.device_put(jnp.asarray(
        rng.integers(0, 625, size=(W, T)), jnp.int32), dev) for _ in range(4)]

    ref = float(forward_loglik_fused(a, bfull, pi, bufs[0]))
    print("ref ll:", ref)

    for nparts, U, bw, tc in [(3, 4, 4096, 128), (3, 8, 4096, 128),
                              (3, 16, 4096, 128), (2, 8, 4096, 128),
                              (1, 8, 4096, 128), (3, 8, 2048, 256),
                              (3, 32, 4096, 128), (3, 128, 4096, 128)]:
        try:
            fn = lambda tok: float(fastll(a, bfull, pi, tok,
                                          nparts=nparts, U=U, bw=bw, tc=tc))
            t0 = time.time()
            v = fn(bufs[0])
            ct = time.time() - t0
            ts = []
            for i in range(1, 4):
                t0 = time.time()
                fn(bufs[i])
                ts.append(time.time() - t0)
            dt = float(np.median(ts))
            print(f"p={nparts} U={U} bw={bw} tc={tc}: {W*T/dt/1e9:.3f} Gcol/s "
                  f"{dt*1e3:.1f} ms  dll={v-ref:+.4f} (compile {ct:.0f}s)")
        except Exception as ex:
            print(f"p={nparts} U={U} bw={bw} tc={tc}: FAIL {type(ex).__name__}: {str(ex)[:80]}")


if __name__ == "__main__":
    main()
