"""Experiment: interleave NI independent window sub-chains in the inner loop
so MXU (transition matmul) and VPU (normalize / emission one-hot) work from
different chains can overlap.  Renorm every U steps, pad-free table.
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


def make_kernel(nparts, U, NI, noemis):
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
        sw = bw // NI
        kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, sw), 0)

        def emis(tok):  # (1, SW) -> (MP, SW) f32
            oh = (tok == kio).astype(jnp.bfloat16)
            e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
            e = e2[:mp]
            for p in range(1, nparts):
                e = e + e2[p * mp:(p + 1) * mp]
            return e

        def outer(t, carry):
            als, accs = carry  # tuples of NI arrays
            base = t * U
            toks = tok_ref[pl.ds(base, U), :]  # (U, BW)
            for q in range(U):
                es = [None] * NI
                if not noemis:
                    for c in range(NI):
                        es[c] = emis(toks[q:q + 1, c * sw:(c + 1) * sw])
                nals = []
                for c in range(NI):
                    nx = jnp.dot(at, als[c], preferred_element_type=jnp.float32)
                    nals.append(nx if noemis else nx * es[c])
                als = tuple(nals)
            nals, naccs = [], []
            for c in range(NI):
                s = jnp.sum(als[c], axis=0, keepdims=True)
                nals.append(als[c] * (1.0 / s))
                naccs.append(accs[c] + jnp.log(s))
            return tuple(nals), tuple(naccs)

        al0 = tuple(al_s[:, c * sw:(c + 1) * sw] for c in range(NI))
        ac0 = tuple(acc_s[:, c * sw:(c + 1) * sw] for c in range(NI))
        als, accs = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk_t // U), outer, (al0, ac0))
        for c in range(NI):
            al_s[:, c * sw:(c + 1) * sw] = als[c]
            acc_s[:, c * sw:(c + 1) * sw] = accs[c]

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            ll_ref[:] = acc_s[:]
    return kern


@functools.partial(jax.jit,
                   static_argnames=("nparts", "U", "NI", "bw", "tc", "noemis"))
def fastll(a, bfull, pi, tokens, nparts=3, U=8, NI=2, bw=4096, tc=128,
           noemis=False):
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
        functools.partial(make_kernel(nparts, U, NI, noemis), mp=MP, chunk_t=tc),
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

    cases = [
        # (nparts, U, NI, noemis)
        (3, 8, 1, True), (3, 8, 2, True), (3, 8, 4, True),
        (3, 8, 2, False), (3, 8, 4, False),
        (2, 8, 2, False), (2, 8, 4, False), (2, 4, 4, False),
    ]
    for nparts, U, NI, ne in cases:
        try:
            fn = lambda tok: float(fastll(a, bfull, pi, tok, nparts=nparts,
                                          U=U, NI=NI, noemis=ne))
            v = fn(bufs[0])
            ts = []
            for i in range(1, 4):
                t0 = time.time()
                fn(bufs[i])
                ts.append(time.time() - t0)
            dt = float(np.median(ts))
            tag = "noemis" if ne else "full"
            print(f"{tag} p={nparts} U={U} NI={NI}: {W*T/dt/1e9:.3f} Gcol/s "
                  f"{dt*1e3:.1f} ms  dll={v-ref:+.4f}")
        except Exception as ex:
            print(f"p={nparts} U={U} NI={NI} ne={ne}: FAIL {type(ex).__name__}: {str(ex)[:80]}")


if __name__ == "__main__":
    main()
