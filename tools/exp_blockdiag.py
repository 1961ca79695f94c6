"""Experiment: block-diagonal transition matmul. 4 window sub-blocks stacked
on sublanes -> AL (128, LW); AT128 = blockdiag(at x4) -> one full-array
(128,128)x(128,LW) matmul per step instead of a 1/16-utilized (32,32) one.
"""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.hmm.pallas_fwd import split_bf16, _KP, _K, forward_loglik_fused
from itrails_tpu.data.tokens import PAD_TOKEN

M, MP = 27, 32
NC = 4            # chains stacked on sublanes: NC*MP = 128
W, T = 4096, 8192
rng = np.random.default_rng(0)


def make_kernel(nparts, U, noemis):
    def kern(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref, ll_ref,
             al_s, acc_s, *, mp, chunk_t):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            al_s[:] = al0_ref[:]
            acc_s[:] = acc0_ref[:]

        btcat = btcat_ref[:]
        atbd = at_ref[:]          # (NC*MP, NC*MP) block-diag
        bw = tok_ref.shape[1]     # tokens laid out (tc, NC*LW)
        lw = bw // NC
        kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, lw), 0)

        def emis(tok):  # (1, LW) -> (MP, LW) f32
            oh = (tok == kio).astype(jnp.bfloat16)
            e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
            e = e2[:mp]
            for p in range(1, nparts):
                e = e + e2[p * mp:(p + 1) * mp]
            return e

        def outer(t, carry):
            al, acc = carry  # (NC*MP, LW), (NC, LW)
            base = t * U
            toks = tok_ref[pl.ds(base, U), :]  # (U, NC*LW)
            for q in range(U):
                nx = jnp.dot(atbd, al, preferred_element_type=jnp.float32)
                if noemis:
                    al = nx
                else:
                    e = jnp.concatenate(
                        [emis(toks[q:q + 1, c * lw:(c + 1) * lw])
                         for c in range(NC)], axis=0)  # (NC*MP, LW)
                    al = nx * e
            ss, rr = [], []
            for c in range(NC):
                s = jnp.sum(al[c * mp:(c + 1) * mp], axis=0, keepdims=True)
                ss.append(jnp.log(s))
                rr.append(jnp.broadcast_to(1.0 / s, (mp, lw)))
            al = al * jnp.concatenate(rr, axis=0)
            acc = acc + jnp.concatenate(ss, axis=0)
            return al, acc

        al, acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk_t // U), outer,
            (al_s[:], acc_s[:]))
        al_s[:] = al
        acc_s[:] = acc

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            ll_ref[:] = acc_s[:]
    return kern


@functools.partial(jax.jit,
                   static_argnames=("nparts", "U", "bw", "tc", "noemis"))
def fastll(a, bfull, pi, tokens, nparts=3, U=8, bw=4096, tc=128,
           noemis=False):
    f32 = jnp.float32
    lw = bw // NC
    nmp = NC * MP
    at1 = jnp.zeros((MP, MP), f32).at[:M, :M].set(a.T.astype(f32))
    atbd = jnp.zeros((nmp, nmp), f32)
    for c in range(NC):
        atbd = atbd.at[c * MP:(c + 1) * MP, c * MP:(c + 1) * MP].set(at1)
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

    # window w -> chain c = (w // lw) % NC, lane l = w % lw, blockrow w // bw
    # i.e. reshape W as (nb, NC, lw)
    nb = W // bw
    al0_p = jnp.zeros((nb, NC, MP, lw), f32)
    al0_p = al0_p.at[:, :, :M, :].set(
        al0.T.reshape(M, nb, NC, lw).transpose(1, 2, 0, 3))
    al0_p = al0_p.reshape(nb, nmp, lw).transpose(1, 0, 2).reshape(nmp, nb * lw)
    acc0_p = acc0.reshape(nb, NC, lw).transpose(1, 0, 2).reshape(NC, nb * lw)

    rest = tokens[:, 1:]
    tp = max(-(-rest.shape[1] // tc) * tc, tc)
    tok_t = jnp.full((tp, W), _K, jnp.int32)
    tok_t = tok_t.at[:rest.shape[1]].set(
        jnp.where(rest.T == PAD_TOKEN, _K, rest.T).astype(jnp.int32))
    # tokens per block laid out (tc, NC*lw) matching chain layout
    # column w of tok_t -> block nbi = w // bw, within-block (NC, lw)
    # keep as is: within a block of bw columns, chain c occupies
    # [c*lw:(c+1)*lw] — this already matches w = nbi*bw + c*lw + l
    grid = (W // bw, tp // tc)
    zi = lambda i, j: (i * 0, i)
    zz = lambda i, j: (i * 0, i * 0)
    ll = pl.pallas_call(
        functools.partial(make_kernel(nparts, U, noemis), mp=MP, chunk_t=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nmp, lw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, lw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((btcat.shape[0], _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((nmp, nmp), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NC, lw), zi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NC, nb * lw), f32),
        scratch_shapes=[
            pltpu.VMEM((nmp, lw), f32),
            pltpu.VMEM((NC, lw), f32),
        ],
    )(tok_t, al0_p, acc0_p, btcat, atbd)
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

    cases = [(3, 8, 4096, 128, True), (3, 8, 4096, 128, False),
             (2, 8, 4096, 128, False), (3, 4, 4096, 128, False),
             (2, 8, 2048, 128, False)]
    for nparts, U, bw, tc, ne in cases:
        try:
            fn = lambda tok: float(fastll(a, bfull, pi, tok, nparts=nparts,
                                          U=U, bw=bw, tc=tc, noemis=ne))
            v = fn(bufs[0])
            ts = []
            for i in range(1, 4):
                t0 = time.time()
                fn(bufs[i])
                ts.append(time.time() - t0)
            dt = float(np.median(ts))
            tag = "noemis" if ne else "full"
            print(f"{tag} p={nparts} U={U} bw={bw}: {W*T/dt/1e9:.3f} Gcol/s "
                  f"{dt*1e3:.1f} ms  dll={v-ref:+.4f}")
        except Exception as ex:
            print(f"p={nparts} U={U} bw={bw} ne={ne}: FAIL {type(ex).__name__}: {str(ex)[:90]}")


if __name__ == "__main__":
    main()
