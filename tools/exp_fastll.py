"""
NOTE: the emit-1 PAD trick used here (PAD maps to a column of ones and
the recursion renormalizes unconditionally) advances alpha through the
transition matrix during pad steps, so it is equivalent to the production
kernel ONLY for trailing pads; inputs with mid-sequence PAD_TOKEN columns
are NOT supported by this experimental variant.
Experiment: fast loglik kernel — pad-free (pad emits 1 via table),
renormalize every RN steps, optional multi-step batched one-hot matmul.
Checks numerics vs the current fused kernel, then times variants.
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


def make_kernel(nparts, rn, kb):
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
        # dim-0 iota values are already < _KP; no modulo needed
        kio = jax.lax.broadcasted_iota(
            jnp.int32, (_KP, kb * bw if kb > 1 else bw), 0)

        def substep(al, e):
            return jnp.dot(at, al, preferred_element_type=jnp.float32) * e

        def outer(t, carry):
            # t indexes groups of rn steps; rn % kb == 0
            al, acc = carry
            base = t * rn
            for g in range(rn // kb):
                tok = tok_ref[pl.ds(base + g * kb, kb), :]  # (kb, BW)
                tokw = tok.reshape(1, kb * bw)
                oh = (tokw == kio).astype(jnp.bfloat16)  # (KP, kb*BW)
                e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
                e = e2[:mp]
                for p in range(1, nparts):
                    e = e + e2[p * mp:(p + 1) * mp]
                if kb == 1:
                    al = substep(al, e)
                else:
                    for q in range(kb):
                        al = substep(al, e[:, q * bw:(q + 1) * bw])
            s = jnp.sum(al, axis=0, keepdims=True)
            al = al * (1.0 / s)
            acc = acc + jnp.log(s)
            return al, acc

        al, acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk_t // rn), outer, (al_s[:], acc_s[:]))
        al_s[:] = al
        acc_s[:] = acc

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            ll_ref[:] = acc_s[:]
    return kern


@functools.partial(jax.jit, static_argnames=("nparts", "rn", "kb", "bw", "tc"))
def fastll(a, bfull, pi, tokens, nparts=3, rn=4, kb=1, bw=4096, tc=128):
    f32 = jnp.float32
    at = jnp.zeros((MP, MP), f32).at[:M, :M].set(a.T.astype(f32))
    bt = jnp.zeros((MP, _KP), f32).at[:M, :_K].set(bfull.astype(f32))
    # pad tokens emit 1: contributes factor exactly 1 to every column sum
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
    # map PAD and padding to the emit-1 table region
    tok_t = jnp.full((tp, W), _K, jnp.int32)
    tok_t = tok_t.at[:rest.shape[1]].set(
        jnp.where(rest.T == PAD_TOKEN, _K, rest.T).astype(jnp.int32))

    grid = (W // bw, tp // tc)
    zi = lambda i, j: (i * 0, i)
    zz = lambda i, j: (i * 0, i * 0)
    ll = pl.pallas_call(
        functools.partial(make_kernel(nparts, rn, kb), mp=MP, chunk_t=tc),
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

    for nparts, rn, kb in [(3, 1, 1), (3, 4, 1), (3, 8, 1), (2, 4, 1),
                           (3, 4, 2), (3, 4, 4), (2, 4, 4), (2, 8, 4),
                           (3, 8, 4), (3, 8, 8)]:
        try:
            fn = lambda tok: float(fastll(a, bfull, pi, tok,
                                          nparts=nparts, rn=rn, kb=kb))
            v = fn(bufs[0])
            ts = []
            for i in range(1, 4):
                t0 = time.time()
                fn(bufs[i])
                ts.append(time.time() - t0)
            dt = float(np.median(ts))
            print(f"p={nparts} rn={rn} kb={kb}: {W*T/dt/1e9:.3f} Gcol/s "
                  f"{dt*1e3:.1f} ms  dll={v-ref:+.6f} ({abs(v-ref)/abs(ref):.2e} rel)")
        except Exception as ex:
            print(f"p={nparts} rn={rn} kb={kb}: FAIL {type(ex).__name__}: {str(ex)[:100]}")


if __name__ == "__main__":
    main()
