"""Experiment: in-kernel variants of the fused forward (pallas_fwd).

Measured first (exp_estream.py): the two-pass emission-precompute plan is
DEAD — the stage-1 XLA one-hot einsum alone runs at 0.47 (f32 out) / 0.82
(bf16 out) Gcol/s, i.e. no faster than the whole fused kernel (0.58), and
the stream kernel VMEM-OOMs at any (tc, Mp, BW) block worth keeping.  So
the remaining levers are *inside* the kernel:

  pipe   — software-pipeline the emission: carry e(t+1) in the loop so the
           VPU one-hot build of step t+1 can overlap the MXU/VPU work of
           step t (Mosaic schedules independent chains within a body).
  trans  — transition matmul algorithm: 'highest' (6-pass f32,
           production), 'split3' (explicit 3-pass bf16 hi/lo operand
           split; Mosaic has no Precision.HIGH so this emulates it),
           'default' (1-pass bf16 truncation — accuracy probe only).
  parts  — emission table bf16 split: 3 (bit-exact f32, production) vs 2
           (~1e-5 relative emission error, 1/3 less MXU work).
  bw/tc  — block sizing, esp. for M=133 where measured throughput (57
           Mcol/s) is ~3x below the kernel's accountable FLOP cost.

Mosaic gotchas hit here (kept for reference):
  * ``ref[pl.ds(traced_idx, 1)]`` fails with "Too many leaves for
    PyTreeDef" when traced OUTSIDE a fori_loop body (the same load inside
    the loop, including with a clamped computed index, is fine) — the
    initial pipelined emission must use a static ``ref[0:1]`` slice;
  * ``Precision.HIGH`` is not lowered ("Unsupported dot precision").

Accuracy is reported vs the production kernel's loglik on the same batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_fwd_pipe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm.pallas_fwd import (_K, _KP, _round_up,
                                        forward_loglik_fused, split_bf16)


def _bf16_hi(x):
    """Exact bf16 truncation of f32 via integer masking (not elidable)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _kernel(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref, atlo_ref,
            ll_ref, alf_ref, al_s, acc_s, *, mp: int, chunk_t: int,
            parts: int, trans: str, pipe: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        al_s[:] = al0_ref[:]
        acc_s[:] = acc0_ref[:]

    btcat = btcat_ref[:]
    bw = tok_ref.shape[1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (_KP, bw), 0)

    if trans == "split3":
        at_hi = atlo_ref[0].astype(jnp.bfloat16)   # exact bf16 rows
        at_lo = atlo_ref[1].astype(jnp.bfloat16)

        def trans_dot(al):
            hi = _bf16_hi(al)
            lo = (al - hi).astype(jnp.bfloat16)
            hi = hi.astype(jnp.bfloat16)
            return (jnp.dot(at_hi, hi, preferred_element_type=jnp.float32)
                    + jnp.dot(at_hi, lo, preferred_element_type=jnp.float32)
                    + jnp.dot(at_lo, hi, preferred_element_type=jnp.float32))
    else:
        at = at_ref[:]
        precision = (jax.lax.Precision.HIGHEST if trans == "highest"
                     else jax.lax.Precision.DEFAULT)

        def trans_dot(al):
            return jnp.dot(at, al, preferred_element_type=jnp.float32,
                           precision=precision)

    def emis_oh(oh):
        e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
        e = e2[:mp]
        for p in range(1, parts):
            e = e + e2[p * mp:(p + 1) * mp]
        return e

    def emis(t):
        tok = tok_ref[pl.ds(t, 1), :]
        return emis_oh((tok == kio).astype(jnp.bfloat16))

    def core(t, al, acc, e):
        tok = tok_ref[pl.ds(t, 1), :]
        nx = trans_dot(al) * e
        s = jnp.sum(nx, axis=0, keepdims=True)
        pad = tok == PAD_TOKEN
        snz = jnp.where(pad, 1.0, s)
        al = jnp.where(pad, al, nx / snz)
        acc = acc + jnp.where(pad, 0.0, jnp.log(snz))
        return al, acc

    if pipe:
        # initial e via a STATIC slice: pl.ds with a traced index outside
        # the loop body fails Mosaic lowering (see module docstring)
        e0 = emis_oh((tok_ref[0:1, :] == kio).astype(jnp.bfloat16))

        def step(t, carry):
            al, acc, e = carry
            tn = jnp.minimum(t + 1, jnp.int32(chunk_t - 1))
            e_next = emis(tn)  # independent chain: overlaps core(t)
            al, acc = core(t, al, acc, e)
            return al, acc, e_next

        al, acc, _ = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk_t), step,
            (al_s[:], acc_s[:], e0))
    else:
        def step(t, carry):
            al, acc = carry
            return core(t, al, acc, emis(t))

        al, acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk_t), step, (al_s[:], acc_s[:]))
    al_s[:] = al
    acc_s[:] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        ll_ref[:] = acc_s[:]
        alf_ref[:] = al_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("block_w", "chunk_t", "parts", "trans", "pipe"))
def fwd_variant(a, bfull, pi, tokens, *, block_w=4096, chunk_t=128,
                parts=3, trans="highest", pipe=False):
    m = a.shape[0]
    w, t_len = tokens.shape
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32

    at = jnp.zeros((mp, mp), f32).at[:m, :m].set(a.T.astype(f32))
    at_hi = _bf16_hi(at)
    atlo = jnp.stack([at_hi, at - at_hi])  # f32 carriers of exact bf16 parts
    bt = jnp.zeros((mp, _KP), f32).at[:m, :_K].set(bfull.astype(f32))
    btcat = split_bf16(bt, parts=parts)

    bw = min(block_w, _round_up(w, 128))
    wp = _round_up(w, bw)

    tok0 = tokens[:, 0]
    e0 = bfull.T.astype(f32)[jnp.maximum(tok0, 0)]
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.ones_like(e0), e0)
    al0 = pi[None, :].astype(f32) * e0
    s0 = jnp.sum(al0, axis=1)
    al0 = al0 / s0[:, None]
    acc0 = jnp.log(s0)
    al0_p = jnp.zeros((mp, wp), f32).at[:m, :w].set(al0.T)
    al0_p = al0_p.at[0, w:].set(1.0)
    acc0_p = jnp.zeros((1, wp), f32).at[0, :w].set(acc0)

    tc = chunk_t
    rest = tokens[:, 1:]
    tp = max(_round_up(rest.shape[1], tc), tc)
    tok_t = jnp.full((tp, wp), PAD_TOKEN, jnp.int32)
    tok_t = tok_t.at[: rest.shape[1], :w].set(rest.T.astype(jnp.int32))

    grid = (wp // bw, tp // tc)
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731
    ll, alf = pl.pallas_call(
        functools.partial(_kernel, mp=mp, chunk_t=tc, parts=parts,
                          trans=trans, pipe=pipe),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((parts * mp, _KP), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), zz, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, mp, mp), lambda i, j: (i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, wp), f32),
            jax.ShapeDtypeStruct((mp, wp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp, bw), f32),
            pltpu.VMEM((1, bw), f32),
        ],
    )(tok_t, al0_p, acc0_p, btcat, at, atlo)
    return jnp.sum(ll[0, :w])


def bench(fn, bufs, reps=3):
    ll = float(fn(bufs[0]))
    ts = []
    for i in range(1, reps + 1):
        t0 = time.time()
        float(fn(bufs[i]))
        ts.append(time.time() - t0)
    return ll, float(np.median(ts))


def run_size(m, w, t_len, variants, rng):
    a = np.abs(rng.standard_normal((m, m))) + 0.1
    a = (a / a.sum(1, keepdims=True)).astype(np.float32)
    bfull = np.abs(rng.standard_normal((m, _K))) + 0.1
    bfull = (bfull / bfull.sum(1, keepdims=True)).astype(np.float32)
    pi = (np.ones(m) / m).astype(np.float32)
    dev = jax.devices()[0]
    a, bfull, pi = (jax.device_put(jnp.asarray(x), dev)
                    for x in (a, bfull, pi))
    bufs = [jax.device_put(jnp.asarray(
        rng.integers(0, 625, size=(w, t_len)), jnp.int32), dev)
        for _ in range(4)]
    n_cols = w * t_len

    ll_ref, dt = bench(
        lambda tok: forward_loglik_fused(a, bfull, pi, tok), bufs)
    print(f"M={m:4d} production: {n_cols/dt/1e6:8.1f} Mcol/s "
          f"ll={ll_ref:.6e}", flush=True)

    for kw in variants:
        tag = ",".join(f"{k}={v}" for k, v in kw.items())
        try:
            ll, dt = bench(
                lambda tok: fwd_variant(a, bfull, pi, tok, **kw), bufs)
            err = abs(ll - ll_ref) / abs(ll_ref)
            print(f"M={m:4d} {tag:55s} {n_cols/dt/1e6:8.1f} Mcol/s "
                  f"rel-err={err:.2e}", flush=True)
        except Exception as e:
            print(f"M={m:4d} {tag:55s} FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


def main():
    rng = np.random.default_rng(3)
    run_size(27, 4096, 8192, [
        dict(pipe=True),
        dict(pipe=True, trans="split3"),
        dict(parts=2, pipe=True),
        dict(chunk_t=256, pipe=True),
        dict(pipe=True, trans="default"),
    ], rng)
    run_size(133, 512, 4096, [
        dict(pipe=True),
        dict(trans="split3"),
        dict(pipe=True, trans="split3"),
        dict(block_w=2048, pipe=True, trans="split3"),
        dict(block_w=1024, chunk_t=256, pipe=True, trans="split3"),
        dict(parts=2, block_w=2048, pipe=True, trans="split3"),
    ], rng)


if __name__ == "__main__":
    main()
