"""Experiment: chunked pre-gather of emissions before the forward scan.

Outer scan over T/TC chunks; per chunk one batched XLA gather producing
(TC, W, M), then inner scan without any gather.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

M = 27
N_W, T = 4096, 8192


def make_fwd(tc, edtype):
    def fwd(a, bfull, pi, tokens):
        bt = bfull.T.astype(edtype)  # (625, M)
        al = pi[None, :] * bfull.T[tokens[:, 0]]
        s0 = jnp.sum(al, axis=1, keepdims=True)
        al = al / s0
        rest = tokens[:, 1:]  # (W, T-1); T-1 = 8191, pad to mult of tc
        t_rem = rest.shape[1]
        n_chunks = -(-t_rem // tc)
        pad = n_chunks * tc - t_rem
        rest = jnp.pad(rest, ((0, 0), (0, pad)))  # pad tokens: token 0 OK w/ mask
        valid = jnp.arange(n_chunks * tc) < t_rem
        chunks = rest.T.reshape(n_chunks, tc, N_W)  # (C, TC, W)
        vmask = valid.reshape(n_chunks, tc)

        def chunk_step(carry, inp):
            al, acc = carry
            toks, vm = inp  # (TC, W), (TC,)
            e_all = bt[toks]  # (TC, W, M) one gather

            def step(c, inp2):
                al, acc = c
                e, v = inp2
                nx = (al @ a) * e.astype(al.dtype)
                s = jnp.sum(nx, axis=1, keepdims=True)
                nx = nx / s
                al = jnp.where(v, nx, al)
                acc = acc + jnp.where(v, jnp.log(s[:, 0]), 0.0)
                return (al, acc), None

            (al, acc), _ = lax.scan(step, (al, acc), (e_all, vm))
            return (al, acc), None

        (al, acc), _ = lax.scan(chunk_step, (al, jnp.log(s0[:, 0])), (chunks, vmask))
        return jnp.sum(acc)

    return fwd


def bench(fn, label, reps=3):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    a = np.asarray(rng.random((M, M)), np.float32)
    a /= a.sum(1, keepdims=True)
    a = jax.device_put(jnp.asarray(a), dev)
    pi = jax.device_put(jnp.ones((M,), jnp.float32) / M, dev)
    bfull = jax.device_put(
        jnp.asarray(rng.random((M, 625)) * 0.01 + 1e-4, jnp.float32), dev
    )
    bufs = [
        jax.device_put(
            jnp.asarray(rng.integers(0, 625, size=(N_W, T)), jnp.int32), dev
        )
        for _ in range(reps + 1)
    ]
    f = jax.jit(fn)
    t0 = time.time()
    v = float(f(a, bfull, pi, bufs[0]))
    compile_s = time.time() - t0
    times = []
    for i in range(1, reps + 1):
        t0 = time.time()
        float(f(a, bfull, pi, bufs[i]))
        times.append(time.time() - t0)
    dt = float(np.median(times))
    print(
        f"{label}: {N_W*T/dt/1e9:.3f} Gcol/s (median {dt*1e3:.1f} ms, "
        f"compile {compile_s:.1f} s, val {v:.6e})",
        flush=True,
    )


if __name__ == "__main__":
    specs = sys.argv[1:] or ["512:f32", "512:bf16", "1024:bf16"]
    for s in specs:
        tc, dt = s.split(":")
        edt = jnp.float32 if dt == "f32" else jnp.bfloat16
        bench(make_fwd(int(tc), edt), f"tc={tc} e={dt}")
