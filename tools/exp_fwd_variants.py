"""Experiment: isolate per-step costs of the forward decode.

Variants:
  log      — current log-space forward (max-shift LSE)
  scaled   — Rabiner-scaled linear-space forward (log only on (W,) per step)
  nogather — scaled, emission replaced by a constant row (isolates gather)
  noexp    — log-space without exp/log (WRONG numerics; isolates transcendentals)
  bf16     — scaled with bf16 matmul
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

M = 27
N_W, T = 4096, 8192


def _gather(bfull_t, tok):
    return bfull_t[tok]


def fwd_log(a, bfull, pi, tokens):
    bt = bfull.T
    alpha0 = jnp.log(pi[None, :] * _gather(bt, tokens[:, 0]))

    def step(alpha, tok):
        x = jnp.max(alpha, axis=1, keepdims=True)
        e = _gather(bt, tok)
        new = jnp.log((jnp.exp(alpha - x) @ a) * e) + x
        return new, None

    alpha, _ = lax.scan(step, alpha0, tokens[:, 1:].T)
    x = jnp.max(alpha, axis=1)
    return jnp.sum(jnp.log(jnp.sum(jnp.exp(alpha - x[:, None]), axis=1)) + x)


def fwd_scaled(a, bfull, pi, tokens):
    bt = bfull.T
    al = pi[None, :] * _gather(bt, tokens[:, 0])
    s0 = jnp.sum(al, axis=1, keepdims=True)
    al = al / s0

    def step(carry, tok):
        al, acc = carry
        e = _gather(bt, tok)
        nx = (al @ a) * e
        s = jnp.sum(nx, axis=1, keepdims=True)
        return (nx / s, acc + jnp.log(s[:, 0])), None

    (al, acc), _ = lax.scan(step, (al, jnp.log(s0[:, 0])), tokens[:, 1:].T)
    return jnp.sum(acc)


def fwd_nogather(a, bfull, pi, tokens):
    bt = bfull.T
    row = bt[0]
    al = jnp.broadcast_to(pi[None, :] * row[None, :], (tokens.shape[0], M))
    s0 = jnp.sum(al, axis=1, keepdims=True)
    al = al / s0

    def step(carry, tok):
        al, acc = carry
        e = row[None, :] * (1.0 + 1e-9 * tok[:, None].astype(al.dtype))
        nx = (al @ a) * e
        s = jnp.sum(nx, axis=1, keepdims=True)
        return (nx / s, acc + jnp.log(s[:, 0])), None

    (al, acc), _ = lax.scan(step, (al, jnp.log(s0[:, 0])), tokens[:, 1:].T)
    return jnp.sum(acc)


def fwd_noexp(a, bfull, pi, tokens):
    bt = bfull.T
    alpha0 = pi[None, :] * _gather(bt, tokens[:, 0])

    def step(alpha, tok):
        x = jnp.max(alpha, axis=1, keepdims=True)
        e = _gather(bt, tok)
        new = ((alpha - x) @ a) * e + x
        return new, None

    alpha, _ = lax.scan(step, alpha0, tokens[:, 1:].T)
    return jnp.sum(alpha)


def fwd_bf16(a, bfull, pi, tokens):
    bt = bfull.T
    a16 = a.astype(jnp.bfloat16)
    al = pi[None, :] * _gather(bt, tokens[:, 0])
    s0 = jnp.sum(al, axis=1, keepdims=True)
    al = al / s0

    def step(carry, tok):
        al, acc = carry
        e = _gather(bt, tok)
        nx = (al.astype(jnp.bfloat16) @ a16).astype(jnp.float32) * e
        s = jnp.sum(nx, axis=1, keepdims=True)
        return (nx / s, acc + jnp.log(s[:, 0])), None

    (al, acc), _ = lax.scan(step, (al, jnp.log(s0[:, 0])), tokens[:, 1:].T)
    return jnp.sum(acc)


VARIANTS = {
    "log": fwd_log,
    "scaled": fwd_scaled,
    "nogather": fwd_nogather,
    "noexp": fwd_noexp,
    "bf16": fwd_bf16,
}


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
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        bench(VARIANTS[n], n)
