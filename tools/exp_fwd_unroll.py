"""Experiment: forward-decode throughput vs lax.scan unroll factor."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from itrails_tpu.data.tokens import PAD_TOKEN

M = 27
N_W, T = 4096, 8192


def make_forward(unroll):
    def _gather_emis(bfull, tokens):
        safe = jnp.maximum(tokens, 0)
        e = bfull.T[safe]
        return jnp.where((tokens == PAD_TOKEN)[:, None], jnp.ones_like(e), e)

    def forward_loglik(a, bfull, pi, tokens):
        alpha0 = jnp.log(pi[None, :] * _gather_emis(bfull, tokens[:, 0]))

        def step(alpha, tok):
            x = jnp.max(alpha, axis=1, keepdims=True)
            e = _gather_emis(bfull, tok)
            new = jnp.log((jnp.exp(alpha - x) @ a) * e) + x
            new = jnp.where((tok == PAD_TOKEN)[:, None], alpha, new)
            return new, None

        alpha, _ = lax.scan(step, alpha0, tokens[:, 1:].T, unroll=unroll)
        x = jnp.max(alpha, axis=1)
        ll = jnp.log(jnp.sum(jnp.exp(alpha - x[:, None]), axis=1)) + x
        return jnp.sum(ll)

    return forward_loglik


def bench(fn, label, reps=3):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    a = jax.device_put(jnp.asarray(rng.random((M, M)) / M, jnp.float32), dev)
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
    float(f(a, bfull, pi, bufs[0]))
    compile_s = time.time() - t0
    times = []
    for i in range(1, reps + 1):
        t0 = time.time()
        float(f(a, bfull, pi, bufs[i]))
        times.append(time.time() - t0)
    dt = float(np.median(times))
    print(f"{label}: {N_W*T/dt/1e9:.3f} Gcol/s  (median {dt*1e3:.1f} ms, compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    for u in [int(x) for x in sys.argv[1:]] or [1, 8, 32]:
        bench(make_forward(u), f"unroll={u}")
