"""Benchmark the fused Pallas forward kernel on TPU vs the XLA scan."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from itrails_tpu.hmm import decoders, pallas_fwd

M = int(sys.argv[1]) if len(sys.argv) > 1 else 27
N_W, T = 4096, 8192


def bench(fn, label, args, reps=3):
    f = jax.jit(fn)
    t0 = time.time()
    v = float(f(*args[0]))
    compile_s = time.time() - t0
    times = []
    for i in range(1, reps + 1):
        t0 = time.time()
        float(f(*args[i]))
        times.append(time.time() - t0)
    dt = float(np.median(times))
    print(
        f"{label}: {N_W*T/dt/1e9:.3f} Gcol/s (median {dt*1e3:.1f} ms, "
        f"compile {compile_s:.1f} s, val {v:.8e})",
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    a = np.asarray(rng.random((M, M)), np.float32)
    a /= a.sum(1, keepdims=True)
    a = jax.device_put(jnp.asarray(a), dev)
    pi = jax.device_put(jnp.ones((M,), jnp.float32) / M, dev)
    bfull = jax.device_put(
        jnp.asarray(rng.random((M, 625)) * 0.01 + 1e-4, jnp.float32), dev
    )
    reps = 3
    bufs = [
        jax.device_put(
            jnp.asarray(rng.integers(0, 625, size=(N_W, T)), jnp.int32), dev
        )
        for _ in range(reps + 1)
    ]
    args = [(a, bfull, pi, b) for b in bufs]
    import functools
    for bw, tc in [(4096, 64), (4096, 128), (4096, 256)]:
        bench(
            functools.partial(
                pallas_fwd.forward_loglik_fused, block_w=bw, chunk_t=tc
            ),
            f"pallas M={M} bw={bw} tc={tc}", args,
        )


if __name__ == "__main__":
    main()
