"""Round-3 experiment: decompose posterior_fused's cost — plain forward
vs forward-with-alpha-store vs full posterior — to locate the loss vs the
352 Mcol/s pair-ceiling implied by the plain forward's MXU rate."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import pallas_fwd
from itrails_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def bench(fn, args, bufs):
    np.asarray(fn(*args, bufs[0]))
    ts = []
    for tok in bufs[1:]:
        t0 = time.perf_counter()
        np.asarray(fn(*args, tok))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(1)
    m, w, t = 27, 1024, 8192
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    b = rng.random((m, 256)) * 0.01 + 1e-4
    bfull = np.asarray(b @ aggregation_matrix().T)
    pi = rng.random(m)
    pi /= pi.sum()
    a, bfull, pi = (jnp.asarray(x, jnp.float32) for x in (a, bfull, pi))
    bufs = [jnp.asarray(rng.integers(0, 625, size=(w, t)), jnp.int32)
            for _ in range(4)]
    cols = w * t

    fwd = jax.jit(functools.partial(
        pallas_fwd.forward_loglik_fused, table_parts=2, trans="split3",
        block_w=1024,
    ))
    print(f"fwd plain      : {cols / bench(fwd, (a, bfull, pi), bufs) / 1e6:7.1f} Mcol/s")

    fwd_store = jax.jit(functools.partial(
        pallas_fwd.posterior_fused, table_parts=2, trans="split3",
        layout="fwdonly",
    ))
    print(f"fwd with store : {cols / bench(fwd_store, (a, bfull, pi), bufs) / 1e6:7.1f} Mcol/s")

    post = jax.jit(lambda a_, b_, p_, t_: pallas_fwd.posterior_fused(
        a_, b_, p_, t_, table_parts=2, trans="split3", layout="tmw",
    )[-1].sum())
    print(f"posterior tmw  : {cols / bench(post, (a, bfull, pi), bufs) / 1e6:7.1f} Mcol/s")


if __name__ == "__main__":
    main()
