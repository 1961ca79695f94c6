"""Round-3 experiment: forward throughput vs (table_parts, transition
precision) at M=133/27 on the real TPU.  The transition matmul at
Precision.HIGHEST is 6 bf16 MXU passes; HIGH is 3 — at M=133 that is
~30% of the kernel's MXU work.  Prints Mcol/s and loglik deviation vs
the f32 scan decoder (axon gotchas: fresh buffers, np.asarray)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import decoders, pallas_fwd
from itrails_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def model(m, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    b = rng.random((m, 256)) * 0.01 + 1e-4
    bfull = np.asarray(b @ aggregation_matrix().T)
    pi = rng.random(m)
    pi /= pi.sum()
    return (jnp.asarray(a, jnp.float32), jnp.asarray(bfull, jnp.float32),
            jnp.asarray(pi, jnp.float32))


def bench(fn, model_args, tok_bufs):
    out = np.asarray(fn(*model_args, tok_bufs[0]))
    ts = []
    for tok in tok_bufs[1:]:
        t0 = time.perf_counter()
        np.asarray(fn(*model_args, tok))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    rng = np.random.default_rng(1)
    for m, w, t in ((133, 2048, 8192), (27, 4096, 8192)):
        a, bfull, pi = model(m)
        tok_bufs = [
            jnp.asarray(rng.integers(0, 625, size=(w, t)), jnp.int32)
            for _ in range(5)
        ]
        cols = w * t
        ll_ref = None
        for parts in (3, 2):
            for trans in ("highest", "split3"):
                fn = jax.jit(functools.partial(
                    pallas_fwd.forward_loglik_fused, table_parts=parts,
                    trans=trans,
                ))
                dt, ll = bench(fn, (a, bfull, pi), tok_bufs)
                ll = float(np.asarray(ll))
                if ll_ref is None:
                    ll_ref = ll
                print(f"M={m:3d} p{parts} {trans:7s}:"
                      f" {cols / dt / 1e6:8.1f} Mcol/s"
                      f"  rel_dev={abs(ll - ll_ref) / abs(ll_ref):.2e}",
                      flush=True)


if __name__ == "__main__":
    main()
