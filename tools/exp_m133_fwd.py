"""Round-3 experiment: M=133 forward throughput — multihot emission vs
onehot, on the real TPU.  Prints Mcol/s per variant and loglik deviation
vs the f64 scan decoder.

NEGATIVE RESULT (re-measured round 5): multihot loses decisively despite
its 2.5x MXU-FLOP saving (the one-hot emission matmul is ~76% of the
kernel's MXU work at M=133) — the kernels are instruction-ISSUE bound,
and the in-register multi-hot construction costs more VPU issue slots
than the larger one-hot matmul costs MXU time.  Measured (v5e, default
trans="highest"): M=133 onehot p2 173.4 vs multihot p2 85.9 Mcol/s;
M=27 onehot p2 665.7 vs multihot 121.5.  Production stays on onehot
(with trans="split3": 213 Mcol/s at M=133).  Together with the round-4/5
experiment set this closes the emission-lookup avenue.
"""

import functools
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
    """axon gotchas: block_until_ready lies (materialize with np.asarray)
    and identical calls are memoized (fresh token buffer per rep)."""
    out = np.asarray(fn(*model_args, tok_bufs[0]))  # compile + warm
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
            for _ in range(4)
        ]
        cols = w * t
        ll_ref = None
        for emission, parts in (("onehot", 3), ("multihot", 3),
                                ("onehot", 2), ("multihot", 2)):
            fn = jax.jit(functools.partial(
                pallas_fwd.forward_loglik_fused, emission=emission,
                table_parts=parts,
            ))
            dt, ll = bench(fn, (a, bfull, pi), tok_bufs)
            ll = float(np.asarray(ll))
            if ll_ref is None:
                ll_ref = ll
            print(f"M={m:3d} {emission:9s} p{parts}: {cols/dt/1e6:8.1f} "
                  f"Mcol/s  ll(buf0)={ll:.3f}  "
                  f"rel_dev={(ll-ll_ref)/abs(ll_ref):.2e}")


if __name__ == "__main__":
    main()
