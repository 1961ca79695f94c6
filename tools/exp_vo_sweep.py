"""Round-3 experiment: sweep (block_w, VMEM block cap) for the M=133
value-only Viterbi to find where the pipeline stops being bubble-bound
(tc=8 time-chunks at bw=1024 leave most of each grid step in overhead).
Axon gotchas: fresh buffers per rep, np.asarray materialization."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import pallas_viterbi
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


def main():
    rng = np.random.default_rng(1)
    m, w, t = 133, 1024, 8192
    a, bfull, pi = model(m)
    tok_bufs = [
        jnp.asarray(rng.integers(0, 625, size=(w, t)), jnp.int32)
        for _ in range(4)
    ]
    cols = w * t
    path_ref = None
    for nostore, bw in ((False, 1024), (True, 1024), (True, 2048),
                        (True, 4096)):
        pallas_viterbi._VO_NOSTORE = nostore
        # reduce on device: a full (W, T) int32 path is ~32 MB and the
        # axon tunnel fetch would dominate the timing
        fn = jax.jit(lambda a_, b_, p_, t_, bw=bw:
                     pallas_viterbi.viterbi_fused(
                         a_, b_, p_, t_, block_w=bw
                     ).astype(jnp.int32).sum(1))
        try:
            out = np.asarray(fn(a, bfull, pi, tok_bufs[0]))
            ts = []
            for tok in tok_bufs[1:]:
                t0 = time.perf_counter()
                np.asarray(fn(a, bfull, pi, tok))
                ts.append(time.perf_counter() - t0)
            print(f"nostore={nostore} bw={bw:4d}: "
                  f"{cols / min(ts) / 1e6:7.1f} Mcol/s", flush=True)
        except Exception as e:
            print(f"nostore={nostore} bw={bw:4d}: error {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
