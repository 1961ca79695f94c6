"""Round-3 experiment: Viterbi + posterior throughput at M=27/133 on the
real TPU (fresh buffers per rep; np.asarray materialization — axon
gotchas).  Compares the current production kernels; flip
pallas_viterbi._VO_UNROLL2D to A/B the large-M max-plus variants."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import pallas_fwd, pallas_viterbi
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


def bench(fn, model_args, tok_bufs, reduce):
    out = np.asarray(reduce(fn(*model_args, tok_bufs[0])))
    ts = []
    for tok in tok_bufs[1:]:
        t0 = time.perf_counter()
        np.asarray(reduce(fn(*model_args, tok)))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    rng = np.random.default_rng(1)
    print("VO_UNROLL2D =", pallas_viterbi._VO_UNROLL2D)
    cases = [
        ("m133_vit", 133, 1024, 8192,
         lambda a, b, p, t: pallas_viterbi.viterbi_fused(a, b, p, t),
         lambda r: r[:, -1].astype(jnp.int32).sum()),
        ("m27_vit", 27, 2048, 8192,
         lambda a, b, p, t: pallas_viterbi.viterbi_fused(a, b, p, t),
         lambda r: r[:, -1].astype(jnp.int32).sum()),
        ("m133_post", 133, 512, 4096,
         lambda a, b, p, t: pallas_fwd.posterior_fused(
             a, b, p, t, table_parts=2, trans="split3"),
         lambda r: r[-1].sum()),
        ("m27_post", 27, 1024, 8192,
         lambda a, b, p, t: pallas_fwd.posterior_fused(
             a, b, p, t, table_parts=2, trans="split3"),
         lambda r: r[-1].sum()),
    ]
    for name, m, w, t, fn, red in cases:
        a, bfull, pi = model(m)
        bufs = [jnp.asarray(rng.integers(0, 625, size=(w, t)), jnp.int32)
                for _ in range(4)]
        g = jax.jit(fn)
        try:
            dt, _ = bench(g, (a, bfull, pi), bufs, red)
            print(f"{name}: {w*t/dt/1e6:8.1f} Mcol/s  (W={w}, T={t})")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
