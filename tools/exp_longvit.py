"""Chromosome-scale segmented Viterbi end-to-end timing (VERDICT round-2
item 5 done-criterion): decode a ~1e8-column block with bounded memory and
report the wall-clock split between device compute and the host backtrack
walk (native C, native/backtrack.cpp).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_longvit.py [T] [M]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from itrails_tpu.data.tokens import aggregation_matrix  # noqa: E402
from itrails_tpu.hmm import longseq  # noqa: E402
from itrails_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    rng = np.random.default_rng(0)
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    b = rng.random((m, 256)) * 0.01 + 1e-4
    bfull = jnp.asarray(b @ aggregation_matrix().T, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    pi = jnp.asarray(rng.dirichlet(np.ones(m)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 625, size=t_len), jnp.int32)

    walk_s = [0.0]
    orig_walk = longseq._backtrack_walk

    def timed_walk(ptrs, state):
        t0 = time.perf_counter()
        out = orig_walk(ptrs, state)
        walk_s[0] += time.perf_counter() - t0
        return out

    longseq._backtrack_walk = timed_walk
    t0 = time.perf_counter()
    path = longseq.viterbi_segmented(a, bfull, pi, tokens)
    total = time.perf_counter() - t0
    longseq._backtrack_walk = orig_walk
    print(f"T={t_len:,} M={m}: total {total:.1f}s "
          f"({t_len/total/1e6:.1f} Mcol/s), backtrack walk {walk_s[0]:.1f}s "
          f"({100*walk_s[0]/total:.1f}% of wall), "
          f"path head {np.asarray(path[:5])}")


if __name__ == "__main__":
    main()
