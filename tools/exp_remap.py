"""Probe: cost of the token -> bit-code remap gather on TPU.

Hypothesis: `codes[tokens]` over a (W, T) int32 batch is an XLA gather
that runs at ~1 element/cycle on TPU (~35 ms for 33M tokens) and explains
the multihot forward's measured slowdown entirely (the kernel itself does
2.5x less MXU work).  If confirmed, the remap moves to batch-preparation
time (host numpy, amortized over all optimizer evals).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from itrails_tpu.data.tokens import token_bit_codes
from itrails_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(token_bit_codes())
    bufs = [jnp.asarray(rng.integers(0, 625, size=(4096, 8192)), jnp.int32)
            for _ in range(4)]

    @jax.jit
    def remap(t):
        return jnp.where(t < 0, t, codes[jnp.maximum(t, 0)]).sum()

    np.asarray(remap(bufs[0]))
    ts = []
    for b in bufs[1:]:
        t0 = time.perf_counter()
        np.asarray(remap(b))
        ts.append(time.perf_counter() - t0)
    n = bufs[0].size
    dt = min(ts)
    print(f"remap gather: {dt*1e3:.1f} ms for {n/1e6:.1f}M tokens "
          f"({n/dt/1e6:.0f} Mtok/s)")


if __name__ == "__main__":
    main()
