"""Measure long-block loglik throughput: current operator path vs the
window-batch kernel, on the real TPU.  Dev experiment for round 2 item 1."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from itrails_tpu.core.model import build_model
from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import decoders, longseq


def timeit(f, n=3):
    f()  # compile
    jax.block_until_ready(f())
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    model = build_model(
        t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004, t_upper=0.00745069,
        t_out=0.009312, N_AB=0.0005, N_ABC=0.0005, r=1.0,
        n_int_AB=3, n_int_ABC=3, dtype="float64", device="cpu",
    )
    cast = jnp.float32
    a = jnp.asarray(model.a, cast)
    pi = jnp.asarray(model.pi, cast)
    bfull = decoders.emission_table(
        jnp.asarray(model.b, cast), jnp.asarray(aggregation_matrix(), cast)
    )
    dev = jax.devices()[0]
    a, pi, bfull = jax.device_put((a, pi, bfull), dev)

    rng = np.random.default_rng(0)
    t_len = 10_000_000
    tok = jnp.asarray(rng.integers(0, 625, t_len, dtype=np.int32))
    tok = jax.device_put(tok, dev)

    for chunk in (256, 1024, 4096):
        f = jax.jit(lambda tk, c=chunk: longseq.forward_loglik_long(
            a, bfull, pi, tk, chunk=c))
        dt = timeit(lambda: f(tok))
        print(f"longseq chunk={chunk}: {t_len/dt/1e6:.1f} Mcol/s "
              f"({dt*1e3:.0f} ms)  ll={float(f(tok)):.2f}")

    # window-batch comparison: same columns as (W, T) windows
    w, t = 1024, t_len // 1024
    tokw = tok[: w * t].reshape(w, t)
    g = jax.jit(lambda tk: decoders.forward_loglik_fast(a, bfull, pi, tk))
    dt = timeit(lambda: g(tokw))
    print(f"window kernel (W={w},T={t}): {w*t/dt/1e6:.1f} Mcol/s ({dt*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
