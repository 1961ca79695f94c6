"""Experiment: precision x layout of the long-block operator path on TPU.

The production sequence-parallel loglik (longseq.forward_loglik_long) runs
its (C, M, M) @ (M, M) operator matmuls at DEFAULT precision — on the MXU
that truncates f32 operands to bf16 (one pass).  The per-window value
kernels were fixed to HIGHEST in round 2 (loglik err 1e-4 -> 2e-7); the
long path was not.  This measures, on the real chip:

  * loglik error vs a CPU f64 sequential forward (ground truth), and
  * throughput (Mcol/s),

for precision DEFAULT / HIGH (3-pass bf16) / HIGHEST (6-pass f32) and for
two matmul layouts:
  batched  — g (C, M, M) @ a (M, M)   (production today)
  flat     — g.reshape(C*M, M) @ a    (one big 2-D matmul)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_longprec.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from itrails_tpu.data.tokens import PAD_TOKEN

M = 27
T = 4_194_304  # 4 Mcol block
CHUNK = 256


def make_model(rng, m=M, k=625):
    a = np.abs(rng.standard_normal((m, m))) + 0.1
    a = (a / a.sum(1, keepdims=True)).astype(np.float64)
    b = np.abs(rng.standard_normal((m, k))) + 0.1
    b = (b / b.sum(1, keepdims=True)).astype(np.float64)
    pi = np.full((m,), 1.0 / m)
    return a, b, pi


def loglik_long(a, bfull, pi, tokens, chunk, flat: bool):
    """forward_loglik_long with a switchable matmul layout (f32 math; the
    surrounding jit is wrapped in a default_matmul_precision context)."""
    m = a.shape[0]
    t_len = tokens.shape[0]
    padded = ((t_len - 1 + chunk - 1) // chunk) * chunk
    first = tokens[0]
    rest = jnp.concatenate(
        [tokens[1:], jnp.full((padded - (t_len - 1),), PAD_TOKEN, tokens.dtype)]
    )
    c = padded // chunk
    tok = rest.reshape(c, chunk)

    def mat(g):
        if flat:
            return (g.reshape(c * m, m) @ a).reshape(c, m, m)
        return g @ a

    def step(carry, t_col):
        g, logz = carry
        e = bfull.T[jnp.maximum(t_col, 0)]
        new = mat(g) * e[:, None, :]
        z = jnp.max(new, axis=(1, 2), keepdims=True)
        z = jnp.maximum(z, jnp.finfo(new.dtype).tiny)
        new = new / z
        valid = (t_col != PAD_TOKEN)[:, None, None]
        g = jnp.where(valid, new, g)
        logz = logz + jnp.where(valid[:, 0, 0], jnp.log(z[:, 0, 0]), 0.0)
        return (g, logz), None

    g0 = jnp.broadcast_to(jnp.eye(m, dtype=a.dtype), (c, m, m))
    (g, logz), _ = lax.scan(step, (g0, jnp.zeros((c,), a.dtype)), tok.T)

    def comb(l, r):
        gl, zl = l
        gr, zr = r
        gg = gl @ gr
        z = jnp.maximum(jnp.max(gg, axis=(-2, -1), keepdims=True),
                        jnp.finfo(gg.dtype).tiny)
        return gg / z, zl + zr + jnp.log(z[..., 0, 0])

    g_all, z_all = lax.associative_scan(comb, (g, logz))
    alpha0 = pi * bfull.T[jnp.maximum(first, 0)]
    return jnp.log(jnp.sum(alpha0 @ g_all[-1])) + z_all[-1]


def main():
    rng = np.random.default_rng(7)
    a64, b64, pi64 = make_model(rng)
    toks_np = rng.integers(0, 625, size=(T,)).astype(np.int32)

    # ground truth: f64 sequential scaled forward on CPU
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        a_c = jnp.asarray(a64, jnp.float64)
        b_c = jnp.asarray(b64, jnp.float64)
        pi_c = jnp.asarray(pi64, jnp.float64)
        tok_c = jnp.asarray(toks_np)

        @jax.jit
        def fwd64(a, bt, pi, tokens):
            al = pi * bt[tokens[0]]
            s0 = jnp.sum(al)

            def stp(carry, t):
                al, acc = carry
                nx = (al @ a) * bt[t]
                s = jnp.sum(nx)
                return (nx / s, acc + jnp.log(s)), None

            (al, acc), _ = lax.scan(stp, (al / s0, jnp.log(s0)), tokens[1:])
            return acc

        t0 = time.time()
        ll64 = float(fwd64(a_c, b_c.T, pi_c, tok_c))
        print(f"CPU f64 truth: {ll64:.8f}  ({time.time()-t0:.1f}s)")

    dev = jax.devices()[0]
    a = jax.device_put(jnp.asarray(a64, jnp.float32), dev)
    b = jax.device_put(jnp.asarray(b64, jnp.float32), dev)
    pi = jax.device_put(jnp.asarray(pi64, jnp.float32), dev)
    bufs = [jax.device_put(jnp.asarray(toks_np), dev) for _ in range(4)]

    import functools
    for prec in ("default", "high", "highest"):
        for flat in (False, True):
            fn = jax.jit(functools.partial(
                loglik_long, chunk=CHUNK, flat=flat))
            with jax.default_matmul_precision(prec):
                try:
                    ll = float(fn(a, b, pi, bufs[0]))
                    ts = []
                    for buf in bufs[1:]:
                        t0 = time.time()
                        float(fn(a, b, pi, buf))
                        ts.append(time.time() - t0)
                    dt = float(np.median(ts))
                    print(f"{prec:8s} {'flat' if flat else 'batched':8s} "
                          f"{T/dt/1e6:7.1f} Mcol/s   "
                          f"err {abs(ll-ll64)/abs(ll64):.2e} "
                          f"(abs {abs(ll-ll64):.4f})")
                except Exception as e:
                    print(f"{prec} flat={flat}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
