"""Linear solves that work in float64 on TPU.

XLA:TPU emulates f64 matmuls but implements LU factorization only for
f32/c64, so ``jnp.linalg.solve`` fails for f64 operands on the accelerator.
For well-conditioned systems (all of ours: Pade denominators and
absorbing-trimmed rate matrices) an f32 factorization plus a few f64
iterative-refinement steps recovers near-f64 accuracy:

    X_0 = f32_solve(A, B);  repeat: R = B - A X_k (f64);  X_{k+1} = X_k +
    f32_solve(A, R)

Each refinement step multiplies the error by ~cond(A) * eps_f32, so three
steps reach eps_f64 for cond(A) up to ~1e5.  On CPU the native f64 solve is
used directly.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

__all__ = ["solve", "native_solves"]

_REFINE_STEPS = 3

# jax.default_backend() ignores jax.default_device contexts, so callers that
# place a computation on the host CPU inside a TPU-default process set this
# trace-time flag instead (see core.model.build_model_fn).
_NATIVE = contextvars.ContextVar("itrails_native_solves", default=None)


@contextlib.contextmanager
def native_solves(enabled: bool = True):
    token = _NATIVE.set(enabled)
    try:
        yield
    finally:
        _NATIVE.reset(token)


def solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``solve(a, b)`` with f64 accuracy on every backend."""
    native = _NATIVE.get()
    if native is None:
        native = jax.default_backend() == "cpu"
    if a.dtype != jnp.float64 or native:
        return jnp.linalg.solve(a, b)
    a32 = a.astype(jnp.float32)
    lu, piv = jax.scipy.linalg.lu_factor(a32)

    def f32_solve(rhs):
        return jax.scipy.linalg.lu_solve((lu, piv), rhs.astype(jnp.float32)).astype(
            jnp.float64
        )

    x = f32_solve(b)
    for _ in range(_REFINE_STEPS):
        r = b - a @ x
        x = x + f32_solve(r)
    return x
