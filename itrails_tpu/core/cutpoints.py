"""Time discretization of the coalescent epochs (reference cutpoints.py).

Interval cutpoints are quantiles of the coalescence-time distribution:
truncated exponential on [0, t_AB] for the two-sequence epoch, exponential
for the three-sequence epoch.  Implemented in closed form (no scipy) so they
trace inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cutpoints_ab", "cutpoints_abc"]


def cutpoints_ab(n_int_AB: int, t_AB, coal_AB, dtype=jnp.float64):
    """Quantiles i/n of a rate-``coal_AB`` exponential truncated to
    [0, t_AB] (reference cutpoints.py:5-28).  Shape (n_int_AB + 1,);
    first entry 0, last exactly t_AB."""
    q = jnp.arange(n_int_AB + 1, dtype=dtype) / n_int_AB
    # -expm1 keeps the truncation mass below 1.0 in f64; with the naive
    # 1 - exp(-a) form, coal*t > ~36.7 rounds the mass to exactly 1 and
    # the last cutpoint overflows to inf (observed mid-optimization at an
    # N_AB bound corner — reference scipy truncexpon.ppf is exact there)
    mass = -jnp.expm1(-coal_AB * t_AB)
    cut = -jnp.log1p(-q * mass) / coal_AB
    # quantile 1 of the truncated distribution IS the truncation point
    return cut.at[-1].set(jnp.asarray(t_AB, dtype))


def cutpoints_abc(n_int_ABC: int, coal_ABC, dtype=jnp.float64):
    """Quantiles i/n of a rate-``coal_ABC`` exponential (reference
    cutpoints.py:29-45).  Shape (n_int_ABC + 1,).  The reference's last
    entry is +inf (the unbounded deepest interval); here it is returned as
    0.0 — every consumer treats the final interval analytically and never
    reads it, and a finite placeholder keeps NaNs out of jit graphs."""
    q = jnp.arange(n_int_ABC + 1, dtype=dtype) / n_int_ABC
    cut = -jnp.log1p(-q) / coal_ABC
    return cut.at[-1].set(0.0)
