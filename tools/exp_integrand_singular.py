"""Experiment: emission-integrand accuracy at the removable singularities
(VERDICT r4 item 5).

The JC69 closed forms divide by (mu - k) (single integrand; reference
get_emission_prob_mat.py:47-92) and by (mu-1)/(mu-2)/(mu-3)-family factors
(double integrand; reference :120-397).  The singular points are removable
— the integrals they represent are smooth — but f64 evaluation cancels
catastrophically nearby, and the reference inherits the identical cliff.

Oracle: the SAME algebra evaluated under an mpmath shim at 60 significant
digits (the cancellation is precision-limited, not formula-limited, so
high precision recovers the true value to ~1e-45 even at |k-mu| = 1e-12).

Measured (this machine, f64):

  single integrand, naive reference form (gamma/(mu-k) + gamma/(k-mu)):
      rel err grows ~eps/(|k/mu-1|): 1.5e-9 at 1e-6, 3.6e-7 at 1e-8,
      4.2e-6 at 1e-10, division by zero (inf) at k == mu exactly
  single integrand, restructured divided-difference form (emissions.py):
      rel err <= 2e-16 for ALL k/mu ratios including k == mu exactly
  double integrand near mu = 2 (guard disabled):
      2.0e-8 at delta = 1e-5, 2.2e-5 at 1e-6, 5.7e-3 at 1e-7, nan at 0
      (mu = 1 and mu = 3 are far milder: <= 3e-9 down to delta = 1e-7)
  double integrand WITH _MU_GUARD = 1e-5:
      rel err vs the TRUE (un-nudged) value <= ~2e-11 everywhere,
      including mu = 1, 2, 3 exactly — the integrand is nearly flat
      across the removable point, so the nudge is effectively free.

Run:  python tools/exp_integrand_singular.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
from mpmath import mp  # noqa: E402

from itrails_tpu.core import emissions  # noqa: E402

mp.dps = 60


class MPX:
    """Scalar mpmath shim for the integrands' ``xp`` module argument."""

    exp = staticmethod(mp.exp)
    expm1 = staticmethod(mp.expm1)

    @staticmethod
    def where(c, a, b):
        return a if c else b

    @staticmethod
    def abs(x):
        return abs(x)


def naive_single(alpha, beta, gamma, t, mu, k, xp=np):
    """The reference's formulation verbatim (get_emission_prob_mat.py:47-92)
    — kept here to document the cliff the restructured form removes."""
    ekt = xp.exp(k * t)
    emt = xp.exp(mu * t)
    return (
        k
        * (
            ((-1.0 + ekt) * (emt + 16.0 * (alpha + beta) * gamma))
            / (ekt * emt * k)
            + 4.0
            * (
                gamma / (ekt * (mu - k))
                + (alpha + beta) / (k + mu)
                - (alpha + beta) / (ekt * emt * (k + mu))
                + (4.0 * alpha * beta) / (k + 2.0 * mu)
                + (gamma * (1.0 / (k - mu)
                            + (16.0 * alpha * beta) / (k + mu))) / emt
                + (4.0 * alpha * beta
                   * ((-4.0 * gamma) / (k + mu) - 1.0 / (k + 2.0 * mu)))
                / (ekt * emt * emt)
            )
        )
    ) / (64.0 * (1.0 - 1.0 / ekt))


def rel(a, b):
    return float(abs((mp.mpf(a) - b) / b)) if b != 0 else float(abs(a - b))


def main():
    two = [0.25, -0.25 / 3.0]  # the +-binary coefficient values (_TWO)
    print("=== single integrand near k == mu "
          "(alpha=beta=gamma=0.25, t=0.8, mu=0.01) ===")
    t, mu = 0.8, 0.01
    print(f"{'k/mu-1':>10} {'naive relerr':>14} {'stable relerr':>14}")
    for d in (1e-2, 1e-4, 1e-6, 1e-8, 1e-10, 0.0):
        k = mu * (1.0 + d)
        a = b = g = two[0]
        oracle = emissions._single_integrand(
            mp.mpf(a), mp.mpf(b), mp.mpf(g), mp.mpf(t), mp.mpf(mu),
            mp.mpf(mu) * (1 + mp.mpf(d)), xp=MPX)
        stable = float(emissions._single_integrand(a, b, g, t, mu, k))
        try:
            nv = naive_single(a, b, g, t, mu, k)
            nv_err = rel(nv, oracle) if np.isfinite(nv) else float("inf")
        except ZeroDivisionError:
            nv_err = float("inf")
        print(f"{d:>10.0e} {nv_err:>14.2e} {rel(stable, oracle):>14.2e}")

    print("\n=== double integrand near mu = s, guard DISABLED "
          "(t=0.8) ===")
    saved = emissions._MU_GUARD
    emissions._MU_GUARD = 0.0
    try:
        for s in (1.0, 2.0, 3.0):
            print(f"-- singular point mu = {s}")
            print(f"{'mu-s':>10} {'f64 relerr':>12}")
            for d in (1e-2, 1e-3, 1e-4, 1e-5, 3e-6, 1e-6, 1e-7):
                mu2 = s + d
                args = [two[0], two[1], two[0], two[1], two[0]]
                oracle = emissions._double_integrand(
                    *[mp.mpf(x) for x in args], mp.mpf(0.8),
                    mp.mpf(s) + mp.mpf(d), xp=MPX)
                got = float(emissions._double_integrand(*args, 0.8, mu2))
                print(f"{d:>10.0e} {rel(got, oracle):>12.2e}")
    finally:
        emissions._MU_GUARD = saved

    print(f"\n=== double integrand WITH guard (_MU_GUARD={saved}) ===")
    print(f"{'mu':>14} {'f64 relerr vs true':>18}")
    for mu2 in (2.0, 2.0 + 1e-7, 2.0 - 1e-6, 1.0, 3.0, 2.0 + 1e-3):
        args = [two[0], two[1], two[0], two[1], two[0]]
        # oracle at the TRUE mu (offset to 1e-12 at the exact point, where
        # the removable limit is approached far closer than the guard)
        m_or = mp.mpf(mu2)
        if m_or in (1, 2, 3):
            m_or = m_or + mp.mpf("1e-12")
        oracle = emissions._double_integrand(
            *[mp.mpf(x) for x in args], mp.mpf(0.8), m_or, xp=MPX)
        got = float(emissions._double_integrand(*args, 0.8, mu2))
        print(f"{mu2:>14.9f} {rel(got, oracle):>18.2e}")


if __name__ == "__main__":
    main()
