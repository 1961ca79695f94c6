"""Dense-grid parity of the JC69 closed-form coalescence integrals."""

import numpy as np

from itrails_tpu.core.emissions import _double_integrand, _single_integrand
from tests.conftest import load_golden


def _eq(x, y):
    return 0.75 if x == y else -0.25


def test_single_integrand_grid():
    g = load_golden("integrands.npz")
    for ni, (a, b, c, d) in enumerate(g["nucs"]):
        alpha = _eq(a, d)
        beta = _eq(d, b)
        gamma = _eq(d, c)
        for ti, t in enumerate(g["ts"]):
            for mi, mu in enumerate(g["mus"]):
                for ki, k in enumerate(g["ks"]):
                    mine = float(_single_integrand(alpha, beta, gamma, t, mu, k))
                    np.testing.assert_allclose(
                        mine, g["single"][ni, ti, mi, ki], rtol=1e-11, atol=1e-13,
                        err_msg=f"nucs={a}{b}{c}{d} t={t} mu={mu} k={k}",
                    )


def test_double_integrand_grid():
    g = load_golden("integrands.npz")
    for ni, (a, b, c, d, e, f) in enumerate(g["nucs6"]):
        al = _eq(a, e)
        be = _eq(e, b)
        ga = _eq(e, f)
        de = _eq(f, c)
        ep = _eq(f, d)
        for ti, t in enumerate(g["ts"]):
            for mi, mu in enumerate(g["mus"]):
                mine = float(_double_integrand(al, be, ga, de, ep, t, mu))
                np.testing.assert_allclose(
                    mine, g["double"][ni, ti, mi], rtol=1e-10, atol=1e-13,
                    err_msg=f"nucs={a}{b}{c}{d}{e}{f} t={t} mu={mu}",
                )
