import numpy as np
import scipy.linalg

from itrails_tpu.core.expm import expm, expm_batch
from tests.conftest import load_golden


def test_expm_matches_reference_kernel():
    g = load_golden("expm.npz")
    mine = np.asarray(expm_batch(g["mats"]))
    np.testing.assert_allclose(mine, g["exps"], rtol=1e-9, atol=1e-12)


def test_expm_matches_scipy_across_scales():
    rng = np.random.default_rng(42)
    for scale in (1e-3, 1e-1, 1.0, 5.0, 50.0, 300.0):
        a = rng.standard_normal((17, 17)) * scale
        a = a - np.diag(a.sum(axis=1))
        np.testing.assert_allclose(
            np.asarray(expm(a)),
            scipy.linalg.expm(a),
            rtol=1e-8,
            atol=1e-10,
            err_msg=f"scale={scale}",
        )


def test_expm_batch_heterogeneous_norms():
    rng = np.random.default_rng(3)
    mats = np.stack(
        [rng.standard_normal((12, 12)) * s for s in (1e-4, 0.5, 20.0, 200.0)]
    )
    mine = np.asarray(expm_batch(mats))
    ref = np.stack([scipy.linalg.expm(m) for m in mats])
    np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-10)


def test_expm_zero_matrix():
    np.testing.assert_allclose(np.asarray(expm(np.zeros((5, 5)))), np.eye(5))
