import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled so numerics
# can be pinned tightly against the reference goldens.  TPU benchmarking is
# exercised separately by bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Tests must exercise the real build, never a cached artifact from an
# earlier (possibly stale) code state; individual cache tests re-enable it
# via monkeypatch with a tmpdir ITRAILS_CACHE_DIR.
os.environ.setdefault("ITRAILS_NO_CACHE", "1")

import jax  # noqa: E402

# Something in this image pins JAX_PLATFORMS to the axon TPU plugin at
# interpreter startup; the config override below is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="session")
def goldens_dir():
    return GOLDENS


def load_golden(name):
    path = os.path.join(GOLDENS, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not generated (run tools/make_goldens.py)")
    return np.load(path, allow_pickle=False)
