"""MAF ingestion parity vs the reference parser."""

import os

import numpy as np

from itrails_tpu.data.maf import maf_reference_coordinates, maf_tokens
from tests.conftest import GOLDENS, load_golden

SPECIES = ["hg38", "panTro5", "gorGor5", "ponAbe2"]


def _maf_path():
    return os.path.join(GOLDENS, "synthetic.maf")


def test_tokens_match_reference():
    g = load_golden("maf.npz")
    blocks = maf_tokens(_maf_path(), SPECIES)
    assert len(blocks) == int(g["n_blocks"])
    for i, b in enumerate(blocks):
        np.testing.assert_array_equal(b, g[f"tokens_{i}"])


def test_coordinates_match_reference():
    g = load_golden("maf.npz")
    coords = maf_reference_coordinates(_maf_path(), SPECIES, "hg38")
    n = sum(1 for k in g.files if k.startswith("coords_"))
    assert len(coords) == n
    for i, c in enumerate(coords):
        np.testing.assert_array_equal(c, g[f"coords_{i}"])
