"""Chained-pipeline e2e test: optimize -> best_model.yaml -> viterbi +
posterior, plain and introgression.

The reference's documented workflow (reference README.md:30-40) feeds the
``best_model.yaml`` checkpoint written by ``itrails-optimize`` UNMODIFIED
as the config of the decode workflows.  This pins that contract end to end
on the multi-block synthetic MAF (3 alignment blocks): the decode CLIs
must consume the checkpoint byte-for-byte as written, and their outputs
must be coherent across every block.  Runs on the virtual 8-device CPU
mesh like the rest of the suite (conftest).
"""

import csv
import hashlib
import os

import numpy as np
import yaml

from tests.conftest import GOLDENS
from tests.test_int_workflows import _int_config
from tests.test_workflows import _optimize_config

MAF = os.path.join(GOLDENS, "synthetic.maf")


def _sha(path):
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


def _check_viterbi_csv(path, n_states, n_blocks):
    rows = list(csv.reader(open(path)))[1:]
    assert rows, "no viterbi segments"
    seen = {}
    for r in rows:
        b, s, e, st = int(r[0]), int(r[1]), int(r[2]), int(float(r[3]))
        assert 0 <= st < n_states
        assert s <= e
        seen.setdefault(b, []).append((s, e))
    assert set(seen) == set(range(n_blocks)), (
        f"blocks decoded {sorted(seen)} != expected {n_blocks}"
    )
    for b, segs in seen.items():
        segs.sort()
        # segments tile the block contiguously from position 0
        assert segs[0][0] == 0
        for (s0, e0), (s1, e1) in zip(segs, segs[1:]):
            assert s1 == e0 + 1, f"gap in block {b}: {e0} -> {s1}"


def _check_posterior_csv(path, n_states, n_blocks):
    rows = list(csv.reader(open(path)))
    assert len(rows[0]) == 2 + n_states
    blocks = sorted({int(r[0]) for r in rows[1:]})
    assert blocks == list(range(n_blocks))
    probs = np.array([[float(x) for x in r[2:]] for r in rows[1:]])
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-6)


def test_chained_optimize_then_decode_plain(tmp_path):
    from itrails_tpu.cli.optimize import main as optimize_main
    from itrails_tpu.cli.posterior import main as posterior_main
    from itrails_tpu.cli.viterbi import main as viterbi_main

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_optimize_config(tmp_path), f)
    out = tmp_path / "run" / "chain"
    optimize_main([str(cfg_path), "--output", str(out), "--maxiter", "3"])

    best = tmp_path / "run" / "chain.best_model.yaml"
    assert best.exists()
    checkpoint = yaml.safe_load(open(best))
    assert np.isfinite(checkpoint["results"]["log_likelihood"])
    digest = _sha(best)

    # the checkpoint IS the decode config — no editing allowed
    vout = tmp_path / "v" / "chain"
    viterbi_main([str(best), "--output", str(vout)])
    pout = tmp_path / "p" / "chain"
    posterior_main([str(best), "--output", str(pout)])
    assert _sha(best) == digest, "decode modified the checkpoint"

    n_states = 1 * 2 + 3 * 2 + 3 * 1  # M at 1x2
    hidden = list(csv.reader(open(tmp_path / "v" / "chain.hidden_states.csv")))
    assert len(hidden) - 1 == n_states
    _check_viterbi_csv(tmp_path / "v" / "chain.viterbi.csv", n_states, 2)
    _check_posterior_csv(tmp_path / "p" / "chain.posterior.csv", n_states, 2)


def test_chained_optimize_then_decode_introgression(tmp_path):
    from itrails_tpu.cli.int_optimize import main as optimize_main
    from itrails_tpu.cli.int_posterior import main as posterior_main
    from itrails_tpu.cli.int_viterbi import main as viterbi_main

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_int_config(optimize=True), f)
    out = tmp_path / "run" / "chain"
    optimize_main([str(cfg_path), "--output", str(out), "--maxiter", "2"])

    best = tmp_path / "run" / "chain_best_model.yaml"
    assert best.exists()
    digest = _sha(best)

    vout = tmp_path / "v" / "chain"
    viterbi_main([str(best), "--output", str(vout)])
    pout = tmp_path / "p" / "chain"
    posterior_main([str(best), "--output", str(pout)])
    assert _sha(best) == digest, "decode modified the checkpoint"

    # introgression at 1x2 adds n_AB*n_ABC V4 states: M = 2*1*2 + 3*2 + 3*1
    n_states = 2 * (1 * 2) + 3 * 2 + 3 * 1
    _check_viterbi_csv(tmp_path / "v" / "chain.viterbi.csv", n_states, 2)
    _check_posterior_csv(tmp_path / "p" / "chain.posterior.csv", n_states, 2)
