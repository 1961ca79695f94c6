"""Checkpoint/resume behavior of the optimize workflow."""

import csv
import os

import numpy as np
import yaml

from tests.conftest import GOLDENS
from tests.test_workflows import _optimize_config


def test_optimize_resume_appends_and_restarts_from_best(tmp_path):
    from itrails_tpu.cli.optimize import main

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_optimize_config(tmp_path), f)
    out = tmp_path / "run" / "t"
    main([str(cfg_path), "--output", str(out), "--maxiter", "2"])
    hist_path = tmp_path / "run" / "t.optimization_history.csv"
    n_rows_first = len(list(csv.reader(open(hist_path))))
    best1 = yaml.safe_load(open(tmp_path / "run" / "t.best_model.yaml"))
    ll1 = best1["results"]["log_likelihood"]

    main([str(cfg_path), "--output", str(out), "--maxiter", "2", "--resume"])
    rows = list(csv.reader(open(hist_path)))
    assert len(rows) > n_rows_first  # appended, no second header
    assert sum(1 for r in rows if r[0] == "n_eval") == 1
    best2 = yaml.safe_load(open(tmp_path / "run" / "t.best_model.yaml"))
    assert best2["results"]["log_likelihood"] >= ll1


def test_optimizer_state_checkpoint_written_and_preferred(tmp_path):
    """Mid-run search-state checkpoint: every scipy iteration atomically
    records the current iterate, and --resume restarts from it (falling
    back to the best-model YAML when absent)."""
    from itrails_tpu.cli.optimize import main

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_optimize_config(tmp_path), f)
    out = tmp_path / "run" / "t"
    main([str(cfg_path), "--output", str(out), "--maxiter", "3"])
    state_path = tmp_path / "run" / "t.optimizer_state.yaml"
    assert state_path.exists()
    st = yaml.safe_load(open(state_path))
    assert st["variables"] and len(st["x_internal"]) == len(st["variables"])
    assert all(np.isfinite(v) for v in st["x_internal"])

    # poison the state iterate with a recognizable value and confirm the
    # resumed history starts from it
    st["x_internal"][0] = st["x_internal"][0] * 1.07
    yaml.safe_dump(st, open(state_path, "w"))
    main([str(cfg_path), "--output", str(out), "--maxiter", "1", "--resume"])
    hist_path = tmp_path / "run" / "t.optimization_history.csv"
    rows = [r for r in csv.reader(open(hist_path)) if r[0] != "n_eval"]
    # the first evaluation after resume is the checkpointed iterate
    resumed_first = float(rows[-2][1]) if len(rows) >= 2 else None
    assert any(
        abs(float(r[1]) - st["x_internal"][0]) < 1e-12 for r in rows
    )
