"""Checkpoint/resume behavior of the optimize workflow."""

import csv
import os

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
