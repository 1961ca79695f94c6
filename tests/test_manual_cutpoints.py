"""Manual-cutpoint override path through the decode workflow."""

import csv

import numpy as np
import yaml

from tests.test_workflows import _decode_config


def test_viterbi_with_manual_cutpoints(tmp_path):
    from itrails_tpu.cli.viterbi import main

    cfg = _decode_config()
    # absolute-unit cutpoints: AB needs n+1 values in [t_A, t_A+t_2];
    # ABC needs n values from t_A+t_2 upward (infinite bound implicit)
    cfg["settings"]["cutpoints_AB"] = [240000.0, 270000.0]
    cfg["settings"]["cutpoints_ABC"] = [280000.0, 330000.0]
    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = tmp_path / "m" / "run"
    main([str(cfg_path), "--output", str(out)])
    hidden = list(csv.reader(open(tmp_path / "m" / "run.hidden_states.csv")))
    # interval annotations must reflect the manual cutpoints
    assert any("330000.00" in row[3] for row in hidden[1:])
    vit = list(csv.reader(open(tmp_path / "m" / "run.viterbi.csv")))
    assert len(vit) > 1


def test_manual_cutpoints_validation(tmp_path):
    from itrails_tpu.cli.common import prepare_decode_setup

    cfg = _decode_config()
    cfg["settings"]["cutpoints_AB"] = [1.0, 2.0, 3.0]  # wrong count for n=1
    try:
        prepare_decode_setup(cfg)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "cutpoints_AB" in str(e)
