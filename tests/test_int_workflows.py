"""End-to-end introgression CLI workflow tests."""

import csv
import os

import numpy as np
import yaml

from tests.conftest import GOLDENS

MAF = os.path.join(GOLDENS, "synthetic.maf")
SPECIES = ["hg38", "panTro5", "gorGor5", "ponAbe2"]


def _int_config(optimize=False):
    cfg = {
        "fixed_parameters": {
            "mu": 1e-8,
            "t_1": 240000,
            "t_2": 40000,
            "t_m": 80000,
            "t_upper": 745069.3855,
            "N_AB": 50000,
            "N_BC": 40000,
            "N_ABC": 50000,
            "r": 1e-8,
            "m": 0.1,
        },
        "optimized_parameters": {},
        "settings": {
            "input_maf": MAF,
            "output_prefix": None,
            "species_list": SPECIES,
            "n_int_AB": 1,
            "n_int_ABC": 2,
            "method": "Nelder-Mead",
        },
    }
    if optimize:
        fp = cfg["fixed_parameters"]
        cfg["optimized_parameters"] = {
            "t_1": [240000, 24000, 2400000],
            "m": [0.1, 0.001, 0.99],
        }
        for k in ("t_1",):
            fp.pop(k)
        fp.pop("m")
    return cfg


def test_int_optimize_cli(tmp_path):
    from itrails_tpu.cli.int_optimize import main

    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_int_config(optimize=True), f)
    out = tmp_path / "o" / "run"
    main([str(cfg_path), "--output", str(out), "--maxiter", "2"])
    hist = list(csv.reader(open(tmp_path / "o" / "run_optimization_history.csv")))
    assert hist[0][1:3] == ["t_1", "m"]
    assert len(hist) >= 3
    best = yaml.safe_load(open(tmp_path / "o" / "run_best_model.yaml"))
    assert np.isfinite(best["results"]["log_likelihood"])
    # m must round-trip unscaled (reference bug not reproduced)
    assert 0.001 <= best["optimized_parameters"]["m"] <= 0.99
    # first-eval state-map artifacts (reference int_optimizer.py:551-560)
    hs = list(csv.reader(open(tmp_path / "o" / "hidden_states.csv")))
    assert hs[0] == ["idx", "hidden"]
    assert hs[1][1] == "(0, 0, 0)"
    assert any(r[1] == "(4, 0, 0)" for r in hs[1:])  # introgressed V4 states
    obs = list(csv.reader(open(tmp_path / "o" / "observed_states.csv")))
    assert obs[0] == ["idx", "observed"]
    assert obs[1] == ["0", "AAAA"] and len(obs) == 257


def test_int_viterbi_and_posterior_cli(tmp_path):
    from itrails_tpu.cli.int_posterior import main as pmain
    from itrails_tpu.cli.int_viterbi import main as vmain

    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_int_config(), f)

    out = tmp_path / "v" / "run"
    vmain([str(cfg_path), "--output", str(out)])
    hidden = list(csv.reader(open(tmp_path / "v" / "run.hidden_states.csv")))
    m_states = len(hidden) - 1
    assert m_states == 2 * 1 * 2 + 3 * 2 + 3 * 1  # int M for 1x2
    assert any("({sp2,sp3},sp1)" in row[1] for row in hidden[1:])  # V4 present

    out2 = tmp_path / "p" / "run"
    pmain([str(cfg_path), "--output", str(out2)])
    post = list(csv.reader(open(tmp_path / "p" / "run.posterior.csv")))
    probs = np.array([[float(x) for x in r[2:]] for r in post[1:]])
    assert probs.shape[1] == m_states
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-8)


def test_int_viterbi_cli_flags_only_no_config(tmp_path):
    """Config-optional int decode via the full flag set (reference
    workflow_int_viterbi.py:52-160: adds --t_m/--N_BC/--m)."""
    from itrails_tpu.cli.int_viterbi import main as vmain

    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_int_config(), f)
    out_cfg = tmp_path / "cfg" / "run"
    vmain([str(cfg_path), "--output", str(out_cfg)])

    out_flags = tmp_path / "flags" / "run"
    vmain([
        "--input", MAF, "--output", str(out_flags),
        "--mu", "1e-8", "--t1", "240000", "--t2", "40000",
        "--t_m", "80000", "--t_upper", "745069.3855",
        "--N_AB", "50000", "--N_BC", "40000", "--N_ABC", "50000",
        "--r", "1e-8", "--m", "0.1",
        "--n_int_AB", "1", "--n_int_ABC", "2",
        "--species_list", *SPECIES,
    ])
    assert (open(tmp_path / "cfg" / "run.viterbi.csv").read()
            == open(tmp_path / "flags" / "run.viterbi.csv").read())


def test_int_proportional_tm(tmp_path):
    from itrails_tpu.cli.common import prepare_decode_setup

    cfg = _int_config()
    cfg["settings"]["proportional"] = True
    cfg["fixed_parameters"]["t_m"] = 0.25
    setup = prepare_decode_setup(cfg, introgression=True)
    # t_m = 0.25 * t_1, mu-scaled
    assert abs(setup["params"]["t_m"] - 0.25 * 240000 * 1e-8) < 1e-12
