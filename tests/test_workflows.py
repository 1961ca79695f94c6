"""End-to-end CLI workflow tests on the synthetic MAF."""

import csv
import os

import numpy as np
import yaml

from tests.conftest import GOLDENS

MAF = os.path.join(GOLDENS, "synthetic.maf")
SPECIES = ["hg38", "panTro5", "gorGor5", "ponAbe2"]


def _optimize_config(tmp_path, maxish=True):
    return {
        "fixed_parameters": {"mu": 1e-8},
        "optimized_parameters": {
            "N_AB": [50000, 5000, 500000],
            "N_ABC": [50000, 5000, 500000],
            "t_1": [240000, 24000, 2400000],
            "t_2": [40000, 4000, 400000],
            "t_upper": [745069.3855, 74506.9385, 7450693.8556],
            "r": [1e-8, 1e-9, 1e-7],
        },
        "settings": {
            "input_maf": MAF,
            "output_prefix": None,
            "n_cpu": 1,
            "method": "Nelder-Mead",
            "species_list": SPECIES,
            "n_int_AB": 1,
            "n_int_ABC": 2,
        },
    }


def _decode_config():
    return {
        "fixed_parameters": {
            "mu": 1e-8,
            "t_1": 240000,
            "t_2": 40000,
            "t_upper": 745069.3855,
            "N_AB": 50000,
            "N_ABC": 50000,
            "r": 1e-8,
        },
        "optimized_parameters": {},
        "settings": {
            "input_maf": MAF,
            "output_prefix": None,
            "species_list": SPECIES,
            "n_int_AB": 1,
            "n_int_ABC": 2,
        },
    }


def test_optimize_cli_end_to_end(tmp_path):
    from itrails_tpu.cli.optimize import main

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_optimize_config(tmp_path), f)
    out = tmp_path / "run" / "test"
    main([str(cfg_path), "--output", str(out), "--maxiter", "3"])

    d = tmp_path / "run"
    assert (d / "test.starting_params.yaml").exists()
    assert (d / "test.best_model.yaml").exists()
    hist = list(csv.reader(open(d / "test.optimization_history.csv")))
    assert hist[0][:1] == ["n_eval"] and hist[0][-2:] == ["loglik", "time"]
    assert len(hist) >= 4  # header + >= maxiter rows

    best = yaml.safe_load(open(d / "test.best_model.yaml"))
    assert best["results"]["log_likelihood"] is not None
    assert np.isfinite(best["results"]["log_likelihood"])
    # de-scaled parameters should be in natural units (e.g. Ne ~ 1e4..1e6)
    assert 5000 <= best["optimized_parameters"]["N_AB"] <= 500000


def test_viterbi_and_posterior_cli(tmp_path):
    from itrails_tpu.cli.posterior import main as posterior_main
    from itrails_tpu.cli.viterbi import main as viterbi_main

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_decode_config(), f)

    out = tmp_path / "v" / "run"
    viterbi_main([str(cfg_path), "--output", str(out)])
    vit = list(csv.reader(open(tmp_path / "v" / "run.viterbi.csv")))
    assert vit[0] == ["Block_idx", "position_start", "position_end",
                      "most_likely_state"]
    assert len(vit) > 1
    hidden = list(csv.reader(open(tmp_path / "v" / "run.hidden_states.csv")))
    n_states = len(hidden) - 1
    assert n_states == 1 * 2 + 3 * 2 + 3 * 1  # M for 1x2
    # segments within block bounds and states in range
    for row in vit[1:]:
        assert 0 <= int(row[1]) <= int(row[2])
        assert 0 <= int(float(row[3])) < n_states

    out2 = tmp_path / "p" / "run"
    posterior_main([str(cfg_path), "--output", str(out2)])
    post = list(csv.reader(open(tmp_path / "p" / "run.posterior.csv")))
    assert post[0][:2] == ["alignment_block_idx", "position_idx"]
    assert len(post[0]) == 2 + n_states
    probs = np.array([[float(x) for x in row[2:]] for row in post[1:]])
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-8)


def test_viterbi_cli_flags_only_no_config(tmp_path):
    """Config-optional invocation: every parameter via CLI flags
    (reference workflow_viterbi.py:52-153), byte-identical to the
    config-file run."""
    from itrails_tpu.cli.viterbi import main as viterbi_main

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_decode_config(), f)
    out_cfg = tmp_path / "cfg" / "run"
    viterbi_main([str(cfg_path), "--output", str(out_cfg)])

    out_flags = tmp_path / "flags" / "run"
    viterbi_main([
        "--input", MAF, "--output", str(out_flags),
        "--mu", "1e-8", "--t1", "240000", "--t2", "40000",
        "--t_upper", "745069.3855", "--N_AB", "50000", "--N_ABC", "50000",
        "--r", "1e-8", "--n_int_AB", "1", "--n_int_ABC", "2",
        "--species_list", *SPECIES,
    ])
    a = open(tmp_path / "cfg" / "run.viterbi.csv").read()
    b = open(tmp_path / "flags" / "run.viterbi.csv").read()
    assert a == b and len(a.splitlines()) > 1
    ha = open(tmp_path / "cfg" / "run.hidden_states.csv").read()
    hb = open(tmp_path / "flags" / "run.hidden_states.csv").read()
    assert ha == hb


def test_viterbi_cli_flag_overrides_config(tmp_path):
    """A CLI parameter flag wins over the config value (reference
    workflow_viterbi.py:103-140: removed from optimized, pinned fixed)."""
    from itrails_tpu.cli.viterbi import main as viterbi_main

    cfg = _decode_config()
    cfg["fixed_parameters"]["N_AB"] = 99999999  # absurd; flag must override
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out_a = tmp_path / "a" / "run"
    viterbi_main(["--config-file", str(cfg_path), "--output", str(out_a),
                  "--N_AB", "50000"])

    cfg_ref = tmp_path / "ref.yaml"
    with open(cfg_ref, "w") as f:
        yaml.dump(_decode_config(), f)
    out_b = tmp_path / "b" / "run"
    viterbi_main([str(cfg_ref), "--output", str(out_b)])
    assert (open(tmp_path / "a" / "run.viterbi.csv").read()
            == open(tmp_path / "b" / "run.viterbi.csv").read())


def test_decode_cli_no_args_exits():
    import pytest

    from itrails_tpu.cli.viterbi import main as viterbi_main

    with pytest.raises(SystemExit):
        viterbi_main([])


def test_viterbi_with_reference_coordinates(tmp_path):
    from itrails_tpu.cli.viterbi import main as viterbi_main

    cfg = _decode_config()
    cfg["settings"]["reference"] = "hg38"
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = tmp_path / "r" / "run"
    viterbi_main([str(cfg_path), "--output", str(out)])
    vit = list(csv.reader(open(tmp_path / "r" / "run.viterbi.csv")))
    # coordinates projected to hg38 positions (block 1 starts at 1000)
    starts = [int(float(r[1])) for r in vit[1:] if r[0] == "0"]
    assert min(starts) >= 1000


def test_merge_decode_overrides_validation():
    """Unit coverage of the CLI-merge edge cases (reference
    workflow_viterbi.py:95-158, 208-228)."""
    import pytest

    from itrails_tpu.cli.common import decode_parser, merge_decode_overrides

    parser = decode_parser("t")
    # mu required when no config provides it
    args = parser.parse_args(["--t1", "1"])
    with pytest.raises(ValueError, match="mu must be specified"):
        merge_decode_overrides(args)
    # n_int derivation from manual cutpoints alone
    args = parser.parse_args([
        "--mu", "1e-8", "--cutpoints_AB", "0", "1", "2",
        "--cutpoints_ABC", "3", "4",
    ])
    cfg = merge_decode_overrides(args)
    assert cfg["settings"]["n_int_AB"] == 2
    assert cfg["settings"]["n_int_ABC"] == 2
    # n_int_AB missing entirely -> reference error message
    args = parser.parse_args(["--mu", "1e-8", "--n_int_ABC", "2"])
    with pytest.raises(ValueError, match="n_int_AB must be specified"):
        merge_decode_overrides(args)


def test_resolve_optim_method_defaults():
    """The exact-gradient L-BFGS-B path is the CLI default; an explicit
    settings.method: Nelder-Mead (reference parity) or --no-grad turns
    it off (VERDICT r4 item 2)."""
    import pytest

    from itrails_tpu.cli.common import resolve_optim_method

    implicit = {"method": "nelder-mead", "method_explicit": False}
    explicit_nm = {"method": "nelder-mead", "method_explicit": True}
    explicit_lb = {"method": "l-bfgs-b", "method_explicit": True}

    assert resolve_optim_method(implicit, False, False) == (True, "L-BFGS-B")
    assert resolve_optim_method(explicit_nm, False, False) == \
        (False, "Nelder-Mead")
    # explicit L-BFGS-B upgrades to exact gradients (the reference's
    # L-BFGS-B is finite-difference; exact grad strictly dominates it)
    assert resolve_optim_method(explicit_lb, False, False) == \
        (True, "L-BFGS-B")
    assert resolve_optim_method(explicit_nm, True, False) == \
        (True, "L-BFGS-B")
    # --no-grad restores the reference modes: NM, or FD L-BFGS-B
    assert resolve_optim_method(implicit, False, True) == \
        (False, "Nelder-Mead")
    assert resolve_optim_method(explicit_lb, False, True) == \
        (False, "L-BFGS-B")
    with pytest.raises(ValueError):
        resolve_optim_method(implicit, True, True)


def test_optimize_cli_default_is_exact_grad(tmp_path, capsys):
    """With no settings.method in the config, the CLI runs the
    exact-gradient L-BFGS-B path end to end."""
    from itrails_tpu.cli.optimize import main

    cfg = _optimize_config(tmp_path)
    del cfg["settings"]["method"]
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = tmp_path / "run" / "test"
    main([str(cfg_path), "--output", str(out), "--maxiter", "2"])
    assert "L-BFGS-B, exact gradients" in capsys.readouterr().out
    hist = list(csv.reader(open(tmp_path / "run" /
                                "test.optimization_history.csv")))
    assert len(hist) >= 3


def test_decode_cli_precision_float32(tmp_path):
    """--precision float32 runs the decode CLIs end-to-end; on this easy
    synthetic data the f32 Viterbi path must equal the f64 one and the
    f32 posterior rows must be distributions at f32 tolerance."""
    import yaml

    from itrails_tpu.cli.posterior import main as pmain
    from itrails_tpu.cli.viterbi import main as vmain

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(_decode_config(), f)
    out64 = tmp_path / "p64" / "run"
    out32 = tmp_path / "p32" / "run"
    vmain([str(cfg_path), "--output", str(out64)])
    vmain([str(cfg_path), "--output", str(out32), "--precision",
           "float32"])
    assert (open(tmp_path / "p64" / "run.viterbi.csv").read()
            == open(tmp_path / "p32" / "run.viterbi.csv").read())

    pout = tmp_path / "p32" / "post"
    pmain([str(cfg_path), "--output", str(pout), "--precision",
           "float32"])
    rows = list(csv.reader(open(tmp_path / "p32" / "post.posterior.csv")))
    probs = np.asarray([[float(x) for x in r[2:]] for r in rows[1:200]])
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)
