"""Nightly-style smoke: run all six CLIs end-to-end on the current backend
against a synthetic MAF and verify every artifact exists and parses.

Usage: PYTHONPATH=... python tools/smoke_cli.py [workdir]
(~minutes on a cold TPU tunnel: each new jit shape compiles remotely.)
"""

import csv
import os
import subprocess
import sys
import tempfile

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_maf(path):
    import jax

    jax.config.update("jax_enable_x64", True)
    from itrails_tpu.core.model import build_model
    from itrails_tpu.data.simulate import simulate_maf

    model = build_model(
        t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004, t_upper=0.00745069,
        t_out=0.009312, N_AB=0.0005, N_ABC=0.0005, r=1.0,
        n_int_AB=1, n_int_ABC=1, dtype="float64", device="cpu",
    )
    simulate_maf(path, model, ["sp1", "sp2", "sp3", "sp4"], n_blocks=3,
                 block_len=300, seed=1)


def cfg(work, maf, prefix, optimize, intro):
    c = {
        "fixed_parameters": {"mu": 2.0e-8, "N_AB": 50000, "N_ABC": 50000,
                             "r": 1.0e-8},
        "optimized_parameters": {},
        "settings": {
            "input_maf": maf, "output_prefix": prefix, "n_cpu": 2,
            "species_list": ["sp1", "sp2", "sp3", "sp4"],
            "n_int_AB": 1, "n_int_ABC": 1,
        },
    }
    if optimize:
        c["optimized_parameters"] = {"t_1": [240000, 30000, 4000000],
                                     "t_2": [40000, 10000, 2000000],
                                     "t_upper": [745069, 74506, 7450693]}
        if intro:
            c["optimized_parameters"]["m"] = [0.1, 0.001, 0.99]
    else:
        c["fixed_parameters"].update({"t_1": 240000, "t_2": 40000,
                                      "t_upper": 745069})
    if intro:
        c["fixed_parameters"].update({"t_m": 120000, "N_BC": 40000})
        if not optimize:
            c["fixed_parameters"]["m"] = 0.1
    return c


def run(mod, cfg_path, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        + [REPO]
    )
    cmd = [sys.executable, "-m", mod, cfg_path] + list(extra)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=3600)
    assert r.returncode == 0, f"{mod} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    print(f"  {mod}: OK")


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="itrails_smoke_")
    os.makedirs(work, exist_ok=True)
    maf = os.path.join(work, "sim.maf")
    write_maf(maf)
    for intro in (False, True):
        fam = "int_" if intro else ""
        tag = "int" if intro else "plain"
        out = os.path.join(work, tag)
        os.makedirs(out, exist_ok=True)
        p_opt = os.path.join(out, "run")
        c = cfg(work, maf, p_opt, optimize=True, intro=intro)
        cp = os.path.join(work, f"cfg_opt_{tag}.yaml")
        yaml.safe_dump(c, open(cp, "w"))
        run(f"itrails_tpu.cli.{fam}optimize", cp, ["--maxiter", "2"])
        sep = "_" if intro else "."
        best = f"{p_opt}{sep}best_model.yaml"
        assert os.path.exists(best)
        # decode from fixed params
        p_dec = os.path.join(out, "dec")
        c = cfg(work, maf, p_dec, optimize=False, intro=intro)
        cp = os.path.join(work, f"cfg_dec_{tag}.yaml")
        yaml.safe_dump(c, open(cp, "w"))
        run(f"itrails_tpu.cli.{fam}viterbi", cp)
        run(f"itrails_tpu.cli.{fam}posterior", cp)
        # decode artifacts use '.' in both families (the reference's int
        # optimize alone uses '_' separators)
        vit = f"{p_dec}.viterbi.csv"
        post = f"{p_dec}.posterior.csv"
        for path in (vit, post):
            assert os.path.exists(path), path
            rows = list(csv.reader(open(path)))
            assert len(rows) > 1, path
        # chained pipeline (reference README.md:30-40): the optimize run's
        # best_model.yaml IS the decode config, fed unmodified
        p_chain = os.path.join(out, "chain")
        run(f"itrails_tpu.cli.{fam}viterbi", best,
            ["--output", p_chain])
        run(f"itrails_tpu.cli.{fam}posterior", best,
            ["--output", p_chain])
        for path in (f"{p_chain}.viterbi.csv", f"{p_chain}.posterior.csv"):
            assert os.path.exists(path), path
        if not intro:
            # 3-species "new method" decode mode (plain family only)
            p_nm = os.path.join(out, "nm")
            c = cfg(work, maf, p_nm, optimize=False, intro=False)
            c["settings"]["species_list"] = ["sp1", "sp2", "sp3"]
            cp = os.path.join(work, "cfg_dec_nm.yaml")
            yaml.safe_dump(c, open(cp, "w"))
            run("itrails_tpu.cli.viterbi", cp,
                ["--obs-mode", "new-method"])
            rows = list(csv.reader(open(f"{p_nm}.viterbi.csv")))
            assert len(rows) > 1
    print(f"ALL SIX CLIs OK, chained best-model decode OK, "
          f"new-method decode OK ({work})")


if __name__ == "__main__":
    main()
