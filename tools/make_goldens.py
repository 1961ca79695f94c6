"""Generate golden parity fixtures by executing the reference implementation
(/root/reference, pure Python via the numba shim in tools/refshim).

Outputs .npz files under tests/goldens/ that the test suite pins against.
Run once:  python tools/make_goldens.py [--quick]
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLDENS = os.path.join(REPO, "tests", "goldens")

# numba shim first, then the reference package.
sys.path.insert(0, os.path.join(HERE, "refshim"))
sys.path.insert(0, "/root/reference/src")

import itrails.ncpu as ncpu  # noqa: E402

ncpu.update_n_cpu(1)

from itrails.cutpoints import cutpoints_AB, cutpoints_ABC  # noqa: E402
from itrails.expm import expm as ref_expm  # noqa: E402
from itrails.get_joint_prob_mat import get_joint_prob_mat  # noqa: E402
from itrails.get_trans_emiss import trans_emiss_calc  # noqa: E402
from itrails.trans_mat import get_trans_mat, wrapper_state_general  # noqa: E402

# Default-ish parameter set (coalescent units, mu-scaled as in the workflows):
# mirrors examples/example_config.yaml converted with mu=1e-8 (reference:
# workflow_optimize.py:387-398): t_1=240000*mu etc.
PARAMS = dict(
    t_A=0.0024,
    t_B=0.0024,
    t_C=0.0028,  # t_1 + t_2
    t_2=0.0004,
    t_upper=0.00745069,
    t_out=0.009312,
    N_AB=0.0005,
    N_ABC=0.0005,
    r=1.0,  # r/mu = 1e-8/1e-8
)

# A second, deliberately asymmetric parameter point for stress parity.
PARAMS2 = dict(
    t_A=0.002,
    t_B=0.0031,
    t_C=0.0041,
    t_2=0.0007,
    t_upper=0.005,
    t_out=0.01,
    N_AB=0.0002,
    N_ABC=0.0006,
    r=0.4,
)


def golden_statespace():
    out = {}
    for species in (1, 2, 3):
        transitions, omega_dict, state_dict, omega_counts = wrapper_state_general(
            species
        )
        q_coal = get_trans_mat(transitions, species, 1.0, 0.0)
        q_rho = get_trans_mat(transitions, species, 0.0, 1.0)
        states = np.array(
            sorted(state_dict.keys(), key=lambda t: state_dict[t]), dtype=np.int64
        )
        out[f"states_{species}"] = states
        out[f"q_coal_{species}"] = q_coal
        out[f"q_rho_{species}"] = q_rho
        # omega masks keyed by state tuple for order-independent comparison
        omega_of_state = np.zeros((len(states), 2), dtype=np.int64)
        for (lo, ro), mask in omega_dict.items():
            for idx in np.where(mask)[0]:
                omega_of_state[idx] = (lo, ro)
        out[f"omega_of_state_{species}"] = omega_of_state
    np.savez(os.path.join(GOLDENS, "statespace.npz"), **out)
    print("statespace.npz written")


def golden_cutpoints():
    out = {}
    for n_ab in (1, 2, 3, 5):
        out[f"cut_AB_{n_ab}"] = cutpoints_AB(n_ab, 0.8, 1.3)
    for n_abc in (1, 2, 3, 5):
        out[f"cut_ABC_{n_abc}"] = cutpoints_ABC(n_abc, 0.7)
    np.savez(os.path.join(GOLDENS, "cutpoints.npz"), **out)
    print("cutpoints.npz written")


def golden_expm():
    rng = np.random.default_rng(0)
    mats, exps = [], []
    for scale in (0.01, 0.1, 1.0, 10.0, 40.0):
        a = rng.standard_normal((24, 24)) * scale
        a = a - np.diag(a.sum(axis=1))  # rate-matrix-like
        mats.append(a)
        exps.append(ref_expm(a.copy()))
    np.savez(
        os.path.join(GOLDENS, "expm.npz"),
        mats=np.array(mats),
        exps=np.array(exps),
    )
    print("expm.npz written")


def _joint_prob(params, n_int_AB, n_int_ABC):
    """Run the reference transition-probability pipeline, return dict
    key(str)->prob plus the cutpoints used."""
    n_ref = params["N_ABC"]
    coal_abc = 1.0  # after normalisation N_ref/N_ABC
    coal_ab = n_ref / params["N_AB"]
    cut_ab = cutpoints_AB(n_int_AB, params["t_2"] / n_ref, coal_ab)
    cut_abc = cutpoints_ABC(n_int_ABC, coal_abc)
    rho = n_ref * params["r"]
    tr = get_joint_prob_mat(
        params["t_A"] / n_ref,
        params["t_B"] / n_ref,
        params["t_2"] / n_ref,
        params["t_C"] / n_ref,
        rho,
        rho,
        rho,
        rho,
        rho,
        coal_ab,
        coal_ab,
        coal_ab,
        coal_ab,
        coal_abc,
        n_int_AB,
        n_int_ABC,
        cut_ab,
        cut_abc,
    )
    return tr, cut_ab, cut_abc


def golden_joint(params, n_int_AB, n_int_ABC, tag):
    t0 = time.time()
    tr, cut_ab, cut_abc = _joint_prob(params, n_int_AB, n_int_ABC)
    keys = sorted(tr.keys())
    vals = np.array([float(tr[k]) for k in keys])
    keys_arr = np.array([list(k[0]) + list(k[1]) for k in keys], dtype=np.int64)
    np.savez(
        os.path.join(GOLDENS, f"joint_{tag}.npz"),
        keys=keys_arr,
        vals=vals,
        cut_ab=cut_ab,
        cut_abc=cut_abc,
        total=vals.sum(),
    )
    print(f"joint_{tag}.npz written ({len(keys)} keys, {time.time()-t0:.1f}s, "
          f"total={vals.sum():.12f})")


def golden_model(params, n_int_AB, n_int_ABC, tag):
    t0 = time.time()
    a, b, pi, hidden, observed = trans_emiss_calc(
        params["t_A"],
        params["t_B"],
        params["t_C"],
        params["t_2"],
        params["t_upper"],
        params["t_out"],
        params["N_AB"],
        params["N_ABC"],
        params["r"],
        n_int_AB,
        n_int_ABC,
        "standard",
        "standard",
    )
    hidden_arr = np.array([list(hidden[i]) for i in range(len(hidden))], dtype=np.int64)
    observed_arr = np.array([observed[i] for i in range(len(observed))])
    np.savez(
        os.path.join(GOLDENS, f"model_{tag}.npz"),
        a=a,
        b=b,
        pi=pi,
        hidden=hidden_arr,
        observed=observed_arr,
    )
    print(f"model_{tag}.npz written (M={len(pi)}, {time.time()-t0:.1f}s)")
    return a, b, pi


def golden_hmm(a, b, pi, tag, seed=7):
    """Forward loglik / posterior / viterbi on synthetic token sequences."""
    from itrails.optimizer import (  # noqa: E402
        backtrack_viterbi,
        forward_loglik,
        post_prob,
        viterbi,
    )
    from itrails.read_data import get_idx_state  # noqa: E402

    order = [get_idx_state(i) for i in range(625)]
    rng = np.random.default_rng(seed)
    out = {}
    seqs = []
    # unambiguous-only and with-N sequences
    v1 = rng.integers(0, 256, size=400).astype(np.int64)
    v2 = rng.integers(0, 625, size=300).astype(np.int64)
    seqs = [("v1", v1), ("v2", v2)]
    for name, v in seqs:
        out[f"{name}_tokens"] = v
        out[f"{name}_loglik"] = forward_loglik(a, b, pi, v, order)
        out[f"{name}_post"] = post_prob(a, b, pi, v, order)
        om, prev = viterbi(a, b, pi, v, order)
        out[f"{name}_viterbi"] = backtrack_viterbi(om, prev).astype(np.int64)
    np.savez(os.path.join(GOLDENS, f"hmm_{tag}.npz"), **out)
    print(f"hmm_{tag}.npz written")


INT_PARAMS = dict(
    t_A=0.0024,
    t_B=0.0016,
    t_C=0.0016,
    t_2=0.0004,
    t_upper=0.00745069,
    t_out=0.009312,
    t_m=0.0008,
    N_AB=0.0005,
    N_BC=0.0004,
    N_ABC=0.0005,
    r=1.0,
    m=0.1,
)


def golden_int(params, n_int_AB, n_int_ABC, tag):
    import tempfile

    from itrails.int_get_trans_emiss import trans_emiss_calc_introgression

    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        a, b, pi, hidden, observed = trans_emiss_calc_introgression(
            params["t_A"], params["t_B"], params["t_C"], params["t_2"],
            params["t_upper"], params["t_out"], params["t_m"],
            params["N_AB"], params["N_BC"], params["N_ABC"], params["r"],
            params["m"], n_int_AB, n_int_ABC, "standard", "standard", tmp,
        )
    hidden_arr = np.array([list(hidden[i]) for i in range(len(hidden))],
                          dtype=np.int64)
    observed_arr = np.array([observed[i] for i in range(len(observed))])
    np.savez(
        os.path.join(GOLDENS, f"int_model_{tag}.npz"),
        a=a, b=np.asarray(b, dtype=np.float64), pi=pi, hidden=hidden_arr,
        observed=observed_arr,
    )
    print(f"int_model_{tag}.npz written (M={len(pi)}, {time.time()-t0:.1f}s, "
          f"pi_sum={pi.sum():.10f})")


MAF_SPECIES = ["hg38", "panTro5", "gorGor5", "ponAbe2"]


def _write_synthetic_maf(path, seed=11):
    """Small synthetic MAF exercising gaps, strands, missing species and
    lower-case bases."""
    rng = np.random.default_rng(seed)

    def seq(n, gap_p=0.08):
        bases = rng.choice(list("ACGTacgt-"), size=n,
                           p=[0.14, 0.14, 0.14, 0.14, 0.09, 0.09, 0.09, 0.09, 0.08])
        return "".join(bases)

    with open(path, "w") as f:
        f.write("##maf version=1\n\n")
        # block 1: all species, + strand
        n = 60
        f.write("a score=100.0\n")
        starts = [1000, 2000, 3000, 4000]
        for sp, st in zip(MAF_SPECIES, starts):
            s = seq(n)
            size = sum(c != "-" for c in s)
            f.write(f"s {sp}.chr1 {st} {size} + 500000 {s}\n")
        f.write("\n")
        # block 2: missing one species (must be skipped by tokenizer)
        f.write("a score=50.0\n")
        for sp in MAF_SPECIES[:3]:
            s = seq(40)
            size = sum(c != "-" for c in s)
            f.write(f"s {sp}.chr1 7000 {size} + 500000 {s}\n")
        f.write("\n")
        # block 3: all species, reference on - strand
        n = 45
        f.write("a score=80.0\n")
        for i, sp in enumerate(MAF_SPECIES):
            s = seq(n)
            size = sum(c != "-" for c in s)
            strand = "-" if i == 0 else "+"
            f.write(f"s {sp}.chr1 {8000+i} {size} {strand} 500000 {s}\n")
        f.write("\n")


def golden_integrands():
    """Dense-grid fixtures for the JC69 closed-form coalescence integrals
    (the trickiest transcription in the rebuild, SURVEY.md section 7)."""
    from itrails.get_emission_prob_mat import (
        JC69_analytical_integral,
        JC69_analytical_integral_double,
    )

    ts = np.array([0.01, 0.12, 0.4, 0.9, 2.0])
    mus = np.array([1e-4, 6.7e-4, 5e-3, 0.05])
    ks = np.array([0.3, 1.0, 3.7, 40.0])
    nucs = [(0, 0, 0, 0), (0, 1, 2, 3), (1, 1, 0, 2), (3, 2, 3, 2)]
    single = np.zeros((len(nucs), len(ts), len(mus), len(ks)))
    for ni, (a, b, c, d) in enumerate(nucs):
        for ti, t in enumerate(ts):
            for mi, mu in enumerate(mus):
                for ki, k in enumerate(ks):
                    single[ni, ti, mi, ki] = JC69_analytical_integral(
                        a, b, c, d, t, mu, k
                    )
    nucs6 = [(0, 0, 0, 0, 0, 0), (0, 1, 2, 3, 1, 2), (2, 2, 1, 0, 2, 0),
             (3, 0, 3, 0, 3, 0)]
    double = np.zeros((len(nucs6), len(ts), len(mus)))
    for ni, (a, b, c, d, e, f) in enumerate(nucs6):
        for ti, t in enumerate(ts):
            for mi, mu in enumerate(mus):
                double[ni, ti, mi] = JC69_analytical_integral_double(
                    a, b, c, d, e, f, t, mu
                )
    np.savez(
        os.path.join(GOLDENS, "integrands.npz"),
        ts=ts, mus=mus, ks=ks,
        nucs=np.array(nucs), nucs6=np.array(nucs6),
        single=single, double=double,
    )
    print("integrands.npz written")


def golden_maf():
    maf_path = os.path.join(GOLDENS, "synthetic.maf")
    _write_synthetic_maf(maf_path)
    from itrails.read_data import maf_parser, parse_coordinates  # noqa: E402

    blocks = maf_parser(maf_path, MAF_SPECIES)
    coords = parse_coordinates(maf_path, MAF_SPECIES, "hg38")
    out = {"n_blocks": np.array(len(blocks))}
    for i, b in enumerate(blocks):
        out[f"tokens_{i}"] = b
    for i, c in enumerate(coords):
        out[f"coords_{i}"] = np.asarray(c, dtype=np.int64)
    np.savez(os.path.join(GOLDENS, "maf.npz"), **out)
    print(f"maf.npz written ({len(blocks)} token blocks, {len(coords)} coord blocks)")


def golden_maf3():
    """3-species 'new method' tokenization + ambiguity-order fixtures
    (reference read_data.py:120-143, 70-91)."""
    maf_path = os.path.join(GOLDENS, "synthetic.maf")
    if not os.path.exists(maf_path):
        _write_synthetic_maf(maf_path)
    from itrails.read_data import (  # noqa: E402
        get_idx_state_new_method,
        maf_parser_new_method,
    )

    # NOTE: the reference's new-method pipeline is non-functional end to
    # end: maf_parser_new_method demands len(dct) == 4 while parsing 3
    # species (read_data.py:137) so it always returns [], and
    # get_idx_state_new_method recurses into the 4-SPECIES resolver for
    # tokens with >=2 Ns (read_data.py:86-90), yielding out-of-range
    # column indices.  Only the single-N resolutions are golden-able; the
    # rebuild implements the corrected semantics
    # (data.tokens.aggregation_matrix_3, data.maf.maf_tokens_new_method).
    blocks = maf_parser_new_method(maf_path, MAF_SPECIES[:3])
    out = {"n_blocks": np.array(len(blocks))}  # == 0: reference bug above
    for i, b in enumerate(blocks):
        out[f"tokens_{i}"] = b
    orders = np.zeros((125, 64), np.int64)
    for t in range(125):
        try:
            cols = get_idx_state_new_method(t)
        except Exception:
            continue
        if np.all(cols < 64):
            for c in cols:
                orders[t, c] = 1
    out["order_onehot_partial"] = orders
    np.savez(os.path.join(GOLDENS, "maf3.npz"), **out)
    print(f"maf3.npz written ({len(blocks)} token blocks)")


def _seed_best_model(path, mu):
    import yaml as _yaml

    with open(path, "w") as f:
        _yaml.safe_dump(
            {
                "fixed_parameters": {"mu": mu},
                "optimized_parameters": {},
                "results": {"log_likelihood": None, "iteration": None},
                "settings": {},
            },
            f,
        )


def _patch_best_model_float():
    """Under the numba shim the reference's loglik is a numpy scalar, which
    update_best_model yaml.dump's with a python/object tag that its own
    next safe_load rejects (real numba returns a Python float).  Cast to
    float on the way in — artifact-only, the trajectory is untouched."""
    import itrails.int_optimizer as ref_int_opt
    import itrails.optimizer as ref_opt
    import itrails.yaml_helpers as yh

    orig = yh.update_best_model

    def patched(path, variables, params, result, iteration):
        return orig(path, variables, [float(v) for v in params],
                    float(result), int(iteration))

    ref_opt.update_best_model = patched
    ref_int_opt.update_best_model = patched


def golden_trajectory(maxiter=40, n_int=(1, 2), tag="1x2",
                      method="Nelder-Mead"):
    """Optimization-trajectory golden (BASELINE 'optimized parameters match'
    gate): run the reference optimizer objective (optimization_wrapper,
    reference optimizer.py:396-583) under the same scipy call as reference
    optimizer.py:620-637 — with a bounded maxiter — on the synthetic MAF,
    and record every history row.  ``method`` may be "L-BFGS-B" (the
    reference's other exposed method, finite-difference gradients)."""
    import tempfile

    from scipy.optimize import minimize

    from itrails.optimizer import optimization_wrapper
    from itrails.read_data import maf_parser

    maf_path = os.path.join(GOLDENS, "synthetic.maf")
    if not os.path.exists(maf_path):
        _write_synthetic_maf(maf_path)
    V_lst = maf_parser(maf_path, MAF_SPECIES)

    mu = 1e-8
    # mirrors tests/test_workflows.py::_optimize_config after mu-scaling,
    # in the variable order prepare_optimize_setup produces
    optim_variables = ["t_1", "t_2", "N_ABC", "N_AB", "r", "t_upper"]
    optim_list = [0.0024, 0.0004, 0.0005, 0.0005, 1.0, 745069.3855e-8]
    bounds = [
        (0.00024, 0.024),
        (4e-05, 0.004),
        (5e-05, 0.005),
        (5e-05, 0.005),
        (0.1, 10.0),
        (74506.9385e-8, 7450693.8556e-8),
    ]
    fixed = {"n_int_AB": n_int[0], "n_int_ABC": n_int[1]}
    case = frozenset(["t_1"])

    _patch_best_model_float()
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        res_name = os.path.join(tmp, "traj")
        _seed_best_model(os.path.join(tmp, "traj.best_model.yaml"), mu)
        res = minimize(
            optimization_wrapper,
            x0=np.asarray(optim_list, dtype=np.float64),
            args=(optim_variables, case, dict(fixed), V_lst, res_name,
                  {"Nfeval": 0, "time": time.time()}),
            method=method,
            bounds=bounds,
            options={"maxiter": maxiter, "disp": True},
        )
        rows = np.loadtxt(
            os.path.join(tmp, "traj.optimization_history.csv"), delimiter=","
        )
    name = f"traj_{tag}.npz"
    np.savez(
        os.path.join(GOLDENS, name),
        variables=np.array(optim_variables),
        x0=np.asarray(optim_list),
        bounds=np.asarray(bounds),
        maxiter=maxiter,
        n_int=np.asarray(n_int),
        method=np.array(method),
        history_params=rows[:, 1:-2],
        history_loglik=rows[:, -2],
        final_x=np.asarray(res.x),
        final_fun=float(res.fun),
        n_eval=rows.shape[0],
    )
    print(f"{name} written ({rows.shape[0]} evals, "
          f"{time.time()-t0:.1f}s)")


def golden_int_trajectory(maxiter=10, four_param=False):
    """Same trajectory golden for the introgression family (reference
    int_optimizer.py:397-588 objective under the scipy call of :625-651).

    four_param=True optimizes (t_1, t_m, N_BC, m) — t_1 and t_m interact
    through the migration case algebra (t_B = t_C = t_1 - t_m and the
    t_out tail, reference int_optimizer.py:512-538), so this golden pins
    the algebra the 2-param golden barely touches."""
    import tempfile

    from scipy.optimize import minimize

    from itrails.int_optimizer import optimization_wrapper_introgression
    from itrails.read_data import maf_parser

    maf_path = os.path.join(GOLDENS, "synthetic.maf")
    V_lst = maf_parser(maf_path, MAF_SPECIES)

    mu = 1e-8
    # mirrors tests/test_int_workflows.py::_int_config(optimize=True):
    # optimize (t_1, m), everything else fixed; 'm' enters UNscaled (the
    # reference workflow's m*mu scaling is a documented bug we don't copy,
    # and the engine itself takes m as given)
    if four_param:
        optim_variables = ["t_1", "t_m", "N_BC", "m"]
        optim_list = [0.0024, 0.0008, 0.0004, 0.1]
        bounds = [(0.00024, 0.024), (8e-05, 0.0023), (4e-05, 0.004),
                  (0.001, 0.99)]
        fixed = {
            "n_int_AB": 1, "n_int_ABC": 2,
            "t_2": 0.0004, "t_upper": 745069.3855e-8,
            "N_AB": 0.0005, "N_ABC": 0.0005, "r": 1.0,
        }
    else:
        optim_variables = ["t_1", "m"]
        optim_list = [0.0024, 0.1]
        bounds = [(0.00024, 0.024), (0.001, 0.99)]
        fixed = {
            "n_int_AB": 1, "n_int_ABC": 2,
            "t_2": 0.0004, "t_m": 0.0008, "t_upper": 745069.3855e-8,
            "N_AB": 0.0005, "N_BC": 0.0004, "N_ABC": 0.0005, "r": 1.0,
        }
    case = frozenset(["t_1"])

    _patch_best_model_float()
    t0 = time.time()
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        os.chdir(tmp)  # first eval writes hidden/observed_states.csv to CWD
        try:
            res_name = os.path.join(tmp, "traj")
            _seed_best_model(os.path.join(tmp, "traj_best_model.yaml"), mu)
            res = minimize(
                optimization_wrapper_introgression,
                x0=np.asarray(optim_list, dtype=np.float64),
                args=(optim_variables, case, dict(fixed), V_lst, res_name,
                      {"Nfeval": 0, "time": time.time(), "tmp_path": tmp}),
                method="Nelder-Mead",
                bounds=bounds,
                options={"maxiter": maxiter, "disp": True},
            )
            rows = np.loadtxt(
                os.path.join(tmp, "traj_optimization_history.csv"),
                delimiter=",",
            )
        finally:
            os.chdir(cwd)
    name = "int_traj_4p.npz" if four_param else "int_traj_1x2.npz"
    np.savez(
        os.path.join(GOLDENS, name),
        variables=np.array(optim_variables),
        x0=np.asarray(optim_list),
        bounds=np.asarray(bounds),
        maxiter=maxiter,
        history_params=rows[:, 1:-2],
        history_loglik=rows[:, -2],
        final_x=np.asarray(res.x),
        final_fun=float(res.fun),
        n_eval=rows.shape[0],
    )
    print(f"{name} written ({rows.shape[0]} evals, "
          f"{time.time()-t0:.1f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small fixtures only")
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    os.makedirs(GOLDENS, exist_ok=True)

    def want(name):
        return args.only is None or args.only == name

    if want("maf"):
        golden_maf()
    if want("maf3"):
        golden_maf3()
    if want("integrands"):
        golden_integrands()
    if want("int"):
        golden_int(INT_PARAMS, 1, 2, "1x2")
        if not args.quick:
            golden_int(INT_PARAMS, 2, 2, "2x2")
            golden_int(INT_PARAMS, 3, 3, "3x3")
    if want("statespace"):
        golden_statespace()
    if want("cutpoints"):
        golden_cutpoints()
    if want("expm"):
        golden_expm()
    if want("joint"):
        golden_joint(PARAMS, 1, 2, "1x2")
        golden_joint(PARAMS, 2, 2, "2x2")
        golden_joint(PARAMS2, 2, 3, "2x3_p2")
        if not args.quick:
            golden_joint(PARAMS, 3, 3, "3x3")
    if want("model"):
        a, b, pi = golden_model(PARAMS, 1, 2, "1x2")
        golden_hmm(a, b, pi, "1x2")
        if not args.quick:
            a, b, pi = golden_model(PARAMS, 3, 3, "3x3")
            golden_hmm(a, b, pi, "3x3")
            golden_model(PARAMS2, 2, 3, "2x3_p2")
    if want("model4x4"):
        # BASELINE config 3 ladder: mid-size parity point
        a, b, pi = golden_model(PARAMS, 4, 4, "4x4")
        golden_hmm(a, b, pi, "4x4")
    if want("trajectory"):
        golden_trajectory(maxiter=25)
        golden_int_trajectory(maxiter=8)
    if want("trajectory2"):
        # round-4 deepened parity: bigger plain state space + longer run,
        # migration case algebra with 4 free params, and the reference's
        # other exposed method (L-BFGS-B, finite-difference gradients)
        golden_trajectory(maxiter=50, n_int=(2, 2), tag="2x2")
        golden_int_trajectory(maxiter=12, four_param=True)
        golden_trajectory(maxiter=4, tag="lbfgs_1x2", method="L-BFGS-B")
    if want("model7x7"):
        # the 133-state flagship (BASELINE config 3); slow in the pure-
        # Python reference — run overnight-style
        a, b, pi = golden_model(PARAMS, 7, 7, "7x7")
        golden_hmm(a, b, pi, "7x7")


if __name__ == "__main__":
    main()
