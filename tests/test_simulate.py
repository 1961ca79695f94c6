"""End-to-end loop: simulate from known parameters -> re-tokenize -> the
likelihood surface prefers the truth, and Viterbi recovers the hidden path
far better than chance."""

import numpy as np

from itrails_tpu.core.model import build_model
from itrails_tpu.data.maf import maf_tokens
from itrails_tpu.data.simulate import simulate_maf, simulate_tokens
from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import decoders

SPECIES = ["hg38", "panTro5", "gorGor5", "ponAbe2"]
TRUE = dict(t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004,
            t_upper=0.00745069, t_out=0.009312, N_AB=0.0005, N_ABC=0.0005,
            r=1.0)


def _engine(model):
    bfull = decoders.emission_table(model.b, aggregation_matrix())
    return model.a, bfull, model.pi


def test_simulated_maf_roundtrip(tmp_path):
    model = build_model(n_int_AB=1, n_int_ABC=2, **TRUE)
    path = tmp_path / "sim.maf"
    simulate_maf(path, model, SPECIES, n_blocks=2, block_len=2000, seed=3)
    blocks = maf_tokens(path, SPECIES)
    assert len(blocks) == 2 and all(len(b) == 2000 for b in blocks)
    assert all(b.max() < 256 for b in blocks)


def test_likelihood_prefers_true_parameters(tmp_path):
    import jax.numpy as jnp

    true_model = build_model(n_int_AB=1, n_int_ABC=2, **TRUE)
    tokens, _ = simulate_tokens(true_model, 30_000, seed=1)
    batch = jnp.asarray(tokens[None], jnp.int32)

    a, bfull, pi = _engine(true_model)
    ll_true = float(decoders.forward(a, bfull, pi, batch)[1][0])

    off = dict(TRUE)
    off["N_AB"] = TRUE["N_AB"] * 3
    off["t_A"] = TRUE["t_A"] * 1.5
    off["t_B"] = TRUE["t_B"] * 1.5
    off_model = build_model(n_int_AB=1, n_int_ABC=2, **off)
    a2, bfull2, pi2 = _engine(off_model)
    ll_off = float(decoders.forward(a2, bfull2, pi2, batch)[1][0])
    assert ll_true > ll_off + 10.0


def test_viterbi_recovers_hidden_path_better_than_chance():
    import jax.numpy as jnp

    model = build_model(n_int_AB=1, n_int_ABC=2, **TRUE)
    tokens, states = simulate_tokens(model, 20_000, seed=2)
    a, bfull, pi = _engine(model)
    path = np.asarray(decoders.viterbi(a, bfull, pi, jnp.asarray(tokens[None], jnp.int32)))[0]
    accuracy = float((path == states).mean())
    assert accuracy > 2.0 / len(model.pi)  # far better than uniform chance


def test_parameter_recovery_optimize(tmp_path):
    """Simulate from known parameters, fit with the real optimizer, and
    check the likelihood improves substantially from a deliberately wrong
    start and the fitted N_AB moves toward the truth."""
    import csv

    import yaml

    from itrails_tpu.cli.optimize import main

    true_model = build_model(n_int_AB=1, n_int_ABC=2, **TRUE)
    maf = tmp_path / "sim.maf"
    simulate_maf(maf, true_model, SPECIES, n_blocks=4, block_len=10_000, seed=7)

    cfg = {
        "fixed_parameters": {
            "mu": 1e-8,
            # truth (mu-descaled): t_1=240000, t_2=40000
            "t_2": 40000,
            "t_upper": 745069.0,
            "t_out": 931200,
            "N_AB": 50000,
            "N_ABC": 50000,
            "r": 1e-8,
        },
        # start the speciation time at half the truth (240000)
        "optimized_parameters": {"t_1": [120000, 24000, 2400000]},
        "settings": {
            "input_maf": str(maf),
            "output_prefix": None,
            "species_list": SPECIES,
            "n_int_AB": 1,
            "n_int_ABC": 2,
            "method": "Nelder-Mead",
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = tmp_path / "fit" / "run"
    main([str(cfg_path), "--output", str(out), "--maxiter", "25"])

    hist = list(csv.reader(open(tmp_path / "fit" / "run.optimization_history.csv")))
    logliks = [float(r[-2]) for r in hist[1:]]
    assert max(logliks) > logliks[0] + 30.0  # improved from the wrong start
    best = yaml.safe_load(open(tmp_path / "fit" / "run.best_model.yaml"))
    fitted = best["optimized_parameters"]["t_1"]
    assert abs(fitted - 240000) < abs(120000 - 240000)  # moved toward truth


def test_token_batch_matches_columnwise_sampler_statistics():
    """simulate_token_batch (vectorised) must agree with simulate_tokens
    (per-column) in distribution: same per-token marginals within
    sampling noise, correct N-burst fraction, and a higher per-column
    loglik under the generating model than uniform-random tokens."""
    import jax.numpy as jnp

    model = build_model(n_int_AB=1, n_int_ABC=2, **TRUE)
    from itrails_tpu.data.simulate import simulate_token_batch

    batch = simulate_token_batch(model, 8, 4000, seed=5, n_frac=0.0)
    assert batch.shape == (8, 4000) and batch.dtype == np.int32
    assert batch.min() >= 0 and batch.max() < 256

    ref, _ = simulate_tokens(model, 32_000, seed=6)
    h1 = np.bincount(batch.reshape(-1), minlength=256) / batch.size
    h2 = np.bincount(ref, minlength=256) / ref.size
    # total-variation distance between the two empirical marginals
    assert 0.5 * np.abs(h1 - h2).sum() < 0.05

    a, bfull, pi = _engine(model)
    ll_sim = float(decoders.forward_loglik(
        a, bfull, pi, jnp.asarray(batch, jnp.int32)))
    rng = np.random.default_rng(0)
    ll_rand = float(decoders.forward_loglik(
        a, bfull, pi,
        jnp.asarray(rng.integers(0, 256, size=batch.shape), jnp.int32)))
    assert ll_sim > ll_rand + 0.5 * batch.size  # >0.5 nats/col better

    # N bursts: requested ambiguous fraction within 2x either way
    noisy = simulate_token_batch(model, 8, 4000, seed=5, n_frac=0.02)
    frac = (noisy >= 256).mean()
    assert 0.01 <= frac <= 0.08
