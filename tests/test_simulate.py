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
