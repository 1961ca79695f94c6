"""Round-3 experiment: where does the CACHED 7x7 (M=133) model build spend
its ~1.2 s?  Times each stage of the build pipeline separately on the host
CPU (the production 7x7 build device), f64, after warmup.  Each stage is
jitted on its own so the numbers sum roughly to the fused build."""

import functools
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from itrails_tpu.core import ctmc
from itrails_tpu.core.ctmc import run_abc_stage, _run_chain, _precompute_vl
from itrails_tpu.core.emissions import emission_matrix
from itrails_tpu.core.expm import expm_batch
from itrails_tpu.core.cutpoints import cutpoints_ab, cutpoints_abc
from itrails_tpu.core.schedule import build_plan
from itrails_tpu.core.statespace import state_space
from itrails_tpu.core.model import build_model_fn

N = 7
P = dict(t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004,
         t_upper=0.00745069, t_out=0.009312, N_AB=0.0005, N_ABC=0.0005,
         r=1.0)


def timeit(name, fn, *args, reps=3, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s}: {min(ts)*1e3:8.1f} ms", flush=True)
    return out


def main():
    fn = build_model_fn(N, N, "float64")
    args = (P["t_A"], P["t_B"], P["t_C"], P["t_2"], P["t_upper"],
            P["t_out"], P["N_AB"], P["N_ABC"], P["r"])
    timeit("full cached build", fn, *args)

    # mu-scaled params exactly as model._build
    n_ref = P["N_ABC"]
    t_ab = P["t_2"] / n_ref
    rho = n_ref * P["r"]
    coal_ab = n_ref / P["N_AB"]
    coal_abc = 1.0
    dtype = jnp.float64
    plan = build_plan(N, N)
    sp3 = state_space(3)
    cut_AB = cutpoints_ab(N, t_ab, coal_ab, dtype)
    cut_ABC = cutpoints_abc(N, coal_abc, dtype)
    dt_abc = cut_ABC[1:] - cut_ABC[:-1]

    q3 = ctmc._rate_matrix(sp3, coal_abc, rho, dtype)
    q2 = ctmc._rate_matrix(state_space(2), coal_ab, rho, dtype)
    dt_ab = cut_AB[1:] - cut_AB[:-1]

    timeit("AB expm batch (7)", jax.jit(
        lambda q, d: expm_batch(q[None] * d[:, None, None])), q2, dt_ab)
    timeit("ABC expm batch (6)", jax.jit(
        lambda q, d: expm_batch(q[None] * d[:N - 1, None, None])), q3,
        dt_abc)

    vl_fn = jax.jit(lambda q, d: _precompute_vl(
        plan.abc_steps, plan.abc_masks, q, d)[1])
    timeit("VL precompute expms", vl_fn, q3, dt_abc)

    abc_masks = jnp.asarray(plan.abc_masks, dtype)
    p0 = jnp.zeros((plan.abc_n_keys, sp3.n_states), dtype).at[0, 0].set(1.0)

    @jax.jit
    def chain(q, d, p0):
        e_abc = expm_batch(q[None] * d[:N - 1, None, None])
        return _run_chain(plan.abc_steps, abc_masks, p0, e_abc,
                          vl_ctx=(q, d), masks_np=plan.abc_masks)
    timeit("ABC chain (expm+VL+DP)", chain, q3, dt_abc, p0)

    pi_abc = jnp.ones((len(plan.abc_init_from_ab), sp3.n_states), dtype)
    stage = jax.jit(functools.partial(run_abc_stage, plan, dtype=dtype))
    timeit("run_abc_stage (all deep)", stage, pi_abc, q3, cut_ABC)

    mu_scale = n_ref * (4.0 / 3.0)
    em = jax.jit(functools.partial(
        emission_matrix, n_int_AB=N, n_int_ABC=N, coal_AB=coal_ab,
        coal_ABC=coal_abc, mu_A=mu_scale, mu_B=mu_scale, mu_C=mu_scale,
        mu_D=mu_scale, mu_AB=mu_scale, mu_ABC=mu_scale, dtype=dtype))
    timeit("emission matrix", em,
           t_A=P["t_A"] / n_ref, t_B=P["t_B"] / n_ref,
           t_C=P["t_C"] / n_ref, t_AB=t_ab,
           t_upper=P["t_upper"] / n_ref, t_out=P["t_out"] / n_ref,
           cut_AB=cut_AB, cut_ABC=cut_ABC)


if __name__ == "__main__":
    main()
