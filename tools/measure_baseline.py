"""Measure the single-core reference baseline for vs_baseline claims.

Two measurements on the bench model (3x3 intervals, M=27):

1. ``python_cols_per_s`` — the reference's own ``forward_loglik`` (pure
   Python through the tools/refshim numba shim; numba itself is not
   installable in this image).
2. ``c_cols_per_s`` — a single-core C (-O3 -march=native) implementation
   of the identical recursion (tools/baseline_c/forward.c) with the
   emission table fully precomputed: a measured stand-in for (and upper
   bound on) the reference's numba-compiled kernel.

Writes BASELINE_MEASURED.json at the repo root; bench.py uses
``c_cols_per_s`` as the baseline denominator when the file exists.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def build_bench_model():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from itrails_tpu.core.model import build_model
    from itrails_tpu.data.tokens import aggregation_matrix
    from itrails_tpu.hmm import decoders

    model = build_model(
        t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004, t_upper=0.00745069,
        t_out=0.009312, N_AB=0.0005, N_ABC=0.0005, r=1.0,
        n_int_AB=3, n_int_ABC=3, dtype="float64", device="cpu",
    )
    bfull = decoders.emission_table(
        model.b, jnp.asarray(aggregation_matrix(), jnp.float64)
    )
    return (np.asarray(model.a), np.asarray(model.b), np.asarray(bfull),
            np.asarray(model.pi))


def measure_c(a, bfull, pi, t_len=2_000_000, reps=3):
    src = os.path.join(HERE, "baseline_c", "forward.c")
    exe = os.path.join(HERE, "baseline_c", "forward")
    subprocess.run(
        ["gcc", "-O3", "-march=native", "-o", exe, src, "-lm"], check=True
    )
    m, k = bfull.shape
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, k, size=t_len).astype(np.int32)
    model_bin = "/tmp/baseline_model.bin"
    tok_bin = "/tmp/baseline_tokens.bin"
    with open(model_bin, "wb") as f:
        f.write(np.ascontiguousarray(a, np.float64).tobytes())
        f.write(np.ascontiguousarray(bfull, np.float64).tobytes())
        f.write(np.ascontiguousarray(pi, np.float64).tobytes())
    tokens.tofile(tok_bin)
    out = subprocess.run(
        [exe, model_bin, tok_bin, str(m), str(k), str(t_len), str(reps)],
        capture_output=True, text=True, check=True,
    ).stdout
    fields = dict(kv.split("=") for kv in out.split())
    return float(fields["cols_per_s"]), float(fields["loglik"]), tokens


def measure_python(a, b, pi, t_len=20_000):
    sys.path.insert(0, os.path.join(HERE, "refshim"))
    sys.path.insert(0, "/root/reference/src")
    from itrails.optimizer import forward_loglik  # noqa: E402
    from itrails.read_data import get_idx_state  # noqa: E402

    order = [get_idx_state(i) for i in range(625)]
    rng = np.random.default_rng(0)
    v = rng.integers(0, 625, size=t_len).astype(np.int64)
    forward_loglik(a, b, pi, v[:500], order)  # warm caches
    t0 = time.time()
    ll = forward_loglik(a, b, pi, v, order)
    dt = time.time() - t0
    return t_len / dt, float(ll)


def main():
    a, b, bfull, pi = build_bench_model()
    # correctness: C kernel == our f64 decoder on an identical 100k slice
    c_rate_small, c_ll_small, tokens_small = measure_c(
        a, bfull, pi, t_len=100_000, reps=1
    )
    import jax.numpy as jnp

    from itrails_tpu.hmm import decoders

    ll_jax = float(decoders.forward_loglik(
        jnp.asarray(a), jnp.asarray(bfull), jnp.asarray(pi),
        jnp.asarray(tokens_small[None, :]),
    ))
    assert abs(c_ll_small - ll_jax) < 1e-6 * abs(ll_jax), (c_ll_small, ll_jax)

    c_rate, c_ll, _ = measure_c(a, bfull, pi)
    py_rate, _ = measure_python(a, b, pi)

    report = {
        "model": "3x3 intervals, M=27 (bench model)",
        "host": f"{os.cpu_count()} CPUs",
        "python_cols_per_s": round(py_rate, 1),
        "c_cols_per_s": round(c_rate, 1),
        "c_over_python": round(c_rate / py_rate, 1),
        "c_loglik": c_ll,
        "note": (
            "c_cols_per_s: single-core C -O3 of the reference recursion "
            "(reference optimizer.py:165-188) with precomputed emission "
            "table — a measured upper bound standing in for the numba "
            "kernel (numba is not installable in this image).  "
            "python_cols_per_s: the reference itself via tools/refshim."
        ),
        "crosscheck": {
            "c_loglik_100k": c_ll_small,
            "jax_f64_loglik_100k": ll_jax,
        },
    }
    out = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
