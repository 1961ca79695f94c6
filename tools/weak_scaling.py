"""Weak-scaling harness for the sharded forward decode.

Runs the production data-parallel log-likelihood (hmm.sharding) with FIXED
per-device work over meshes of 1/2/4/8 devices and reports per-device
throughput + weak-scaling efficiency as JSON (written to WEAKSCALING.json
at the repo root, next to the BENCH artifacts).

On this image only one physical TPU chip is reachable, so the default mode
forces an N-device *virtual CPU* mesh per measurement (fresh subprocess per
N — XLA device count is fixed at backend init).  On a real pod slice run
with ``--backend tpu`` and it measures the physical mesh sizes available.
The collective pattern is identical either way: one psum of the per-shard
scalar (see hmm/sharding.py).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(n_dev: int, w_per_dev: int, t_len: int, m: int):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from itrails_tpu.hmm import sharding

    devices = jax.devices()[:n_dev]
    assert len(devices) == n_dev, f"need {n_dev} devices, have {len(devices)}"
    mesh = sharding.data_mesh(devices)

    rng = np.random.default_rng(0)
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    bfull = rng.random((m, 625)) * 0.01 + 1e-4
    pi = rng.random(m)
    pi /= pi.sum()
    cast = jnp.float32
    a, bfull, pi = (jnp.asarray(x, cast) for x in (a, bfull, pi))

    w = n_dev * w_per_dev
    tokens = jnp.asarray(
        rng.integers(0, 625, size=(w, t_len)), jnp.int32
    )
    tokens = sharding.shard_batch(tokens, mesh)
    f = sharding.sharded_loglik_fn(mesh)
    jax.block_until_ready(f(a, bfull, pi, tokens))  # compile
    jax.block_until_ready(f(a, bfull, pi, tokens))
    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        ll = f(a, bfull, pi, tokens)
    jax.block_until_ready(ll)
    dt = (time.time() - t0) / n_rep
    cols = w * t_len
    return {
        "n_devices": n_dev,
        "windows": w,
        "t_len": t_len,
        "cols": cols,
        "seconds": dt,
        "cols_per_s": cols / dt,
        "cols_per_s_per_device": cols / dt / n_dev,
        "loglik": float(ll),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", type=int, default=None,
                   help="(internal) run one measurement at N devices")
    p.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--w-per-dev", type=int, default=64)
    p.add_argument("--t-len", type=int, default=4096)
    p.add_argument("--m", type=int, default=27)
    p.add_argument("--sizes", type=str, default="1,2,4,8")
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "WEAKSCALING.json"))
    args = p.parse_args()

    if args.worker is not None:
        if args.backend == "cpu":
            os.environ["JAX_PLATFORMS"] = "cpu"
            import jax

            jax.config.update("jax_platforms", "cpu")
        res = measure(args.worker, args.w_per_dev, args.t_len, args.m)
        print("RESULT " + json.dumps(res))
        return

    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for n in sizes:
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        if args.backend == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={n}"
            )
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(n), "--backend", args.backend,
               "--w-per-dev", str(args.w_per_dev),
               "--t-len", str(args.t_len), "--m", str(args.m)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=900)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            raise RuntimeError(
                f"weak-scaling worker n={n} failed:\n{out.stdout[-2000:]}"
                f"\n{out.stderr[-2000:]}"
            )
        rows.append(json.loads(line[-1][len("RESULT "):]))
        print(f"n={n}: {rows[-1]['cols_per_s_per_device']/1e6:.2f} "
              f"Mcol/s/device")

    base = rows[0]["cols_per_s_per_device"]
    for r in rows:
        r["weak_scaling_efficiency"] = r["cols_per_s_per_device"] / base
    report = {
        "metric": "weak scaling of sharded forward loglik "
                  "(fixed per-device work)",
        "caveat": (
            "backend=cpu forces N virtual devices onto ONE shared-core "
            "host, so per-device throughput necessarily decays ~1/N once "
            "cores saturate; the numbers validate the harness + collective "
            "path, not hardware scaling.  Run with --backend tpu on a real "
            "slice for physical weak-scaling efficiency (the collective "
            "pattern — one psum of a per-shard scalar — is identical)."
            if args.backend == "cpu" else ""
        ),
        "backend": args.backend,
        "m_states": args.m,
        "w_per_dev": args.w_per_dev,
        "t_len": args.t_len,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
