"""Worker process for the multi-host (N>=2 process) correctness test.

Launched by tests/test_multihost.py: each process initializes
``jax.distributed`` over loopback (Gloo CPU collectives), joins a global
mesh spanning all processes' devices, evaluates the production sharded
decode paths, and writes its results to a JSON file.  BASELINE.md's
correctness gate demands parity "at 1 chip, 1 host, and N>=2 hosts" — this
is the N>=2-process evidence (SURVEY.md §4 multi-host recipe).

Usage: multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from itrails_tpu.hmm import sharding as hs
    from itrails_tpu.hmm.longseq_sharded import sharded_forward_loglik_long_fn

    # deterministic model + data (same on every process)
    m = 9
    rng = np.random.default_rng(0)
    a = rng.random((m, m))
    a /= a.sum(1, keepdims=True)
    bfull = rng.random((m, 625)) * 0.01 + 1e-4
    pi = rng.random(m)
    pi /= pi.sum()
    a, bfull, pi = jnp.asarray(a), jnp.asarray(bfull), jnp.asarray(pi)

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    n_dev = len(devs)
    w, t = 2 * n_dev, 300
    tokens_np = rng.integers(0, 625, size=(w, t)).astype(np.int32)

    sh = NamedSharding(mesh, P("data", None))
    tokens = jax.make_array_from_callback(
        (w, t), sh, lambda idx: tokens_np[idx]
    )
    repl = NamedSharding(mesh, P())
    a, bfull, pi = (jax.device_put(x, repl) for x in (a, bfull, pi))

    # 1) window-sharded total log-likelihood (one psum over DCN/Gloo)
    ll = float(hs.sharded_loglik_fn(mesh)(a, bfull, pi, tokens))

    # 2) posterior functional: a replicated scalar of the sharded posterior
    from itrails_tpu.hmm import decoders
    import functools

    wvec_np = rng.random((m,))
    wvec = jax.device_put(jnp.asarray(wvec_np), repl)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P()), out_specs=P(),
        check_vma=False,
    )
    def post_stat(a, bfull, pi, tokens, wv):
        post = decoders.posterior(a, bfull, pi, tokens)  # (T, Wl, M)
        return jax.lax.psum(jnp.sum(post * wv), "data")

    ps = float(post_stat(a, bfull, pi, tokens, wvec))

    # 3) ONE long block spanning all processes' devices (all_gather of the
    # per-shard transfer operators)
    long_np = rng.integers(0, 625, size=(8192,)).astype(np.int32)
    chunk = 64
    stream_len = long_np.shape[0] - 1
    unit = chunk * n_dev
    padded = max(-(-stream_len // unit) * unit, unit)
    stream = np.full((padded,), -1, np.int32)
    stream[:stream_len] = long_np[1:]
    stream = stream.reshape(-1, chunk)
    tok_sh = jax.make_array_from_callback(
        stream.shape, sh, lambda idx: stream[idx]
    )
    first = jax.device_put(jnp.asarray(long_np[0], jnp.int32), repl)
    ll_long = float(
        sharded_forward_loglik_long_fn(mesh, chunk)(a, bfull, pi, first, tok_sh)
    )

    # 4) the production optimizer engine (bucketed + long routing) across
    # both processes' devices: BASELINE config 5's mixed whole-genome shape
    from itrails_tpu.optim.optimizer import LoglikEngine

    rng_e = np.random.default_rng(7)
    v_lst = [rng_e.integers(0, 625, size=n).astype(np.int64)
             for n in (150, 5000, 700, 300, 120, 80, 2000, 90)]
    eng = LoglikEngine.__new__(LoglikEngine)  # decode-only: skip the builder
    eng.mesh = mesh
    from itrails_tpu.hmm import longseq_sharded, sharding as hs2, windows

    bucket_idx, long_idx = windows.plan_buckets(
        [len(v) for v in v_lst], n_dev, long_threshold=2000
    )
    eng.buckets = []
    for idxs in bucket_idx:
        toks, _, _ = windows.pack_windows(
            [v_lst[i] for i in idxs], pad_windows_to=n_dev, pad_length_to=128
        )
        eng.buckets.append(jax.make_array_from_callback(
            toks.shape, sh, lambda idx, t=toks: t[idx]
        ))
    eng.long_blocks = []
    eng._loglik = hs2.sharded_loglik_fn(mesh)
    eng._long_fn = None
    import functools as ft

    eng._long_fn = ft.partial(
        longseq_sharded.sharded_forward_loglik_long, mesh=mesh, chunk=64
    )
    # long blocks enter via device_put inside the sharded fn; pass raw
    eng.long_blocks = [jnp.asarray(v_lst[i], jnp.int32) for i in long_idx]
    ll_engine = float(eng._decode(a, bfull, pi))

    with open(out, "w") as f:
        json.dump({"pid": pid, "n_dev": n_dev, "ll": ll, "post_stat": ps,
                   "ll_long": ll_long, "ll_engine": ll_engine}, f)


if __name__ == "__main__":
    main()
