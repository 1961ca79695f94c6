"""Experiment: can REDUCED PRECISION accelerate the M=133 exact Viterbi
(VERDICT r4 item 6 — the one untried avenue after the structural census)?

Premise under test: a cheap low-precision (bf16/int16) max-plus candidate
pass + an exact f32 re-score with fallback could beat the >=100 Mcol/s
target while preserving exact path parity by construction.  The premise
lives or dies on one hardware fact: whether bf16/int16 add+max run FASTER
than f32 on the v5e VPU.  The dense f32 kernel already measures at the
VPU's op-rate ceiling (tools/exp_vo_sweep.py, tools/exp_viterbi_census.py)
— a candidate pass only helps if its per-op cost is lower, because the
max-plus OP COUNT (2 Mp^2 per column) cannot shrink (census: no exact
structure, no exploitable sparsity, pruning windows contain ~all states).

Micro-benchmark: the value-only kernel's exact inner loop — Mp adds + Mp
maxes of (Mp, BW) vectors per column (pallas_viterbi._fwd_kernel_vo's
unrolled 2-D running max, nacc=4 chains) — instantiated at f32, bf16, and
int16 over identical data, T steps, same grid.  Any candidate-pass win
must show up here as raw per-op throughput.

MEASURED RESULT (TPU v5e, Mp=136, BW=512, T=2048, 2026-08-21):

    f32   :  39.11 ms  (baseline)
    bf16  :  38.86 ms  — 1.01x f32: NO speedup.  The v5e VPU computes in
             32-bit lanes; bf16 operands are promoted, so element width
             does not change the op rate (it only halves memory traffic,
             and this kernel is instruction-issue bound, not bandwidth
             bound)
    int16 :  Mosaic COMPILE REJECTION (remote tpu_compile_helper error) —
             the int16 add/max slab pattern does not even legalise on
             this target, let alone run faster

(The micro-kernel's absolute rate is below the tuned production kernel's
— single unblocked call, small BW — but the comparison is controlled:
identical op sequence, only the element dtype differs, so a packed-lane
advantage would necessarily show here.)

Conclusion: the reduced-precision candidate pass CANNOT reach 2x on this
hardware — the pass itself would run at the same op rate as the exact
kernel, so pass + re-score is strictly slower than the dense exact kernel.
Together with the round-4 census (no exact structure to factor, no
sparsity, pruning structurally hopeless on real data), this closes the
M=133 Viterbi >=100 Mcol/s target as UNREACHABLE EXACTLY on v5e: the
dense kernel is at the VPU op-rate ceiling and no precision or structure
lever exists below it.  (On hardware whose VPU packs 2x bf16 lanes, the
two-pass scheme becomes interesting again — the margin analysis in this
file's `margin_bound` note sketches the exactness argument.)

Exactness sketch kept for the record (unused on v5e): bf16 rounding of
(omega + log a) perturbs each candidate by <= 2^-8 relative (~0.06 nats at
the -15..0 range); a bf16 winner whose margin over the runner-up exceeds
2x that bound is provably the f32 argmax, and columns with any
sub-margin decision fall back to the exact kernel.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_viterbi_lowprec.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MP = 136  # Mp at M=133
BW = 512
T = 2048
NACC = 4


def _kernel(om0_ref, lat_ref, out_ref, *, t_steps, dtype):
    lat = lat_ref[:]
    mp = lat.shape[0]

    def maxplus(om):
        accs = [lat[:, k:k + 1] + om[k:k + 1, :] for k in range(NACC)]
        for i in range(NACC, mp):
            k = i % NACC
            accs[k] = jnp.maximum(accs[k], lat[:, i:i + 1] + om[i:i + 1, :])
        while len(accs) > 1:
            accs = [jnp.maximum(accs[k], accs[k + 1])
                    for k in range(0, len(accs) - 1, 2)] + (
                [accs[-1]] if len(accs) % 2 else [])
        return accs[0]

    def step(t, om):
        new = maxplus(om)
        if dtype == jnp.int16:
            # int max-plus: no rescale (fixed point); fold t in to defeat
            # loop-invariant hoisting
            return (new - new[0:1, :]).astype(dtype)
        return (new - jnp.max(new, axis=0, keepdims=True)).astype(dtype)

    om = jax.lax.fori_loop(jnp.int32(0), jnp.int32(t_steps), step,
                           om0_ref[:])
    out_ref[:] = om


def run_one(dtype, reps=3):
    rng = np.random.default_rng(0)
    if dtype == jnp.int16:
        om0 = rng.integers(-2000, 0, size=(MP, BW)).astype(np.int16)
        lat = rng.integers(-2000, 0, size=(MP, MP)).astype(np.int16)
    else:
        om0 = (rng.random((MP, BW)) * -15).astype(dtype)
        lat = (rng.random((MP, MP)) * -15).astype(dtype)

    f = pl.pallas_call(
        functools.partial(_kernel, t_steps=T, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((MP, BW), dtype),
    )
    g = jax.jit(lambda a, b: f(a, b).astype(jnp.float32).sum())
    # fresh inputs per rep: the tunneled backend memoizes repeat calls
    oms = [jnp.asarray(om0) + np.asarray(k + 1, om0.dtype) for k in range(reps + 1)]
    latj = jnp.asarray(lat)
    float(g(oms[0], latj))  # compile
    ts = []
    for k in range(1, reps + 1):
        t0 = time.time()
        float(g(oms[k], latj))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    ops = 2.0 * MP * MP * BW * T  # add+max per (dest, src, lane, step)
    return dt, ops / dt / 1e12


def main():
    print(f"max-plus micro-kernel, Mp={MP} BW={BW} T={T} "
          f"(= {BW * T / 1e6:.1f} Mcol-equivalent per call)")
    base = None
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                        ("int16", jnp.int16)):
        try:
            dt, tops = run_one(dtype)
            if base is None:
                base = dt
            print(f"{name:>6}: {dt * 1e3:8.2f} ms  {tops:6.2f} Tops/s  "
                  f"{base / dt:5.2f}x vs f32")
        except Exception as e:
            print(f"{name:>6}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
