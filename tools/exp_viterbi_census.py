"""Round-4 experiment: is there exploitable *exact* structure in the
133-state transition matrix that a class-factored max-plus Viterbi kernel
(round-3 verdict item 1) could use?  Answer: **no** — measured below.

Context: the dense value-only Viterbi forward is 2*Mp^2 VPU add+max
ops/column and measures at the v5e VPU peak (~4 Tops/s, 54 Mcol/s at
M=133; tools/exp_vo_sweep.py), so only an op-count reduction can reach the
>=100 Mcol/s target.  A class factorisation ``new_k = max_class c
(max_{j in c} omega_j + a_class(c, k))`` needs source states that share
EXACT transition values (exact, because the done-criterion requires exact
path parity with decoders.viterbi, and near-tie argmax decisions flip on
1-ulp differences).

Census of the golden 7x7 model (tests/goldens/model_7x7.npz, the
reference-parity-pinned flagship):

1. **Distinct float64 values**: 12,544 of 17,689 entries (71%).  At 9
   decimals only ~3,376 remain — values *cluster* but are not equal, so
   any class sharing is approximate, not exact.
2. **Duplicate rows/columns**: none (133 distinct rows, 133 distinct
   columns) — no trivial row-class factorisation.
3. **S3 topology-block symmetry** (states (k,i,j), topologies 1/2/3
   exchangeable in the ABC epoch): same-topology diagonal blocks agree
   only to 5.7e-5 relative; V0->Vk blocks differ by 50% across k (the AB
   epoch breaks the symmetry); nothing is bit-exact.  A kernel assuming
   block equality would not be exact.
4. **Sparsity**: zero entries: 0 of 17,689 — nothing to skip statically.
5. **Tropical (max-plus) rank-1 fit** log a[i,j] ~ u_i + v_j: residual
   std ~4 nats (range ~15 nats) — no useful separable structure.
6. **Candidate pruning is structurally hopeless on real data**: after
   each max-plus step the pre-emission scores all lie within
   [min_ij log a, 0] (~14-22 nats, since the omega-max source reaches
   every destination), and a source can only win a switch if its omega is
   within the max per-column log-a spread (~14 nats) of the top.  Low-
   divergence genomic columns give near-uniform emissions across states,
   so nearly ALL states stay inside that window (measured below) — a
   top-K candidate kernel would need K ~ M, and the candidate count is
   data-dependent (SIMD-hostile) besides.

Conclusion: the dense kernel is the exact-parity optimum on this
hardware; the structural escape hatch the verdict hypothesised does not
exist at the exactness level required.  (A ~1.8x *approximate* kernel via
symmetrised blocks would break golden/parity tests and is rejected.)

Run: JAX_PLATFORMS=cpu python tools/exp_viterbi_census.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "goldens", "model_7x7.npz")


def main():
    d = np.load(GOLD)
    a, b, pi, hid = d["a"], d["b"], d["pi"], d["hidden"]
    m = a.shape[0]
    print(f"model: M={m} (7x7 flagship)")

    # 1. distinct values
    print(f"1. distinct float64 entries: {len(np.unique(a))} / {a.size}")
    for sig in (3, 6, 9):
        print(f"   distinct log-values @ {sig} decimals: "
              f"{len(np.unique(np.round(np.log(a), sig)))}")

    # 2. duplicate rows/cols
    rows = len({a[i].tobytes() for i in range(m)})
    cols = len({a[:, j].tobytes() for j in range(m)})
    print(f"2. distinct rows {rows}, distinct cols {cols} (of {m})")

    # 3. S3 block symmetry
    topo = hid[:, 0]
    idx = {k: np.where(topo == k)[0] for k in range(4)}
    blk = lambda r, c: a[np.ix_(idx[r], idx[c])]  # noqa: E731
    d11, d22 = blk(1, 1), blk(2, 2)
    print(f"3. same-topo D11 vs D22 rel diff: "
          f"{np.abs(d11 - d22).max() / np.abs(d11).max():.2e}; "
          f"V0->V1 vs V0->V2 rel diff: "
          f"{np.abs(blk(0, 1) - blk(0, 2)).max() / np.abs(blk(0, 1)).max():.2e}; "
          f"bit-exact D11==D22: {np.array_equal(d11, d22)}")

    # 4. sparsity
    print(f"4. zero entries: {np.sum(a == 0)} / {a.size}; "
          f"min positive {a[a > 0].min():.3e}; "
          f"max offdiag {(a - np.diag(np.diag(a))).max():.3e}; "
          f"min diag {np.diag(a).min():.6f}")

    # 5. additive (tropical rank-1) fit of log a
    la = np.log(a)
    u = np.zeros(m)
    v = np.zeros(m)
    for _ in range(200):
        u = (la - v[None, :]).mean(axis=1)
        v = (la - u[:, None]).mean(axis=0)
    res = la - u[:, None] - v[None, :]
    print(f"5. additive-fit residual: std {res.std():.2f} nats, "
          f"range [{res.min():.2f}, {res.max():.2f}]")

    # 6. candidate census: run the rescaled max-plus recursion and count,
    # per step, sources within the exact switch-pruning window
    # (omega_i >= -max_col_spread).  Tokens: (a) uniform random, (b)
    # low-divergence (all-match 4-mers dominate, like real alignments).
    spread = (la.max(axis=0) - la.min(axis=0)).max()
    print(f"6. max per-column log-a spread: {spread:.2f} nats "
          f"(exact candidate window)")
    lb = np.log(np.maximum(b, 1e-300))
    rng = np.random.default_rng(0)
    # all-match tokens are multiples of 85 in base-4 packing (AAAA..TTTT)
    match_tok = np.array([0, 85, 170, 255])
    for name, toks in (
        ("uniform random", rng.integers(0, 256, size=2000)),
        ("low-divergence (98% match)",
         np.where(rng.random(2000) < 0.98,
                  rng.choice(match_tok, 2000),
                  rng.integers(0, 256, size=2000))),
    ):
        om = np.log(pi) + lb[:, toks[0]]
        om -= om.max()
        counts = []
        for t in toks[1:]:
            om = (om[:, None] + la).max(axis=0)
            om += lb[:, t]
            om -= om.max()
            counts.append(int(np.sum(om >= -spread)))
        counts = np.array(counts)
        print(f"   {name}: candidates/step mean {counts.mean():.0f} "
              f"median {np.median(counts):.0f} p5 "
              f"{np.percentile(counts, 5):.0f} (of {m})")


if __name__ == "__main__":
    main()
