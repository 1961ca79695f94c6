"""Fused Pallas TPU kernel for the HMM forward log-likelihood.

Why a kernel: the XLA ``lax.scan`` decoder (hmm.decoders.forward) spends
~2/3 of its time in the per-step emission *gather* ``bfull.T[tokens_t]`` —
TPUs have no vector gather, so XLA lowers it to a slow per-element loop —
and the rest streaming the (W, M) alpha carry through HBM every step.
This kernel removes both costs:

* the token -> emission-row lookup runs on the MXU as a one-hot matmul.
  The (K=640, BW) one-hot is built in VMEM from an iota compare and is
  consumed immediately — it never touches HBM.  The emission table is
  split into three stacked bf16 tables (split_bf16, integer-masked so XLA
  cannot elide the round-trip) so a single bf16 matmul with f32
  accumulation reconstructs the f32 table bit-exactly;
* the alpha carry lives in a VMEM scratch that persists across the
  sequential grid, so per-step HBM traffic is 4 bytes/column (the token).

The recurrence is the Rabiner-scaled linear-space forward (alpha
renormalised to sum 1 every step, log-norms accumulated), which is
algebraically identical to the reference's max-shift log-space recursion
(reference optimizer.py:165-188) but needs one log per *window* per step
instead of two exp/log sweeps over (W, M).

Layout is transposed (states on sublanes, windows on lanes) so the
per-step token slice is a cheap dynamic sublane index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from itrails_tpu.data.tokens import PAD_TOKEN

__all__ = ["forward_loglik_fused", "forward_fused", "posterior_fused",
           "supported"]

_K = 625  # alphabet size
_KP = 640  # padded to a lane multiple
_KB = 256  # unambiguous base-column count (multi-hot contraction width)
# VMEM cap (MB) for one (tc, Mp, BW) posterior alpha/gamma pipeline
# buffer; with ~16 MB of VMEM/core the backward pass keeps 4 such
# buffers.  2.0 (tc=8 at the default block) measured as fast as deeper
# chunks — the kernels are instruction-issue bound, so VMEM is better
# spent on window-block WIDTH than chunk depth (tools/exp_post_phases.py)
_POST_BLOCK_MB = 2.0
# time-chunk floor: tc below 8 is legal (the tiled dims of a 3-D block
# are the last two) and the kernels are instruction-issue bound, so a
# WIDER window block at a shallower chunk is a net win — tc=1 lets the
# M=133 posterior run 2048-lane blocks (51.5 -> 95.0 Mcol/s measured)
_POST_TC_MIN = 1
# integer type of the one-hot iota compare.  int16 would pack 2-per-lane,
# but v5e Mosaic supports neither 16-bit iota ("16-bit iota not supported
# by hardware") nor 16-bit cmpi ("Target does not support this
# comparison") — measured on-chip, so the compare stays i32
_OH_ITYPE = jnp.int32


def _fwd_block_w(mp: int, w: int, block_w: int) -> int:
    """Window-block width for the forward kernel, capped by a per-column
    VMEM model (one-hot temp 640*2 B + alpha scratches mp*8 B + emission
    matmul temp 3*mp*4 B per lane): mp=136 at 4096 lanes crashes the
    Mosaic compile helper; 2048 compiles and runs at 212 Mcol/s."""
    per_lane = 640 * 2 + mp * 8 + 3 * mp * 4
    cap = 12 * 2**20 // per_lane
    pow2 = 128
    while pow2 * 2 <= cap:
        pow2 *= 2
    return min(block_w, pow2, _round_up(w, 128))


def _post_block_w(mp: int, w: int, block_w: int) -> int:
    """Window-block width for the posterior kernels: the requested
    ``block_w`` capped so one (tc=1, mp, bw) f32 stream buffer stays
    within ``_POST_BLOCK_MB`` — then the 6 live double-buffered streams
    total <= ~12 MB, below the ~13.4 MB region that crashes the Mosaic
    compile helper (power-of-two cap keeps wp padding minimal)."""
    cap = int(_POST_BLOCK_MB * 2**20) // (mp * 4)
    pow2 = 128
    while pow2 * 2 <= cap:
        pow2 *= 2
    return min(block_w, pow2, _round_up(w, 128))


def supported(platform: str | None = None) -> bool:
    """True when the fused kernel can run compiled (TPU backend)."""
    if platform is None:
        platform = jax.default_backend()
    return platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def split_bf16(table, parts: int = 3):
    """Split an f32 table into ``parts`` stacked bf16 tables whose f32 sum
    reproduces it EXACTLY (for parts=3).  Stacked along axis 0 so one
    one-hot matmul evaluates all parts; the one-hot operand is exactly
    representable, so the reconstruction is bit-exact f32.

    The split is done by integer masking, NOT by ``x - bf16(x)`` casts: on
    TPU, XLA's excess-precision rule elides f32->bf16->f32 round-trips, so
    the cast formulation silently computes zero residuals on hardware
    (verified on v5e) and the table degrades to single-bf16 precision.
    Masking the low 16 bits of the f32 yields the exact bf16 truncation
    (f32's top 16 bits ARE the bf16 layout); each part then holds 8
    disjoint significand bits, so hi+mid+lo == x exactly in f32.
    """
    f32 = jnp.float32
    chunks = []
    resid = table.astype(f32)
    for _ in range(parts - 1):
        bits = jax.lax.bitcast_convert_type(resid, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), f32
        )
        chunks.append(hi.astype(jnp.bfloat16))  # exact: already bf16-valued
        resid = resid - hi  # exact: removes the top 8 significand bits
    chunks.append(resid.astype(jnp.bfloat16))  # exact: <=8 bits left
    return jnp.concatenate(chunks, axis=0)


def _sum_parts(e2, mp: int, parts: int):
    out = e2[:mp]
    for k in range(1, parts):
        out = out + e2[k * mp:(k + 1) * mp]
    return out


def _tok_slice(tok_ref, t):
    """(1, BW) token row at chunk-local step ``t``.  The posterior path
    streams tokens as (tc, 1, BW) blocks — a 2-D (tc, BW) block would pin
    tc to a multiple of 8, and the posterior kernels run tc down to 1 to
    afford wider window blocks."""
    if tok_ref.ndim == 3:
        return tok_ref[pl.ds(t, 1), 0, :]
    return tok_ref[pl.ds(t, 1), :]


def split2_bf16_2d(x):
    """(R, C) f32 -> hi/lo bf16 pair whose f32 sum carries the top 16
    significand bits of ``x`` (integer-masked: Mosaic/XLA cannot elide it,
    and both halves are exactly representable in bf16)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _make_transition(trans: str, at, mp: int):
    """Per-step transition contraction closure, (Mp, BW) f32 alpha ->
    (Mp, BW) f32 ``a.T @ alpha``.

    highest: one f32 dot at Precision.HIGHEST — Mosaic lowers it to the
    6-pass bf16 decomposition (full f32 fidelity).  At M=133 those 6
    passes are ~40% of the kernel's MXU work.

    split3: manual 3-pass variant.  ``at`` arrives pre-split as a stacked
    (2Mp, Mp) bf16 [hi; lo]; alpha is split per step with the same
    integer-masked bf16 halving.  hh + lh come out of ONE stacked matmul,
    hl from a second — 3 Mp^2 MXU passes instead of 6, dropping only the
    lo*lo term (~2^-32 relative).  Each operand carries 16 significand
    bits, so per-element error is ~1e-5 relative with random sign; over a
    full chromosome the measured total-loglik deviation is ~1e-7 relative
    (tools/exp_fwd_precision.py), the same order as f32-scan-vs-f64."""
    if trans == "split3":
        def tr(al):
            al_h, al_l = split2_bf16_2d(al)
            both = jnp.dot(at, al_h, preferred_element_type=jnp.float32)
            hl = jnp.dot(at[:mp], al_l,
                         preferred_element_type=jnp.float32)
            return both[:mp] + both[mp:] + hl
    else:
        def tr(al):
            return jnp.dot(at, al, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return tr


def _make_emission(multihot: bool, btcat, bw: int, mp: int, parts: int = 3):
    """Per-step emission-row closure, (1, BW) tokens -> (Mp, BW) f32.

    onehot: token-id == iota one-hot over the KP=640 alphabet, times the
    triple-bf16 split of the FULL (ambiguity-aggregated) table — rows are
    bit-exact f32 table values.

    multihot: tokens arrive as 3-bit-per-position symbol codes
    (data.tokens.token_bit_codes); the ambiguity-resolution multi-hot over
    the 256 unambiguous columns is built in-register from shift/and digit
    compares (N == digit 4 matches everything), and one (3Mp, 256) x
    (256, BW) bf16 matmul against the split BASE table both looks up and
    aggregates — 2.5x fewer MXU FLOPs than onehot.  For unambiguous tokens
    (the bulk of real alignments) the row is the same bit-exact f32 value;
    for N-containing tokens the sum is accumulated on the MXU instead of
    in the XLA table-build matmul, so values agree to f32 roundoff
    (~1e-7 relative) rather than bitwise."""
    if multihot:
        # half-split construction: column index c = cH*16 + cL with cH/cL
        # the base-4 codes of the first/last two positions, so the (256, BW)
        # multi-hot is an outer product of two (16, BW) half-matches —
        # ~500 VPU ops/column instead of ~3000 for the direct 4-digit form
        hio = jax.lax.broadcasted_iota(jnp.int32, (16, bw), 0)
        ha, hb = hio >> 2, hio & 3

        def em(tok):
            d0, d1 = tok & 7, (tok >> 3) & 7
            d2, d3 = (tok >> 6) & 7, (tok >> 9) & 7
            qh = ((d0 == ha) | (d0 == 4)) & ((d1 == hb) | (d1 == 4))
            ql = ((d2 == ha) | (d2 == 4)) & ((d3 == hb) | (d3 == 4))
            q = (jnp.repeat(qh.astype(jnp.bfloat16), 16, axis=0)
                 * jnp.tile(ql.astype(jnp.bfloat16), (16, 1)))
            e2 = jnp.dot(btcat, q, preferred_element_type=jnp.float32)
            return _sum_parts(e2, mp, parts)
    else:
        kio = jax.lax.broadcasted_iota(_OH_ITYPE, (_KP, bw), 0)

        def em(tok):
            # the (KP, BW) compare is the kernels' single largest VPU cost
            oh = (tok.astype(_OH_ITYPE) == kio).astype(jnp.bfloat16)
            e2 = jnp.dot(btcat, oh, preferred_element_type=jnp.float32)
            return _sum_parts(e2, mp, parts)

    return em


def _kernel(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref,
            ll_ref, alf_ref, al_s, acc_s, *, mp: int, chunk_t: int,
            multihot: bool = False, parts: int = 3,
            trans: str = "highest", al_all_ref=None, e_all_ref=None,
            need_ll: bool = True):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        al_s[:] = al0_ref[:]
        acc_s[:] = acc0_ref[:]

    btcat = btcat_ref[:]  # (3*Mp, KP|KB) bf16 (hi/mid/lo residual split)
    at = at_ref[:]  # transition transposed: (Mp, Mp) f32 | (2Mp, Mp) bf16

    bw = tok_ref.shape[1]
    em = _make_emission(multihot, btcat, bw, mp, parts)
    tr = _make_transition(trans, at, mp)

    def step(t, carry):
        al, acc = carry
        tok = _tok_slice(tok_ref, t)  # (1, BW)
        e = em(tok)  # (Mp, BW) f32 emission rows
        nx = tr(al) * e
        s = jnp.sum(nx, axis=0, keepdims=True)  # (1, BW)
        pad = tok == PAD_TOKEN
        snz = jnp.where(pad, 1.0, s)
        al = jnp.where(pad, al, nx / snz)
        if need_ll:
            # the per-step log is only needed for the loglik output; the
            # posterior path (gammas normalise per column, scale factors
            # cancel) skips the transcendental
            acc = acc + jnp.where(pad, 0.0, jnp.log(snz))
        if al_all_ref is not None:
            al_all_ref[pl.ds(t, 1), :, :] = al[None]
        if e_all_ref is not None:
            # stored for the backward pass: rebuilding the (KP, BW)
            # one-hot + emission matmul there was over half its
            # instruction-issue cost (the kernels' bottleneck)
            e_all_ref[pl.ds(t, 1), :, :] = e[None]
        return al, acc

    # int32 bounds keep the induction variable i32 under jax_enable_x64
    # (an i64 index fails Mosaic legalization).  NB: unrolling this loop
    # was measured to change nothing (Mosaic already overlaps the
    # carry-independent emission matmuls); throughput scales with the
    # window-block WIDTH instead — the kernel is instruction-issue bound
    al, acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(chunk_t), step, (al_s[:], acc_s[:])
    )
    al_s[:] = al
    acc_s[:] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        ll_ref[:] = acc_s[:]
        alf_ref[:] = al_s[:]


def _model_tensors(a, bfull, mp: int, m: int, multihot: bool,
                   parts: int = 3, trans: str = "highest"):
    """Padded transposed transition + split emission table for the fused
    kernels (multihot: the (Mp, 256) BASE table; onehot: the full (Mp, KP)
    aggregated table).  trans="split3": the transition ships pre-split as
    a stacked (2Mp, Mp) bf16 [hi; lo] pair (see _make_transition)."""
    f32 = jnp.float32
    at = jnp.zeros((mp, mp), f32).at[:m, :m].set(a.T.astype(f32))
    if trans == "split3":
        hi, lo = split2_bf16_2d(at)
        at = jnp.concatenate([hi, lo], axis=0)
    if multihot:
        bt = jnp.zeros((mp, _KB), f32).at[:m, :].set(
            bfull[:, :_KB].astype(f32)
        )
    else:
        bt = jnp.zeros((mp, _KP), f32).at[:m, :_K].set(bfull.astype(f32))
    return at, split_bf16(bt, parts)


def _token_stream(tokens, multihot: bool):
    """(W, T) token ids -> the kernel token stream (bit codes when
    multihot; PAD passes through as -1)."""
    if not multihot:
        return tokens
    from itrails_tpu.data.tokens import token_bit_codes

    codes = jnp.asarray(token_bit_codes())
    return jnp.where(tokens < 0, tokens, codes[jnp.maximum(tokens, 0)])


@functools.partial(
    jax.jit,
    static_argnames=("block_w", "chunk_t", "interpret", "emission",
                     "table_parts", "trans"),
)
def forward_fused(a, bfull, pi, tokens, *, block_w: int = 4096,
                  chunk_t: int = 128, interpret: bool = False,
                  emission: str = "onehot", table_parts: int = 3,
                  trans: str = "highest"):
    """Scaled-linear forward pass.

    Args:
      a: (M, M) row-stochastic transition matrix.
      bfull: (M, 625) emission table over the full alphabet.
      pi: (M,) initial distribution.
      tokens: (W, T) int32, right-padded with PAD_TOKEN.
      emission: "onehot" (default; bit-exact table rows) or "multihot"
        (2.5x fewer emission MXU FLOPs but VPU-bound building the
        multi-hot: measured ~2x SLOWER on v5e — tools/exp_m133_fwd.py;
        kept for the record).
      table_parts: 3 (default; bit-exact f32 emission rows) or 2 (top 16
        significand bits; ~1e-7 relative total-loglik deviation, ~15%
        faster — tools/exp_fwd_precision.py).
      trans: "highest" (default; 6-pass f32 transition matmul) or
        "split3" (manual 3-pass, ~1e-7 relative total deviation — see
        _make_transition).

    Returns:
      (alpha, loglik): alpha (W, M) — the *normalised* linear-space final
      state distribution (sum 1 per window) — and loglik (W,) per-window
      log-likelihoods.  ``log alpha_unnorm = log(alpha) + loglik[:, None]``
      recovers the log-space alpha of decoders.forward.
    """
    m = a.shape[0]
    w, t_len = tokens.shape
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32
    multihot = emission == "multihot"
    kb = _KB if multihot else _KP

    at, btcat = _model_tensors(a, bfull, mp, m, multihot, table_parts,
                               trans)

    bw = _fwd_block_w(mp, w, block_w)
    wp = _round_up(w, bw)

    # step 0 on the XLA side (one cheap (W,) gather), steps 1..T-1 fused
    tok0 = tokens[:, 0]
    e0 = bfull.T.astype(f32)[jnp.maximum(tok0, 0)]  # (W, M)
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.ones_like(e0), e0)
    al0 = pi[None, :].astype(f32) * e0
    s0 = jnp.sum(al0, axis=1)
    al0 = al0 / s0[:, None]
    acc0 = jnp.log(s0)
    al0_p = jnp.zeros((mp, wp), f32).at[:m, :w].set(al0.T)
    al0_p = al0_p.at[0, w:].set(1.0)  # pad windows: valid distribution
    acc0_p = jnp.zeros((1, wp), f32).at[0, :w].set(acc0)

    tc = chunk_t
    rest = _token_stream(tokens[:, 1:], multihot)
    tp = max(_round_up(rest.shape[1], tc), tc)
    tok_t = jnp.full((tp, wp), PAD_TOKEN, jnp.int32)
    tok_t = tok_t.at[: rest.shape[1], :w].set(rest.T.astype(jnp.int32))

    grid = (wp // bw, tp // tc)
    # NB: index maps return i*0 (not the literal 0) so the constant stays
    # int32 under jax_enable_x64 — an i64 index fails Mosaic legalization.
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731
    ll, alf = pl.pallas_call(
        functools.partial(
            _kernel, mp=mp, chunk_t=tc, multihot=multihot,
            parts=table_parts, trans=trans,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bw), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((table_parts * mp, kb), zz,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((2 * mp if trans == "split3" else mp), mp), zz,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, wp), f32),
            jax.ShapeDtypeStruct((mp, wp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp, bw), f32),
            pltpu.VMEM((1, bw), f32),
        ],
        interpret=interpret,
    )(tok_t, al0_p, acc0_p, btcat, at)
    return alf[:m, :w].T, ll[0, :w]


def forward_loglik_fused(a, bfull, pi, tokens, **kw):
    """Total log-likelihood of a (W, T) token batch via the fused kernel.
    The per-window values are summed in f64 (when x64 is on): a genome-
    scale total is ~1e6 nats where one f32 ULP is 0.125 — coarse enough
    to quantize away a short optimizer step's true improvement (see
    pallas_grad.loglik_and_grads_fused)."""
    _, ll = forward_fused(a, bfull, pi, tokens, **kw)
    return jnp.sum(ll.astype(jnp.float64))


def _kernel_alpha(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref,
                  ll_ref, alf_ref, al_all_ref, e_all_ref, al_s, acc_s, *,
                  mp: int, chunk_t: int, parts: int = 3,
                  trans: str = "highest", need_ll: bool = True):
    _kernel(tok_ref, al0_ref, acc0_ref, btcat_ref, at_ref, ll_ref, alf_ref,
            al_s, acc_s, mp=mp, chunk_t=chunk_t, al_all_ref=al_all_ref,
            e_all_ref=e_all_ref, parts=parts, trans=trans, need_ll=need_ll)


def _bwd_kernel(tok_ref, al_ref, e_ref, at_ref, gam_ref, bef_ref, be_s,
                *, mp: int, chunk_t: int, parts: int = 3,
                trans: str = "highest"):
    """Reverse sweep: fused reference-convention backward recursion
    (beta'[j] = sum_i a[i, j] (e * beta)[i], decoders.backward NOTE) and
    posterior combine gamma_t = normalize(alpha_t * beta_t).  Scale factors
    of the Rabiner-normalised alpha and the per-step-normalised beta cancel
    in the normalisation, so no logs are needed anywhere.

    Emission rows arrive pre-computed from the forward pass (e_ref):
    rebuilding them here (one-hot iota compare + MXU matmul) was over half
    of this kernel's instruction issue, the measured bottleneck
    (tools/exp_post_phases.py); streaming them costs only HBM bandwidth,
    which was <5% utilised.  Tokens are still streamed for the pad mask."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        be_s[:] = jnp.ones_like(be_s)

    at = at_ref[:]
    tr = _make_transition(trans, at, mp)

    def step(k, be):
        t = chunk_t - 1 - k
        tok = _tok_slice(tok_ref, t)  # (1, BW)
        al_t = al_ref[t]  # (Mp, BW)
        g = al_t * be
        s = jnp.sum(g, axis=0, keepdims=True)
        gam_ref[pl.ds(t, 1), :, :] = (g / jnp.where(s > 0, s, 1.0))[None]

        e = e_ref[t]  # (Mp, BW) forward-stored emission rows
        nx = tr(be * e)
        sn = jnp.sum(nx, axis=0, keepdims=True)
        nx = nx / jnp.where(sn > 0, sn, 1.0)
        pad = tok == PAD_TOKEN
        return jnp.where(pad, be, nx)

    be = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_t), step, be_s[:])
    be_s[:] = be

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        bef_ref[:] = be_s[:]


@functools.partial(
    jax.jit, static_argnames=("block_w", "chunk_t", "interpret",
                              "table_parts", "trans", "layout")
)
def posterior_fused(a, bfull, pi, tokens, *, block_w: int = 4096,
                    chunk_t: int = 128, interpret: bool = False,
                    table_parts: int = 3, trans: str = "highest",
                    layout: str = "twm"):
    """Posterior state probabilities, (T, W, M) — same contract as
    decoders.posterior (padded steps are garbage; mask with
    ``tokens != PAD_TOKEN``).  Two fused kernels: the forward pass storing
    every normalised alpha, then a reverse-grid backward pass emitting
    gamma directly.  table_parts/trans as in forward_fused (the fast
    dispatch runs 2/"split3": gammas normalise per column, so the ~1e-6
    relative value error does not accumulate).

    HBM footprint: the forward pass streams BOTH the normalised alphas
    and the emission rows to HBM — two (T, Mp, Wp) f32 tensors (~2x the
    alpha-only residency; the emission store bought ~2x backward-pass
    throughput, see the e_all_ref comment in _fwd_store_kernel).  Budget
    ~8 * T * Mp * Wp bytes: at M=133 a (2048, 8192) batch is ~18 GB —
    size the batch (or shrink block_w) to HBM accordingly.

    Returns
    -------
    layout="twm" (default): (T, W, M) f32 posterior probabilities.
    layout="tmw": (T, M, W) — the raw kernel layout, skipping a
        full-HBM-round-trip transpose; use when the consumer can reduce
        state-major gammas directly.
    layout="fwdonly": scalar f32 — timing diagnostic only (forward +
        alpha-store pass alone; the value is the total loglik plus one
        stored alpha entry so the store cannot be elided).
    """
    if layout not in ("twm", "tmw", "fwdonly"):
        raise ValueError(f"unknown layout {layout!r}: "
                         "expected 'twm', 'tmw' or 'fwdonly'")
    m = a.shape[0]
    w, t_len = tokens.shape
    mp = _round_up(max(m, 8), 8)
    f32 = jnp.float32

    at = jnp.zeros((mp, mp), f32).at[:m, :m].set(a.T.astype(f32))
    if trans == "split3":
        hi, lo = split2_bf16_2d(at)
        at = jnp.concatenate([hi, lo], axis=0)
    bt = jnp.zeros((mp, _KP), f32).at[:m, :_K].set(bfull.astype(f32))
    btcat = split_bf16(bt, table_parts)
    atsub = 2 * mp if trans == "split3" else mp

    bw = _post_block_w(mp, w, block_w)
    wp = _round_up(w, bw)
    # the backward kernel holds two (tc, Mp, BW) f32 block streams (alpha
    # in, gamma out), each double-buffered: 4 live buffers + tables must
    # fit VMEM — _POST_BLOCK_MB caps each block (the original 1.75 MB cap
    # left half of VMEM idle; columns-per-grid-step scales with it), and
    # _post_block_w has already shrunk bw so the tc=8 floor fits
    tc = min(chunk_t,
             max(_POST_TC_MIN,
                 (int(_POST_BLOCK_MB * 2**20) // (mp * bw * 4))
                 // _POST_TC_MIN * _POST_TC_MIN))

    tok0 = tokens[:, 0]
    e0 = bt[:m, :_K].T[jnp.maximum(tok0, 0)]
    e0 = jnp.where((tok0 == PAD_TOKEN)[:, None], jnp.ones_like(e0), e0)
    al0 = pi[None, :].astype(f32) * e0
    s0 = jnp.sum(al0, axis=1)
    al0 = al0 / s0[:, None]
    al0_p = jnp.zeros((mp, wp), f32).at[:m, :w].set(al0.T)
    al0_p = al0_p.at[0, w:].set(1.0)
    acc0_p = jnp.zeros((1, wp), f32).at[0, :w].set(jnp.log(s0))

    rest = tokens[:, 1:]
    tp = max(_round_up(rest.shape[1], tc), tc)
    tok_t = jnp.full((tp, wp), PAD_TOKEN, jnp.int32)
    tok_t = tok_t.at[: rest.shape[1], :w].set(rest.T.astype(jnp.int32))
    tok_t = tok_t[:, None, :]  # (tp, 1, wp): see _tok_slice

    grid = (wp // bw, tp // tc)
    n_j = tp // tc
    zi = lambda i, j: (i * 0, i)  # noqa: E731
    zz = lambda i, j: (i * 0, i * 0)  # noqa: E731

    _ll, _alf, al_all, e_all = pl.pallas_call(
        functools.partial(_kernel_alpha, mp=mp, chunk_t=tc,
                          parts=table_parts, trans=trans,
                          need_ll=(layout == "fwdonly")),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, 1, bw), lambda i, j: (j, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((table_parts * mp, _KP), zz,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((atsub, mp), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, mp, bw), lambda i, j: (j, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, mp, bw), lambda i, j: (j, i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, wp), f32),
            jax.ShapeDtypeStruct((mp, wp), f32),
            jax.ShapeDtypeStruct((tp, mp, wp), f32),
            jax.ShapeDtypeStruct((tp, mp, wp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp, bw), f32),
            pltpu.VMEM((1, bw), f32),
        ],
        interpret=interpret,
    )(tok_t, al0_p, acc0_p, btcat, at)

    if layout == "fwdonly":  # diagnostic: forward+store pass alone
        return jnp.sum(_ll[0, :w]) + al_all[0, 0, 0]

    rev = lambda i, j: (i * 0 + n_j - 1 - j, i)  # noqa: E731
    rev3 = lambda i, j: (i * 0 + n_j - 1 - j, i * 0, i)  # noqa: E731
    gam, be0 = pl.pallas_call(
        functools.partial(_bwd_kernel, mp=mp, chunk_t=tc,
                          parts=table_parts, trans=trans),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, 1, bw), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, mp, bw), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, mp, bw), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((atsub, mp), zz, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, mp, bw), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bw), zi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, mp, wp), f32),
            jax.ShapeDtypeStruct((mp, wp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((mp, bw), f32)],
        interpret=interpret,
    )(tok_t, al_all, e_all, at)

    # column 0 on the XLA side: gamma_0 = normalize(al0 * be_0)
    g0 = al0_p[:m, :w] * be0[:m, :w]  # (M, W)
    g0 = g0 / jnp.maximum(jnp.sum(g0, axis=0, keepdims=True), 1e-38)
    n_real = rest.shape[1]
    if layout == "tmw":
        # raw kernel layout, (T, M, W): skips a full-HBM-round-trip
        # transpose — use when the consumer can reduce/consume
        # state-major gammas directly
        return jnp.concatenate([g0[None], gam[:n_real, :m, :w]], axis=0)
    post = jnp.concatenate(
        [g0.T[None], jnp.transpose(gam[:n_real, :m, :w], (0, 2, 1))], axis=0
    )
    return post
