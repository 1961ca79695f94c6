"""Introgression (migration) model: B -> C admixture at time ``t_m`` before
the first speciation.

The reference implements this with a separate table-driven engine
(int_get_joint_prob_mat.py, int_get_tab.py, ~3000 lines, ray pools and
CSV-loaded state spaces).  Here it is a *configuration* of the unified
engine: backwards in time each B lineage independently migrates to the C
population with probability ``m`` at the admixture event, so the epoch
between migration and the second speciation runs four parallel two-locus
chains —

  * AB  (15 states):  A + both B loci that stayed,
  * BC  (15 states):  C + both B loci that migrated,
  * AB-miss (5 states x 2): A + a single B locus (the other migrated),
  * BC-miss (5 states x 2): C + a single B locus,

and the per-locus *fate* (deep / V0 coalescence with A in AB interval i /
introgressed coalescence with C in BC interval i) is tracked with masked
interval products (reference int_get_tab.py:132-760).  At the second
speciation the chains' finals are mixed into the 203-state ABC space per
fate pair (reference mix_probs, int_get_tab.py:17-129) and the deep epoch
runs through the same compiled ABC plan as the plain model (with the extra
topology code 4 = introgressed, omega class 6).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from itrails_tpu.core.ctmc import run_abc_stage
from itrails_tpu.core.expm import expm_batch
from itrails_tpu.core.schedule import Plan, fate_list
from itrails_tpu.core.statespace import (
    combine_partitions_map,
    combine_to_abc,
    partial_state_space,
    state_space,
)

__all__ = ["int_joint_matrix"]

A, B, C = 0, 1, 2


def _rate(space, coal, rho, dtype):
    q = coal * jnp.asarray(space.coal_pattern, dtype) + rho * jnp.asarray(
        space.rho_pattern, dtype
    )
    return q - jnp.diag(jnp.sum(q, axis=1))


def _full_masks(n_int):
    """Boundary class masks for a 15-state chain: for each joint fate
    (fl, fr) over {deep(-1)} + intervals, and each boundary k=1..n, the
    allowed omega class (left-done(k), right-done(k))."""
    sp2 = state_space(2)
    omegas = {
        (False, False): sp2.omega_masks[(0, 0)],
        (True, False): sp2.omega_masks[(3, 0)],
        (False, True): sp2.omega_masks[(0, 3)],
        (True, True): sp2.omega_masks[(3, 3)],
    }
    fates = [-1] + list(range(n_int))
    patterns = []
    for fl in fates:
        for fr in fates:
            rows = []
            for k in range(1, n_int + 1):
                ld = fl != -1 and k > fl
                rd = fr != -1 and k > fr
                rows.append(omegas[(ld, rd)])
            patterns.append(np.stack(rows))
    return np.stack(patterns).astype(np.float64)  # (F2, n, 15)


def _miss_masks(space, locus, n_int):
    """Boundary masks for a 5-state missing-lineage chain: single fate on
    the B-carrying locus."""
    coal = space.coalesced_mask(locus)
    nocoal = ~coal
    patterns = []
    for f in [-1] + list(range(n_int)):
        rows = []
        for k in range(1, n_int + 1):
            rows.append(coal if (f != -1 and k > f) else nocoal)
        patterns.append(np.stack(rows))
    return np.stack(patterns).astype(np.float64)  # (F1, n, 5)


def _chain(pi, expms, masks):
    """Masked interval products: G[f] = pi * prod_k (E_k then mask_k[f])
    (reference get_AB_precomp + get_ordered, get_tab.py:35-54)."""
    g = jnp.broadcast_to(pi[None, :], (masks.shape[0], pi.shape[0]))
    for k in range(masks.shape[1]):
        g = (g @ expms[k]) * masks[:, k]
    return g


def _single_to_partial_map(single_space_first, partial, first_species,
                           single_locus_species):
    """Map (2-state single-sequence chain of species X) x (a lone single-locus
    lineage of species Y) into a partial space: one-hot (S_partial, 2)."""
    out = np.zeros((partial.n_states, 2), dtype=np.float64)
    # slots of the partial space in order left..right; build the merged
    # partition: X linked (1,1) or split (1,2) plus the lone Y lineage.
    lay = [(0, s) for s in partial.left] + [(1, s) for s in partial.right]
    for idx, x_state in enumerate([(1, 1), (1, 2)]):
        labels = []
        for locus, sp in lay:
            if sp == first_species:
                labels.append(x_state[locus])
            else:
                labels.append(99)  # the lone single-locus lineage
        from itrails_tpu.core.statespace import canonical

        out[partial.index[canonical(labels)], idx] = 1.0
    return out


def int_joint_matrix(
    plan: Plan,
    *,
    t_A, t_B, t_C, t_AB, t_m,
    coal_A, coal_B, coal_C, coal_AB, coal_BC, coal_ABC,
    rho, m,
    cut_AB, cut_ABC,
    dtype=jnp.float64,
):
    """Joint hidden-state probability matrix for the introgression model
    (reference get_joint_prob_mat_introgression, int_get_joint_prob_mat.py:
    16-263).  All times in coalescent units; ``t_B``/``t_C`` run from the
    present to the migration event."""
    n_int = plan.n_int_AB
    sp1 = state_space(1)
    sp2 = state_space(2)
    ab_miss_l = partial_state_space((A, B), (A,))
    ab_miss_r = partial_state_space((A,), (A, B))
    bc_miss_l = partial_state_space((B, C), (C,))
    bc_miss_r = partial_state_space((C,), (B, C))

    cut_AB = jnp.asarray(cut_AB, dtype)
    dt_ab = cut_AB[1:] - cut_AB[:-1]
    dt_bc = jnp.concatenate([dt_ab[:1] + t_m, dt_ab[1:]])

    q_a = _rate(sp1, coal_A, rho, dtype)
    q_b = _rate(sp1, coal_B, rho, dtype)
    q_c = _rate(sp1, coal_C, rho, dtype)
    q_ab = _rate(sp2, coal_AB, rho, dtype)
    q_bc = _rate(sp2, coal_BC, rho, dtype)
    q_abm = _rate(ab_miss_l, coal_AB, rho, dtype)  # same pattern both blocks
    q_abm_r = _rate(ab_miss_r, coal_AB, rho, dtype)
    q_bcm = _rate(bc_miss_l, coal_BC, rho, dtype)
    q_bcm_r = _rate(bc_miss_r, coal_BC, rho, dtype)

    start = sp1.index[(1, 1)]
    singles = expm_batch(jnp.stack([
        q_a * t_A, q_b * t_B, q_c * t_C, q_a * (t_A + t_AB),
        q_c * (t_C + t_m + t_AB), q_b * t_m,
    ]))
    f_a = singles[0][start]
    f_b = singles[1][start]
    f_c = singles[2][start]
    f_a_bis = singles[3][start]
    f_c_bis = singles[4][start]
    e_b_tm = singles[5]

    # ---- migration split (reference split_migration, :266-303) ----
    x = f_b[sp1.index[(1, 2)]]
    linked = f_b[start]
    half = 0.5 * (1.0 - m) * m * x
    w_left = jnp.stack([(1.0 - x) * (1.0 - m), (1.0 - m) ** 2 * x, half, half])
    w_right = jnp.stack([(1.0 - x) * m, x * m**2, half, half])

    # ---- initial vectors of the four chains ----
    combine2 = jnp.asarray(combine_partitions_map(1, 1), dtype)  # (15, 2, 2)
    b_left_full = jnp.stack([w_left[0], w_left[1]]) @ e_b_tm
    pi_ab = jnp.einsum("i,j,mij->m", f_a, b_left_full, combine2)
    b_right_full = jnp.stack([w_right[0], w_right[1]])
    pi_bc = jnp.einsum("i,j,mij->m", b_right_full, f_c, combine2)

    abm_l_map = jnp.asarray(
        _single_to_partial_map(sp1, ab_miss_l, A, B), dtype
    )  # (5, 2): A-state -> partial with lone B_l
    abm_r_map = jnp.asarray(_single_to_partial_map(sp1, ab_miss_r, A, B), dtype)
    bcm_l_map = jnp.asarray(_single_to_partial_map(sp1, bc_miss_l, C, B), dtype)
    bcm_r_map = jnp.asarray(_single_to_partial_map(sp1, bc_miss_r, C, B), dtype)
    pi_abm_l = (abm_l_map @ f_a) * w_left[2]
    pi_abm_r = (abm_r_map @ f_a) * w_left[3]
    pi_bcm_l = (bcm_l_map @ f_c) * w_right[2]
    pi_bcm_r = (bcm_r_map @ f_c) * w_right[3]

    # ---- interval propagators ----
    e_ab = expm_batch(q_ab[None] * dt_ab[:, None, None])
    e_bc = expm_batch(q_bc[None] * dt_bc[:, None, None])
    e_abm_l = expm_batch(q_abm[None] * dt_ab[:, None, None])
    e_abm_r = expm_batch(q_abm_r[None] * dt_ab[:, None, None])
    e_bcm_l = expm_batch(q_bcm[None] * dt_bc[:, None, None])
    e_bcm_r = expm_batch(q_bcm_r[None] * dt_bc[:, None, None])

    # ---- fate-pattern finals per chain ----
    full_masks = jnp.asarray(_full_masks(n_int), dtype)  # (F2, n, 15)
    g_ab = _chain(pi_ab, e_ab, full_masks)
    g_bc = _chain(pi_bc, e_bc, full_masks)
    g_abm_l = _chain(pi_abm_l, e_abm_l,
                     jnp.asarray(_miss_masks(ab_miss_l, 0, n_int), dtype))
    g_abm_r = _chain(pi_abm_r, e_abm_r,
                     jnp.asarray(_miss_masks(ab_miss_r, 1, n_int), dtype))
    g_bcm_l = _chain(pi_bcm_l, e_bcm_l,
                     jnp.asarray(_miss_masks(bc_miss_l, 0, n_int), dtype))
    g_bcm_r = _chain(pi_bcm_r, e_bcm_r,
                     jnp.asarray(_miss_masks(bc_miss_r, 1, n_int), dtype))

    # ---- mix into the 203-state ABC space per fate pair ----
    map_ab_c = jnp.asarray(combine_to_abc(("full", (A, B)), ("full", (C,))), dtype)
    map_bc_a = jnp.asarray(combine_to_abc(("full", (B, C)), ("full", (A,))), dtype)
    map_split = jnp.asarray(
        combine_to_abc(("partial", (A, B), (A,)), ("partial", (C,), (B, C))), dtype
    )
    map_split2 = jnp.asarray(
        combine_to_abc(("partial", (B, C), (C,)), ("partial", (A,), (A, B))), dtype
    )

    # cross-normalizers (reference mix_probs divides one factor of each
    # split product by that chain's initial mass; safe-divide keeps m=0 or
    # x=0 finite where the reference produces nan)
    def inv(z):
        return jnp.where(z > 0, 1.0 / jnp.maximum(z, 1e-300), 0.0)

    z_abm_l = jnp.sum(pi_abm_l)
    z_abm_r = jnp.sum(pi_abm_r)
    z_bcm_l = jnp.sum(pi_bcm_l)
    z_bcm_r = jnp.sum(pi_bcm_r)

    fates = fate_list(n_int)
    n_f = len(fates)
    # index of a fate in the "full"/"miss" pattern tables
    def full_idx(fl, fr):
        fi = fl[1] if fl[0] != -1 else -1
        ri = fr[1] if fr[0] != -1 else -1
        return ([-1] + list(range(n_int))).index(fi) * (n_int + 1) + (
            [-1] + list(range(n_int))
        ).index(ri)

    def miss_idx(f):
        return 0 if f[0] == -1 else f[1] + 1

    rows = []
    for fl in fates:
        for fr in fates:
            acc = jnp.zeros((203,), dtype)
            l_ab = fl[0] in (-1, 0)
            r_ab = fr[0] in (-1, 0)
            l_bc = fl[0] in (-1, 4)
            r_bc = fr[0] in (-1, 4)
            if l_ab and r_ab:  # B stayed entirely
                acc = acc + jnp.einsum(
                    "s,c,msc->m", g_ab[full_idx(fl, fr)], f_c_bis, map_ab_c
                )
            if l_bc and r_bc:  # B migrated entirely
                acc = acc + jnp.einsum(
                    "s,c,msc->m", g_bc[full_idx(fl, fr)], f_a_bis, map_bc_a
                )
            if l_ab and r_bc:  # split: B_l stayed, B_r migrated
                w = inv(z_abm_l) + inv(z_bcm_r)
                acc = acc + w * jnp.einsum(
                    "a,b,mab->m", g_abm_l[miss_idx(fl)], g_bcm_r[miss_idx(fr)],
                    map_split,
                )
            if l_bc and r_ab:  # split: B_l migrated, B_r stayed
                w = inv(z_bcm_l) + inv(z_abm_r)
                acc = acc + w * jnp.einsum(
                    "a,b,mab->m", g_bcm_l[miss_idx(fl)], g_abm_r[miss_idx(fr)],
                    map_split2,
                )
            rows.append(acc)
    pi_abc = jnp.stack(rows)  # (n_f^2, 203) in fate_list x fate_list order

    return run_abc_stage(plan, pi_abc, _rate(state_space(3), coal_ABC, rho, dtype),
                         cut_ABC, dtype)
