"""Mesh-sharded sequence parallelism for chromosome-scale blocks.

``hmm.longseq`` makes ONE long block parallel over *chunks* on one chip; this
module shards those chunks over a ``jax.sharding.Mesh`` so a single block
spans every chip of a slice.  The cross-chip pattern is the classic
sequence-parallel prefix ladder: each device folds its local chunk transfer
operators into one per-shard (M, M) operator, one ``all_gather`` over ICI
moves the n_dev tiny operators everywhere, and every device closes its own
exclusive prefix/suffix locally (n_dev is static, M <= ~200, so the
cross-chip step is O(n_dev * M^2) FLOPs and one collective per direction).

The reference has no analogue at all — a chromosome-scale block is a single
serial numba loop on one core (reference optimizer.py:165-188); blocks are
its only parallel axis (optimizer.py:56-62).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from itrails_tpu.data.tokens import PAD_TOKEN
from itrails_tpu.hmm.longseq import _combine, chunk_operators

__all__ = ["sharded_forward_loglik_long", "sharded_posterior_long"]


def _pad_stream(tokens, chunk: int, n_dev: int):
    """Split one (T,) token array into (first, (C, chunk) stream) with C a
    multiple of n_dev; pad columns are PAD_TOKEN (neutral)."""
    t_len = tokens.shape[0]
    stream_len = t_len - 1
    unit = chunk * n_dev
    padded = max(-(-stream_len // unit) * unit, unit)
    stream = jnp.concatenate(
        [tokens[1:], jnp.full((padded - stream_len,), PAD_TOKEN, tokens.dtype)]
    )
    return tokens[0], stream.reshape(-1, chunk)


def _norm(g):
    z = jnp.maximum(jnp.max(g, axis=(-2, -1), keepdims=True),
                    jnp.finfo(g.dtype).tiny)
    return g / z


def _vnorm(v):
    z = jnp.maximum(jnp.max(v, axis=-1, keepdims=True),
                    jnp.finfo(v.dtype).tiny)
    return v / z


def sharded_forward_loglik_long(a, bfull, pi, tokens, mesh: Mesh,
                                chunk: int = 256):
    """Log-likelihood of ONE long (T,) token sequence, chunks sharded over
    the mesh.  Matches longseq.forward_loglik_long to fp tolerance."""
    n_dev = mesh.devices.size
    first, tok = _pad_stream(tokens, chunk, n_dev)
    tok = jax.device_put(tok, NamedSharding(mesh, P("data", None)))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("data", None)), out_specs=P(),
        check_vma=False,
    )
    def f(a, bfull, pi, first, tok):
        # local chunk operators, then an ordered local fold
        ops, logz = chunk_operators(a, bfull, tok.reshape(-1), chunk)
        g_all, z_all = lax.associative_scan(_combine, (ops, logz))
        g_loc, z_loc = g_all[-1], z_all[-1]
        # one collective: every device sees every shard's (M, M) operator
        g_sh = lax.all_gather(g_loc, "data")  # (n_dev, M, M)
        z_sh = lax.all_gather(z_loc, "data")  # (n_dev,)
        g, z = g_sh[0], z_sh[0]
        for k in range(1, n_dev):
            g, z = _combine((g, z), (g_sh[k], z_sh[k]))
        alpha0 = pi * bfull.T[jnp.maximum(first, 0)]
        return jnp.log(jnp.sum(alpha0 @ g)) + z

    return f(a, bfull, pi, first, tok)


def _alpha_beta_sharded(mesh: Mesh, n_dev: int, m: int):
    """shard_mapped kernel computing per-position (rescaled) alpha and beta
    vectors of one long block, chunks sharded over the mesh.

    Returns alphas[s] = alpha at global position s+1 and betas[s] = beta at
    global position s, both (C_local, chunk, M) per shard — the same row
    convention as longseq.posterior_long's recompute scans."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("data", None)),
        out_specs=(P("data", None, None), P("data", None, None)),
        check_vma=False,
    )
    def f(a, bfull, pi, first, tok):
        c_loc = tok.shape[0]
        eye = jnp.eye(m, dtype=a.dtype)
        eye1 = jnp.broadcast_to(eye, (1, m, m))
        g0 = jnp.broadcast_to(eye, (c_loc, m, m))

        # ---- forward: local chunk operators G_c = prod (A diag(e)) ----
        def fwd_op_step(g, t_col):
            e = bfull.T[jnp.maximum(t_col, 0)]
            new = _norm((g @ a) * e[:, None, :])
            return jnp.where((t_col != PAD_TOKEN)[:, None, None], new, g), None

        ops, _ = lax.scan(fwd_op_step, g0, tok.T)
        prefix = lax.associative_scan(lambda l, r: _norm(l @ r), ops)
        prefix_ex = jnp.concatenate([eye1, prefix[:-1]], axis=0)

        # cross-shard exclusive prefix of the per-shard totals
        tot_f = lax.all_gather(prefix[-1], "data")  # (n_dev, M, M)
        alpha0 = pi * bfull.T[jnp.maximum(first, 0)]
        # v_k = alpha0 @ T_0 @ ... @ T_{k-1}; select this shard's k
        vs = [_vnorm(alpha0)]
        for k in range(1, n_dev):
            vs.append(_vnorm(vs[-1] @ tot_f[k - 1]))
        v_my = jnp.stack(vs)[lax.axis_index("data")]
        alpha_entry = _vnorm(jnp.einsum("m,cmn->cn", v_my, prefix_ex))

        # ---- backward: local chunk operators K_c = prod (A^T diag(e)) ----
        def bwd_op_step(g, t_col):
            e = bfull.T[jnp.maximum(t_col, 0)]
            new = _norm(g @ (a.T * e[:, None, :]))
            return jnp.where((t_col != PAD_TOKEN)[:, None, None], new, g), None

        kops, _ = lax.scan(bwd_op_step, g0, tok.T)
        suffix = lax.associative_scan(lambda l, r: _norm(r @ l), kops[::-1])[::-1]
        suffix_ex = jnp.concatenate([suffix[1:], eye1], axis=0)

        # cross-shard exclusive suffix: r_k = (T_{k+1} ... T_{n-1}) @ 1
        tot_b = lax.all_gather(suffix[0], "data")  # (n_dev, M, M)
        rs = [jnp.ones((m,), a.dtype)]
        for k in range(n_dev - 2, -1, -1):
            rs.append(_vnorm(tot_b[k + 1] @ rs[-1]))
        r_my = jnp.stack(rs[::-1])[lax.axis_index("data")]
        beta_exit = _vnorm(jnp.einsum("cmn,n->cm", suffix_ex, r_my))

        # ---- per-position recompute, batched over local chunks ----
        def fwd_step(alpha, t_col):
            e = bfull.T[jnp.maximum(t_col, 0)]
            new = _vnorm((alpha @ a) * e)
            alpha = jnp.where((t_col != PAD_TOKEN)[:, None], new, alpha)
            return alpha, alpha

        _, alphas = lax.scan(fwd_step, alpha_entry, tok.T)  # (chunk, Cl, M)

        def bwd_step(beta, t_col):
            e = bfull.T[jnp.maximum(t_col, 0)]
            new = _vnorm((beta * e) @ a)
            beta = jnp.where((t_col != PAD_TOKEN)[:, None], new, beta)
            return beta, beta

        _, betas_rev = lax.scan(bwd_step, beta_exit, tok.T[::-1])
        betas = betas_rev[::-1]
        return alphas.transpose(1, 0, 2), betas.transpose(1, 0, 2)

    return f


def sharded_posterior_long(a, bfull, pi, tokens, mesh: Mesh,
                           chunk: int = 256):
    """Exact posterior (T, M) of ONE long block, chunks sharded over the
    mesh (matches longseq.posterior_long / decoders.posterior to fp
    tolerance).

    Device side computes per-position rescaled alpha/beta vectors
    (sequence-parallel, one all_gather per direction); the host aligns the
    rows — gamma_p pairs alpha_p with beta_p, and the alpha rows are offset
    one stream position from the beta rows (longseq.posterior_long's
    assembly) — and takes the scale-cancelling softmax.
    """
    t_len = tokens.shape[0]
    m = a.shape[0]
    stream_len = t_len - 1
    n_dev = mesh.devices.size
    first, tok = _pad_stream(tokens, chunk, n_dev)
    tok_sh = jax.device_put(tok, NamedSharding(mesh, P("data", None)))

    alphas, betas = _alpha_beta_sharded(mesh, n_dev, m)(
        a, bfull, pi, first, tok_sh
    )
    alphas = np.asarray(alphas).reshape(-1, m)[:stream_len]
    betas = np.asarray(betas).reshape(-1, m)[:stream_len]

    alpha0 = np.asarray(pi) * np.asarray(bfull).T[max(int(tokens[0]), 0)]
    alpha_all = np.concatenate([alpha0[None], alphas], axis=0)
    beta_all = np.concatenate(
        [betas, np.ones((1, m), alpha_all.dtype)], axis=0
    )

    tiny = np.finfo(alpha_all.dtype).tiny
    post = np.log(np.maximum(alpha_all, tiny)) + np.log(
        np.maximum(beta_all, tiny)
    )
    post = post - post.max(axis=1, keepdims=True)
    post = np.exp(post)
    return post / post.sum(axis=1, keepdims=True)
