"""Packing alignment blocks into fixed-shape, device-shardable batches.

The reference processes each MAF block as one variable-length numba loop on
one CPU core (optimizer.py:56-62).  Here blocks are right-padded with
``PAD_TOKEN`` into a dense (W, T) int32 batch: padding is provably neutral
for every decoder (pad steps carry state unchanged; an all-pad window
contributes exactly log(sum(pi)) = 0 to the log-likelihood), so W and T can
be rounded up freely for sharding and compile-cache friendliness.
"""

from __future__ import annotations

import numpy as np

from itrails_tpu.data.tokens import PAD_TOKEN

__all__ = ["pack_windows", "unpack_rows"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if m > 1 else x


def pack_windows(
    seqs,
    pad_windows_to: int = 1,
    pad_length_to: int = 1,
    max_window_len: int | None = None,
):
    """Pack variable-length token sequences into a padded (W, T) batch.

    ``max_window_len`` splits longer blocks into consecutive windows — note
    that splitting changes the forward recurrence at the seam, so leave it
    None for exact-parity likelihoods and decoding.

    Returns ``(tokens, lengths, owner)`` where ``owner[w]`` is the index of
    the source sequence of window ``w`` (useful to reassemble split blocks)
    and ``lengths[w]`` its true length.
    """
    pieces = []
    owners = []
    for i, s in enumerate(seqs):
        s = np.asarray(s, dtype=np.int32)
        if max_window_len is None or len(s) <= max_window_len:
            pieces.append(s)
            owners.append(i)
        else:
            for off in range(0, len(s), max_window_len):
                pieces.append(s[off : off + max_window_len])
                owners.append(i)

    n_w = _round_up(max(len(pieces), 1), pad_windows_to)
    t_len = _round_up(max((len(p) for p in pieces), default=1), pad_length_to)
    tokens = np.full((n_w, t_len), PAD_TOKEN, dtype=np.int32)
    lengths = np.zeros(n_w, dtype=np.int32)
    owner = np.full(n_w, -1, dtype=np.int32)
    for w, p in enumerate(pieces):
        tokens[w, : len(p)] = p
        lengths[w] = len(p)
        owner[w] = owners[w]
    return tokens, lengths, owner


def unpack_rows(values, lengths, owner, n_seqs):
    """Reassemble per-position decoder output (W, T, ...) into per-sequence
    arrays, concatenating split windows in order."""
    out = [[] for _ in range(n_seqs)]
    for w in range(len(owner)):
        if owner[w] >= 0 and lengths[w] > 0:
            out[owner[w]].append(np.asarray(values[w][: lengths[w]]))
    return [np.concatenate(chunks, axis=0) if chunks else None for chunks in out]
