"""Streaming MAF alignment ingestion.

Reference semantics (read_data.py:94-220): for each alignment block that
contains all four requested species, gaps become 'N', each column becomes a
token of the 625-symbol alphabet; reference-coordinate extraction tracks the
chosen reference species' position per column (gaps -> -9), honouring strand
and srcSize.

This implementation is a single-pass line parser (no biopython dependency)
with a vectorized column tokenizer: the four sequences are mapped to base
codes (A,C,T,G -> 0..3, anything else -> N=4) and the token index is computed
arithmetically — index = a*125? no: mixed-radix over the reference's token
enumeration, precomputed as a (5,5,5,5) lookup table.
"""

from __future__ import annotations

import numpy as np

from itrails_tpu.data.tokens import token_index

__all__ = ["read_maf", "maf_tokens", "maf_tokens_new_method",
           "maf_reference_coordinates", "MafBlock"]

_BASE_CODE = np.full(256, 4, dtype=np.int8)  # default: N
for i, ch in enumerate("ACTG"):
    _BASE_CODE[ord(ch)] = i
    _BASE_CODE[ord(ch.lower())] = i


def _token_lut() -> np.ndarray:
    """(5,5,5,5) -> token id lookup (base codes 0..3 = A,C,T,G; 4 = N)."""
    lut = np.zeros((5, 5, 5, 5), dtype=np.int32)
    idx = token_index()
    sym = "ACTGN"
    for a in range(5):
        for b in range(5):
            for c in range(5):
                for d in range(5):
                    lut[a, b, c, d] = idx[sym[a] + sym[b] + sym[c] + sym[d]]
    return lut


_TOKEN_LUT = None


class MafBlock:
    """One alignment block: per-species aligned text plus the s-line
    annotations needed for coordinate projection."""

    __slots__ = ("seqs", "meta")

    def __init__(self):
        self.seqs = {}  # species -> aligned string
        self.meta = {}  # species -> (start, size, strand, src_size)


def read_maf(path, species):
    """Yield :class:`MafBlock` for every block containing sequences for any
    of the given species (species name = src up to the first '.')."""
    wanted = set(species)
    block = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("a"):
                if block is not None and block.seqs:
                    yield block
                block = MafBlock()
            elif line.startswith("s ") and block is not None:
                parts = line.split()
                name = parts[1].split(".")[0]
                if name in wanted:
                    block.seqs[name] = parts[6]
                    block.meta[name] = (
                        int(parts[2]),
                        int(parts[3]),
                        1 if parts[4] == "+" else -1,
                        int(parts[5]),
                    )
    if block is not None and block.seqs:
        yield block


def maf_tokens(path, species, prefer_native=True):
    """Token arrays (one int32 array per complete block) for the four
    species, in their given order (reference maf_parser, read_data.py:94-117:
    blocks missing any species are skipped; gaps count as N).

    Uses the native C++ streaming tokenizer when a toolchain is available
    (itrails_tpu.native); the pure-Python path below is the portable
    fallback and the semantic reference (they are parity-tested against
    each other)."""
    if prefer_native:
        try:
            from itrails_tpu import native

            if native.available():
                return list(native.maf_tokens_native(path, list(species)))
        except Exception:
            pass
    return _maf_tokens_py(path, species)


def _maf_tokens_py(path, species):
    global _TOKEN_LUT
    if _TOKEN_LUT is None:
        _TOKEN_LUT = _token_lut()
    out = []
    for block in read_maf(path, species):
        if len(block.seqs) != len(species):
            continue
        cols = [
            _BASE_CODE[np.frombuffer(block.seqs[sp].encode(), dtype=np.uint8)]
            for sp in species
        ]
        out.append(_TOKEN_LUT[cols[0], cols[1], cols[2], cols[3]].astype(np.int32))
    return out


_TOKEN_LUT_3 = None


def maf_tokens_new_method(path, species):
    """Token arrays over the 3-species 125-token alphabet (reference
    maf_parser_new_method, read_data.py:120-143: blocks missing any of the
    three species are skipped; gaps count as N).  ``species`` must name
    exactly three species."""
    if len(species) != 3:
        raise ValueError("new-method tokenization takes exactly 3 species")
    global _TOKEN_LUT_3
    if _TOKEN_LUT_3 is None:
        from itrails_tpu.data.tokens import token_index_3

        idx = token_index_3()
        sym = "ACTGN"
        lut = np.zeros((5, 5, 5), dtype=np.int32)
        for a in range(5):
            for b in range(5):
                for d in range(5):
                    lut[a, b, d] = idx[sym[a] + sym[b] + sym[d]]
        _TOKEN_LUT_3 = lut
    out = []
    for block in read_maf(path, species):
        if len(block.seqs) != 3:
            continue
        cols = [
            _BASE_CODE[np.frombuffer(block.seqs[sp].encode(), dtype=np.uint8)]
            for sp in species
        ]
        out.append(_TOKEN_LUT_3[cols[0], cols[1], cols[2]].astype(np.int32))
    return out


def maf_reference_coordinates(path, species, ref):
    """Per-block reference-genome coordinates per alignment column
    (reference parse_coordinates, read_data.py:146-220).

    For blocks with all four species: each column maps to the ``ref``
    species' coordinate (start offset per non-gap column; reverse strand
    counts backwards from srcSize - start), gaps map to -9; blocks where the
    reference sequence is absent map wholly to -9.
    """
    out = []
    for block in read_maf(path, set(species) | {ref}):
        present = [sp for sp in species if sp in block.seqs]
        if len(present) != len(species):
            continue
        if ref in block.seqs:
            text = block.seqs[ref]
            start, _size, strand, src_size = block.meta[ref]
            pos = start if strand == 1 else src_size - start
            coords = np.full(len(text), -9, dtype=np.int64)
            is_base = np.frombuffer(text.encode(), dtype=np.uint8) != ord("-")
            steps = np.cumsum(is_base.astype(np.int64)) - 1
            coords[is_base] = pos + strand * steps[is_base]
            out.append(coords)
        else:
            any_sp = next(iter(block.seqs))
            out.append(np.full(len(block.seqs[any_sp]), -9, dtype=np.int64))
    return out
