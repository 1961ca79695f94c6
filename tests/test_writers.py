"""Genome-scale output writers: the vectorized/event-driven CSV emitters
must reproduce the reference's per-position serial loops byte-for-byte
(reference workflow_viterbi.py:692-744, workflow_posterior.py:697-716)."""

import csv
import io

import numpy as np

from itrails_tpu.cli.decode import (
    _rle_rows,
    write_posterior_csv,
    write_viterbi_csv,
)


def _serial_rle_rows(block_idx, res, c):
    """Direct transcription of the reference's serial loop (the round-1
    implementation) — the oracle for the event-driven rewrite."""
    rows = []
    if len(res) == 0:
        return rows
    if c is None:
        seg_start = 0
        cur = res[0]
        for pos in range(1, len(res)):
            if res[pos] != cur:
                rows.append([block_idx, seg_start, pos - 1, cur])
                seg_start = pos
                cur = res[pos]
        rows.append([block_idx, seg_start, len(res) - 1, cur])
        return rows
    first = next((i for i, x in enumerate(c) if x != -9), None)
    if first is None:
        return rows
    seg_start = c[first]
    cur_non_null = seg_start
    cur = res[first]
    for pos in range(first, len(res)):
        if seg_start == -9:
            seg_start = c[pos]
            cur = res[pos]
            cur_non_null = seg_start
            continue
        if res[pos] != cur:
            rows.append([block_idx, seg_start, cur_non_null, cur])
            seg_start = c[pos]
            cur = res[pos]
        cur_non_null = c[pos] if c[pos] != -9 else cur_non_null
    if not (seg_start == cur_non_null == -9):
        rows.append([block_idx, seg_start, cur_non_null, cur])
    return rows


def _norm(rows):
    return [[int(x) for x in r] for r in rows]


def test_rle_no_coords_matches_serial():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 200))
        res = rng.integers(0, 4, size=n)
        assert _norm(_rle_rows(7, res, None)) == _norm(
            _serial_rle_rows(7, res, None)
        )


def test_rle_coords_fuzz_matches_serial():
    rng = np.random.default_rng(1)
    for trial in range(300):
        n = int(rng.integers(1, 120))
        res = rng.integers(0, 3, size=n)
        # coordinates: increasing with random -9 gaps (incl. leading /
        # trailing gap runs and all-gap blocks)
        gap_p = rng.uniform(0.05, 0.9)
        is_gap = rng.random(n) < gap_p
        c = np.where(is_gap, -9, np.arange(100, 100 + n))
        got = _norm(_rle_rows(trial, res, c))
        want = _norm(_serial_rle_rows(trial, res, c))
        assert got == want, (
            f"trial {trial}\nres={res.tolist()}\nc={c.tolist()}\n"
            f"got ={got}\nwant={want}"
        )


def test_rle_all_gap_and_single():
    res = np.array([2, 2, 1])
    c = np.array([-9, -9, -9])
    assert _rle_rows(0, res, c) == _serial_rle_rows(0, res, c) == []
    res1 = np.array([5])
    assert _norm(_rle_rows(0, res1, None)) == [[0, 0, 0, 5]]
    assert _norm(_rle_rows(0, res1, np.array([42]))) == [[0, 42, 42, 5]]


def _serial_posterior_csv(results, coords):
    buf = io.StringIO()
    w = csv.writer(buf)
    n_states = results[0].shape[1] if results else 0
    w.writerow(["alignment_block_idx", "position_idx"]
               + [f"prob_state_{i}" for i in range(n_states)])
    for block_idx, arr in enumerate(results):
        arr = np.asarray(arr, np.float64)
        for pos_idx, row in enumerate(arr):
            pos = pos_idx if coords is None else coords[block_idx][pos_idx]
            w.writerow([block_idx, pos] + row.tolist())
    return buf.getvalue()


def test_posterior_writer_bytes_match_serial(tmp_path):
    rng = np.random.default_rng(2)
    results = [rng.random((37, 5)).astype(np.float32),
               rng.random((11, 5)).astype(np.float64)]
    coords = [np.arange(500, 537), np.arange(90, 101)]
    for co in (None, coords):
        path = tmp_path / "post.csv"
        write_posterior_csv(str(path), results, co)
        got = path.read_text()
        want = _serial_posterior_csv(results, co)
        assert got.replace("\r\n", "\n") == want.replace("\r\n", "\n")


def test_viterbi_writer_end_to_end(tmp_path):
    rng = np.random.default_rng(3)
    results = [rng.integers(0, 3, size=50), rng.integers(0, 3, size=30)]
    is_gap = rng.random(50) < 0.3
    coords = [np.where(is_gap, -9, np.arange(1000, 1050)),
              np.arange(2000, 2030)]
    path = tmp_path / "vit.csv"
    write_viterbi_csv(str(path), results, coords)
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "Block_idx,position_start,position_end,most_likely_state"
    want = (_serial_rle_rows(0, results[0], coords[0])
            + _serial_rle_rows(1, results[1], coords[1]))
    got = [[int(x) for x in ln.split(",")] for ln in lines[1:]]
    assert got == _norm(want)
