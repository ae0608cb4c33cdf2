"""Pallas profile-DP wavefront kernel: exactness in interpreter mode.

Golden = the numpy ``dp_fill`` (itself pinned bit-identical to the
native C++ kernel and the reference semantics by
tests/test_dp_wavefront.py / test_alignment_parity.py).
"""

import numpy as np
import pytest

from csa_tpu import config
from csa_tpu.align import progressive
from csa_tpu.dp import pallas_profile


def _golden_maps(item):
    codes, sv, i, top, erg = item
    _, dirs = progressive.dp_fill(codes, sv, i, top_row=top, edge_rowgap=erg)
    return progressive._dirs_to_maps(dirs, len(codes), len(sv))


def _rand_item(rng, rmax=120, cmax=160):
    R = int(rng.integers(1, rmax))
    C = int(rng.integers(1, cmax))
    i = int(rng.integers(1, 17))
    codes = rng.integers(0, 4, size=R).astype(np.int64)
    sv = rng.integers(0, 4, size=(C, 5)).astype(np.int64)
    # stale-allocation boundaries: arbitrary top row / edge scale
    top = rng.integers(-60, 10, size=C + 1).astype(np.int64)
    top[0] = 0
    erg = int(rng.integers(-20, 0))
    return codes, sv, i, top, erg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_single_gap_exact(seed):
    rng = np.random.default_rng(seed)
    item = _rand_item(rng)
    path = pallas_profile.profile_path_pallas(*item, interpret=True)
    got = progressive._path_to_maps(path)
    want = _golden_maps(item)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])


def test_batched_ragged_exact():
    rng = np.random.default_rng(7)
    items = [_rand_item(rng) for _ in range(6)]
    paths = pallas_profile.profile_paths_pallas(items, interpret=True)
    for p, it in zip(paths, items):
        got = progressive._path_to_maps(p)
        want = _golden_maps(it)
        assert np.array_equal(got[0], want[0])
        assert np.array_equal(got[1], want[1])


def test_fresh_default_boundaries_exact():
    rng = np.random.default_rng(11)
    R, C, i = 64, 200, 9
    codes = rng.integers(0, 4, size=R).astype(np.int64)
    sv = rng.integers(0, 5, size=(C, 5)).astype(np.int64)
    top = progressive.default_top_row(sv, i)
    item = (codes, sv, i, top, -i)
    path = pallas_profile.profile_path_pallas(*item, interpret=True)
    got = progressive._path_to_maps(path)
    want = _golden_maps(item)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])


def test_non_default_scoring_exact():
    rng = np.random.default_rng(3)
    item = _rand_item(rng)
    config.set_scoring(
        config.Scoring(match=3, mismatch=-2, indel=-4, doublegap=-1)
    )
    try:
        path = pallas_profile.profile_path_pallas(*item, interpret=True)
        got = progressive._path_to_maps(path)
        want = _golden_maps(item)
    finally:
        config.set_scoring(config.DEFAULT_SCORING)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])


def test_degenerate_single_row_and_col():
    # R=1 / C=1 shapes exercise the injection-only diagonals
    for R, C in [(1, 40), (40, 1), (1, 1)]:
        rng = np.random.default_rng(R * 100 + C)
        i = 3
        codes = rng.integers(0, 4, size=R).astype(np.int64)
        sv = rng.integers(0, 3, size=(C, 5)).astype(np.int64)
        top = progressive.default_top_row(sv, i)
        item = (codes, sv, i, top, -i)
        path = pallas_profile.profile_path_pallas(*item, interpret=True)
        got = progressive._path_to_maps(path)
        want = _golden_maps(item)
        assert np.array_equal(got[0], want[0])
        assert np.array_equal(got[1], want[1])


def test_max_profile_counts_i64():
    """i = 64 (the reference's MAXNUMBEROFSEQS bound) saturates the
    count-based scores; the int32 kernel must stay exact."""
    rng = np.random.default_rng(64)
    R, C, i = 90, 140, 64
    codes = rng.integers(0, 4, size=R).astype(np.int64)
    sv = rng.integers(0, 65, size=(C, 5)).astype(np.int64)
    top = progressive.default_top_row(sv, i)
    item = (codes, sv, i, top, -i)
    path = pallas_profile.profile_path_pallas(*item, interpret=True)
    got = progressive._path_to_maps(path)
    want = _golden_maps(item)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])


def test_bucket_edge_shapes():
    """R/C exactly at and one past the 512 bucket edge exercise the
    padded fictitious-lane regions."""
    rng = np.random.default_rng(512)
    for R, C in [(512, 512), (513, 511), (511, 513)]:
        i = 5
        codes = rng.integers(0, 4, size=R).astype(np.int64)
        sv = rng.integers(0, 3, size=(C, 5)).astype(np.int64)
        top = progressive.default_top_row(sv, i)
        item = (codes, sv, i, top, -i)
        path = pallas_profile.profile_path_pallas(*item, interpret=True)
        got = progressive._path_to_maps(path)
        want = _golden_maps(item)
        assert np.array_equal(got[0], want[0])
        assert np.array_equal(got[1], want[1])
