"""Sequence-parallel wavefront fill parity (SURVEY §5 halo exchange).

The column-sharded fill with ppermute halo exchange must produce the
bit-identical direction matrix of the single-device row scan / numpy
fill, for every mesh size, including non-default scoring.
"""

import numpy as np
import pytest

import jax

from csa_tpu import config
from csa_tpu.align import progressive
from csa_tpu.dp import seqpar


def _mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]), ("col",))


def _numpy_dirs(row_codes, sv, i):
    from csa_tpu import native

    lib, tried = native._lib, native._tried
    try:
        native._lib = None
        native._tried = True
        _, dirs = progressive.dp_fill(row_codes, sv, i)
    finally:
        native._lib, native._tried = lib, tried
    return dirs


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_seqpar_matches_numpy(n_dev):
    rng = np.random.default_rng(n_dev)
    R = int(rng.integers(30, 300))
    C = int(rng.integers(50, 500))
    i = int(rng.integers(1, 7))
    codes = rng.integers(0, 4, size=R).astype(np.int8)
    sv = rng.integers(0, 3, size=(C, 5)).astype(np.int64)
    dirs_ref = _numpy_dirs(codes, sv, i)
    dirs_sp = seqpar.dp_fill_seqpar(codes, sv, i, mesh=_mesh(n_dev),
                                    band_rows=16)
    np.testing.assert_array_equal(dirs_sp, dirs_ref)


def test_seqpar_non_default_scoring():
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=120).astype(np.int8)
    sv = rng.integers(0, 3, size=(200, 5)).astype(np.int64)
    i = 4
    config.set_scoring(config.Scoring(match=2, mismatch=-3, indel=-2,
                                      doublegap=-1))
    try:
        dirs_ref = _numpy_dirs(codes, sv, i)
        dirs_sp = seqpar.dp_fill_seqpar(codes, sv, i, mesh=_mesh(8),
                                        band_rows=8)
        np.testing.assert_array_equal(dirs_sp, dirs_ref)
    finally:
        config.set_scoring(config.DEFAULT_SCORING)


def test_seqpar_giant_shape_smoke():
    """A Set3-shaped (tall x wide) fill stays exact across the mesh."""
    rng = np.random.default_rng(7)
    R, C, i = 700, 1900, 9
    codes = rng.integers(0, 4, size=R).astype(np.int8)
    sv = rng.integers(0, 4, size=(C, 5)).astype(np.int64)
    dirs_ref = _numpy_dirs(codes, sv, i)
    dirs_sp = seqpar.dp_fill_seqpar(codes, sv, i, mesh=_mesh(8),
                                    band_rows=64)
    np.testing.assert_array_equal(dirs_sp, dirs_ref)
