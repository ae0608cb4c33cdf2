"""Multi-channel prefix-scan kernel exactness (VERDICT r4 #6).

The Mosaic kernel must be bit-identical to per-channel jax.lax.cummax /
cummin for every option combination; runs in interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from csa_tpu.index import mscan


@pytest.mark.parametrize("M,N", [(1, 100), (3, 2048), (12, 5000),
                                 (16, 2047), (26, 4097)])
def test_multi_cummax_matches_lax(M, N):
    rng = np.random.default_rng(M * 1000 + N)
    x = rng.integers(-(2**30), 2**30, size=(M, N)).astype(np.int32)
    want = np.asarray(jax.lax.cummax(jnp.asarray(x), axis=1))
    got = np.asarray(
        mscan.multi_cummax(x, interpret=True, force_kernel=True)
    )
    np.testing.assert_array_equal(got, want)


def test_multi_cummax_reverse():
    rng = np.random.default_rng(7)
    x = rng.integers(-(2**30), 2**30, size=(5, 3000)).astype(np.int32)
    want = np.asarray(
        jax.lax.cummax(jnp.asarray(x), axis=1, reverse=True)
    )
    got = np.asarray(
        mscan.multi_cummax(x, reverse=True, interpret=True,
                           force_kernel=True)
    )
    np.testing.assert_array_equal(got, want)


def test_multi_cummax_min_over_channels():
    rng = np.random.default_rng(11)
    x = rng.integers(-(2**30), 2**30, size=(13, 2500)).astype(np.int32)
    want = np.asarray(
        jnp.min(jax.lax.cummax(jnp.asarray(x), axis=1), axis=0)
    )
    got = np.asarray(
        mscan.multi_cummax(x, min_over_channels=True, interpret=True,
                           force_kernel=True)
    )
    np.testing.assert_array_equal(got, want)


def test_multi_cummin_reverse_max_over():
    rng = np.random.default_rng(13)
    x = rng.integers(-(2**30), 2**30, size=(9, 2100)).astype(np.int32)
    want = np.asarray(
        jnp.max(
            jax.lax.cummin(jnp.asarray(x), axis=1, reverse=True), axis=0
        )
    )
    got = np.asarray(
        mscan.multi_cummin(x, reverse=True, max_over_channels=True,
                           interpret=True, force_kernel=True)
    )
    np.testing.assert_array_equal(got, want)


def test_xla_fallback_matches():
    rng = np.random.default_rng(17)
    x = rng.integers(-(2**30), 2**30, size=(4, 999)).astype(np.int32)
    a = np.asarray(mscan.multi_cummax(x))                   # cpu -> lax
    b = np.asarray(
        mscan.multi_cummax(x, interpret=True, force_kernel=True)
    )
    np.testing.assert_array_equal(a, b)
