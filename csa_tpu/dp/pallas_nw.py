"""Pallas TPU wavefront kernel: batched pairwise Needleman-Wunsch.

The reference's cyclic-DP workload (rotation verification / pairwise
alignment, ``dynamicprogramming.c`` Score() semantics: match +1,
mismatch/indel -1) re-designed for the TPU VPU: the DP matrix is never
materialized — two anti-diagonal state vectors live in VMEM scratch and
the kernel walks the diagonals with a ``fori_loop``, processing a whole
batch of sequence pairs along the sublane dimension.  Cells per launch =
B x N x M with O(B x N) memory — pure compute, which is what the
cell-updates/s headline measures.

Key trick: with ``b`` reversed, anti-diagonal ``d`` of the match matrix
is a CONTIGUOUS slice of the reversed sequence, so the inner step is a
dynamic slice + compare + three shifted adds — no gathers.

Layout: lanes = DP row index i (padded to a 128 multiple), sublanes =
batch.  The score dp[la][lb] is captured from diagonal ``la + lb``
(scalar-prefetched), so lane/column padding never affects exactness:
padded cells are garbage but sit strictly outside the dependency cone of
(la, lb).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**24)


def _nw_kernel(dstar_ref, a_ref, br_ref, out_ref, dp1_ref, dp2_ref, bbuf_ref):
    """dstar: (1,) target diagonal (= la + lb).
    a: (B, NP) int32 — the caller stores a[i-1] at lane i (pad 255);
    br: (B, TP) reversed-b codes placed at [TP-NP-lb, TP-NP) (pad 254);
    out: (B, NP) int32 = dp values on diagonal dstar
    (lane i = cell (i, dstar - i)).

    Mosaic has no dynamic-start lane slices, so ``bbuf`` holds ``br``
    rolled right by ``d`` lanes each diagonal and the read window is the
    static slice [TP-NP, TP).
    """
    B, NP = dp1_ref.shape
    TP = br_ref.shape[1]
    dstar = dstar_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)

    # d = 0 diagonal: only cell (0,0) = 0;  d = 1: (0,1) and (1,0) = -1
    dp2_ref[:] = jnp.where(lane == 0, 0, NEG)
    dp1_ref[:] = jnp.where(lane <= 1, -1, NEG)
    out_ref[:] = jnp.where(lane <= 1, -1, NEG)  # in case dstar <= 1
    bbuf_ref[:] = br_ref[:]

    prev_a = a_ref[:]
    K = 8  # roll the big b buffer once per K diagonals (K static windows)

    def step(d, phase, dp1, dp2, bbuf):
        # lane i of diagonal d needs b[d-i-1] = br[(TP-NP) - d + i];
        # bbuf = roll(br, blk*K) and d = 2 + blk*K + phase, so the window
        # start is (TP-NP) - 2 - phase — static per unrolled phase
        start = TP - NP - 2 - phase
        bseg = bbuf[:, start : start + NP]
        sub = jnp.where(prev_a == bseg, 1, -1)
        shift1 = jnp.where(lane == 0, NEG, pltpu.roll(dp1, shift=1, axis=1))
        shift2 = jnp.where(lane == 0, NEG, pltpu.roll(dp2, shift=1, axis=1))
        diag = shift2 + sub
        up = shift1 - 1  # from (i-1, d-i): gap in b
        left = dp1 - 1  # from (i, d-1-i): gap in a
        val = jnp.maximum(diag, jnp.maximum(up, left))
        # boundaries: (0, d) = -d; (d, 0) = -d
        val = jnp.where(lane == 0, -d, val)
        val = jnp.where(lane == d, -d, val)
        val = jnp.where(lane > d, NEG, val)

        @pl.when(d == dstar)
        def _():
            out_ref[:] = val

        return val, dp1

    def body(blk, _):
        d0 = 2 + blk * K
        bbuf = bbuf_ref[:]  # = roll(br, blk*K)
        dp1 = dp1_ref[:]
        dp2 = dp2_ref[:]
        for phase in range(K):
            dp1, dp2 = step(d0 + phase, phase, dp1, dp2, bbuf)
        dp1_ref[:] = dp1
        dp2_ref[:] = dp2
        bbuf_ref[:] = pltpu.roll(bbuf, shift=K, axis=1)
        return 0

    ndiag = NP + (TP - NP - NP) - 1  # diagonals 2 .. TP-NP
    nblk = (ndiag + K - 1) // K
    jax.lax.fori_loop(0, nblk, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nw_call(dstar, a, br, interpret=False):
    B, NP = a.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, NP), jnp.int32),
            pltpu.VMEM((B, NP), jnp.int32),
            pltpu.VMEM((B, br.shape[1]), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _nw_kernel,
        out_shape=jax.ShapeDtypeStruct((B, NP), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dstar, a, br)


def pairwise_nw_scores(
    a_batch: np.ndarray,
    b_batch: np.ndarray,
    *,
    interpret: bool = False,
) -> np.ndarray:
    """Global NW score (+1 match / -1 mismatch / -1 gap) per batch pair.

    a_batch: (B, la), b_batch: (B, lb) int codes in [0, 4).
    """
    a_batch = np.asarray(a_batch)
    b_batch = np.asarray(b_batch)
    B, la = a_batch.shape
    lb = b_batch.shape[1]
    NP = max(128, -(-(la + 1) // 128) * 128)
    # lane i consumes a[i-1]: store pre-shifted
    a = np.full((B, NP), 255, dtype=np.int32)
    a[:, 1 : la + 1] = a_batch
    # br: reversed b placed at [TP - NP - lb, TP - NP)
    TP = -(-(2 * NP + lb) // 128) * 128
    br = np.full((B, TP), 254, dtype=np.int32)
    core_end = TP - NP
    br[:, core_end - lb : core_end] = b_batch[:, ::-1]
    dstar = np.asarray([la + lb], dtype=np.int32)
    out = np.asarray(
        _nw_call(jnp.asarray(dstar), jnp.asarray(a), jnp.asarray(br), interpret=interpret)
    )
    return out[:, la]


def nw_scores_host(a_batch, b_batch):
    """Host reference scores via the native pairwise kernel."""
    from .. import native

    outs = []
    for a, b in zip(a_batch, b_batch):
        outs.append(native.pairwise_nw(np.asarray(a), np.asarray(b)))
    return np.asarray(outs)
