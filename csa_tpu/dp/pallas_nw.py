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
UNROLL = 16  # diagonals per fori_loop step (amortizes loop overhead)


def _nw_kernel(a_ref, br_ref, out_ref, dp1_ref, dp2_ref, bbuf_ref, *, dstar):
    """dstar: static target diagonal (= la + lb).
    a: (B, NP) int32 — the caller stores a[i-1] at lane i (pad 255);
    br: (B, TP) reversed-b codes placed at [TP-NP-lb, TP-NP) (pad 254);
    out: (B, NP) int32 = dp values on diagonal dstar
    (lane i = cell (i, dstar - i)).

    Mosaic has no dynamic-start lane slices, so ``bbuf`` holds ``br``
    rolled right by ``d`` lanes each diagonal and the read window is the
    static slice [TP-NP, TP).

    One cross-lane shift per diagonal: diagonal d needs roll(val(d-1))
    and roll(val(d-2)); the latter is the roll computed at step d-1, so
    the state carried between steps is (val(d-1), roll(val(d-2))).
    The roll is masked at lane 0 (``where(lane==0, NEG, roll)``), which
    Mosaic lowers as a fill-shift — measurably cheaper than a cyclic
    roll.  Lanes outside the valid triangle (lane > d) and beyond the
    true column range (j > lb) are never read by any in-range cell — DP
    dependencies only flow from smaller i and j — so they are left as
    drifting garbage (bounded far below any reachable score) instead of
    being re-masked every step.  ``dstar`` is static so the last block
    is peeled out of the loop and the target diagonal is written with a
    plain store (no per-step predicated store), and no diagonal beyond
    dstar is computed.

    No explicit boundary masks: the boundary values fall out of the
    recurrence itself.  Row 0 (lane 0, cell (0, d) = -d): the fill-shift
    leaves r[0] = NEG, dp1[0] = -(d-1), so the left arm gives
    max(NEG, -(d-1)) - 1 = -d and both other arms are NEG-garbage.
    Column 0 (lane d, cell (d, 0) = -d): r[d] = dp1[d-1] = cell
    (d-1, 0) = -(d-1), so the up arm gives -d, while dp1[d] and rp[d]
    are NEG-garbage.  Garbage can climb by at most +1 per diagonal via
    the match arm, so it stays below any real score for dstar << 2^24.
    Dropping the two per-step compare+selects is a measured ~20% win.
    """
    B, NP = dp1_ref.shape
    TP = br_ref.shape[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)

    # state entering d=2: dp1 = val(1) = [-1,-1,NEG..]; dp2 holds
    # roll(val(0),1) = [junk, 0, NEG..] (lane 0 never read at d=2)
    dp2_ref[:] = jnp.where(lane == 1, 0, NEG)
    dp1_ref[:] = jnp.where(lane <= 1, -1, NEG)
    bbuf_ref[:] = br_ref[:]
    if dstar <= 1:
        out_ref[:] = jnp.where(lane <= 1, -(max(dstar, 0)), NEG)
        return

    prev_a = a_ref[:]
    K = UNROLL  # roll the big b buffer once per K diagonals (static windows)

    def step(d, phase, dp1, rp, bbuf):
        # lane i of diagonal d needs b[d-i-1] = br[(TP-NP) - d + i];
        # bbuf = roll(br, blk*K) and d = 2 + blk*K + phase, so the window
        # start is (TP-NP) - 2 - phase — static per unrolled phase
        start = TP - NP - 2 - phase
        bseg = bbuf[:, start : start + NP]
        sub = jnp.where(prev_a == bseg, 1, -1)
        r = jnp.where(lane == 0, NEG, pltpu.roll(dp1, shift=1, axis=1))
        # diag from (i-1, d-2-(i-1)) = rp; up/left share the -1 penalty;
        # boundary cells (0, d) and (d, 0) fall out as -d (see docstring)
        val = jnp.maximum(rp + sub, jnp.maximum(r, dp1) - 1)
        return val, r

    def body(blk, _):
        d0 = 2 + blk * K
        bbuf = bbuf_ref[:]  # = roll(br, blk*K)
        dp1 = dp1_ref[:]
        rp = dp2_ref[:]
        for phase in range(K):
            dp1, rp = step(d0 + phase, phase, dp1, rp, bbuf)
        dp1_ref[:] = dp1
        dp2_ref[:] = rp
        bbuf_ref[:] = pltpu.roll(bbuf, shift=K, axis=1)
        return 0

    # diagonals 2..dstar; the block containing dstar is peeled so the
    # capture is an unconditional store and no diagonal past dstar runs
    nblk = (dstar - 1 + K - 1) // K
    jax.lax.fori_loop(0, nblk - 1, body, 0)
    d0 = 2 + (nblk - 1) * K
    bbuf = bbuf_ref[:]
    dp1 = dp1_ref[:]
    rp = dp2_ref[:]
    for phase in range(dstar - d0 + 1):
        dp1, rp = step(d0 + phase, phase, dp1, rp, bbuf)
    out_ref[:] = dp1


@functools.partial(jax.jit, static_argnames=("dstar", "interpret"))
def _nw_call(dstar, a, br, interpret=False):
    B, NP = a.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
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
        functools.partial(_nw_kernel, dstar=dstar),
        out_shape=jax.ShapeDtypeStruct((B, NP), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        # v5e has 128 MiB VMEM/core; the default 16 MiB scoped cap blocks
        # the long-sequence shapes (B=8, L>=32k) that maximize cells/s
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(a, br)


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
    # br: reversed b placed at [TP - NP - lb, TP - NP).  The window read
    # at diagonal d is bbuf[TP-NP-2-phase + i] = br[(TP-NP + i - d) mod TP]
    # (cyclic roll); in-cone lanes have i >= d - lb + 1, so the un-wrapped
    # index TP-NP+i-d stays >= TP-NP-lb+1 > 0 whenever TP >= NP + lb —
    # the minimal buffer (out-of-cone lanes may read wrapped garbage,
    # which never feeds an in-range cell).  The small floor keeps the
    # static window start TP-NP-2-phase nonnegative for K phases.
    TP = -(-(NP + max(lb, 32)) // 128) * 128
    br = np.full((B, TP), 254, dtype=np.int32)
    core_end = TP - NP
    br[:, core_end - lb : core_end] = b_batch[:, ::-1]
    out = np.asarray(
        _nw_call(la + lb, jnp.asarray(a), jnp.asarray(br), interpret=interpret)
    )
    return out[:, la]


def nw_scores_host(a_batch, b_batch):
    """Host reference scores via the native pairwise kernel."""
    from .. import native

    outs = []
    for a, b in zip(a_batch, b_batch):
        outs.append(native.pairwise_nw(np.asarray(a), np.asarray(b)))
    return np.asarray(outs)
