"""JAX/TPU backend of the cyclic suffix-array engine.

Device-side replacement for :mod:`csa_tpu.index.cyclic`'s heavy stages,
re-expressed as static-shaped XLA programs:

* prefix-doubling rank sort over all rotations (jnp.argsort + gathers);
* capped adjacent LCPs by vectorized binary descent over the rank levels;
* PSV/NSV + canonical-representative selection via range-min/argmin sparse
  tables (static log-depth loops);
* per-sequence coverage tests via cumulative sums;
* "deepest all-sequences node" selection via scatter-OR of all-seq child
  marks into canonical interval representatives.

The (tiny) collected block set is handed back to the host where the exact
numpy filters (:func:`csa_tpu.index.cyclic.remove_suffix_blocks`,
uniqueness, chaining) finish the pipeline.

Padding layout: sequences are padded to a common ``n_max`` (bucketed to
limit recompiles); padded rotation slots get unique sentinel ranks larger
than any real rank, so they sort last, never tie, and never join an
lcp-interval.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import cyclic


def _bucket(n: int, quantum: int = 1024) -> int:
    return ((n + quantum - 1) // quantum) * quantum


# Cyclic prefix-doubling starts from a PACKED window: the level-0 rank is
# the base-5 encoding of the first PACK_W cyclic chars (5**12 < 2**31),
# resolving 12 chars with ZERO sorts; level t covers PACK_W << t chars.
# This drops ~4 of the multi-key sort passes (the dominant device cost —
# XLA TPU sort is comparator-network bound) and shrinks the rank stack
# by the same factor.  Sub-PACK_W granularity (LCP tail, short
# fingerprints) reads the code array directly.
PACK_W = 12
_ALPHA = 5  # alphabet (ACGT-)
_SENT0 = _ALPHA ** PACK_W  # level-0 pad sentinel base (above all keys)


def _num_levels(n_max: int) -> int:
    """Number of packed cyclic rank levels (PACK_W << (levels-1) >= n_max)."""
    t = 1
    while (PACK_W << (t - 1)) < n_max:
        t += 1
    return t


def _linear_levels(total: int) -> int:
    """Level count for the LINEAR suffix program (plain 1 << t windows)."""
    t = 1
    while (1 << (t - 1)) < total:
        t += 1
    return t


def device_index_program(codes, lengths, *, k: int, n_max: int, levels: int):
    """Core device program.

    codes: (k, n_max) int32 (padding values arbitrary);
    lengths: (k,) int32.
    Returns (rank_levels (levels, N), sa (N,), lcp (N,), dup_flag ()).
    """
    n_total = k * n_max
    g = jnp.arange(n_total, dtype=jnp.int32)
    seq_of = g // n_max
    pos_of = g % n_max
    n_of = jnp.maximum(lengths[seq_of], 1)
    valid = pos_of < n_of
    base = seq_of * n_max

    def adv(gg, off):
        s = gg // n_max
        p = gg % n_max
        nn = jnp.maximum(lengths[s], 1)
        return s * n_max + (p + off) % nn

    big = jnp.int32(n_total)
    cflat = codes.reshape(-1).astype(jnp.int32)
    # level-0 rank: packed base-5 key of the first PACK_W cyclic chars
    # (order-isomorphic to the lexicographic 12-prefix order, equal iff
    # equal) — no sort needed; pad slots get unique sentinels above every
    # real key
    acc = jnp.zeros(n_total, jnp.int32)
    for t in range(PACK_W):
        acc = acc * _ALPHA + cflat[adv(g, jnp.int32(t))]
    rank = jnp.where(valid, acc, jnp.int32(_SENT0) + g)
    rank_levels = [rank]
    order = None
    for t in range(levels - 1):
        rank2 = rank[adv(g, jnp.int32(PACK_W << t))]
        # ONE stable multi-key sort per level (lexicographic on the rank
        # pair); pure int32 — JAX default has x64 disabled, so a combined
        # 64-bit key would truncate
        r1s, r2s, order = jax.lax.sort((rank, rank2, g), num_keys=2, is_stable=True)
        newgrp = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(jnp.int32),
            ]
        )
        dense = jnp.cumsum(newgrp)
        rank = jnp.zeros(n_total, jnp.int32).at[order].set(dense.astype(jnp.int32))
        # keep padding ranks unique and above all real ranks
        rank = jnp.where(valid, rank, big + g)
        rank_levels.append(rank)
    rank_stack = jnp.stack(rank_levels)  # (levels, N)

    final = rank_levels[-1]
    if order is None:  # degenerate levels == 1
        sa = jnp.argsort(final).astype(jnp.int32)
    else:
        # the last level's sort order IS the final rank order (the dense
        # final rank was assigned in that order; ties keep g ascending,
        # exactly like a stable argsort of `final`)
        sa = order.astype(jnp.int32)

    # duplicate-rotation detection (same sequence, identical periodic string)
    fr = final[sa]
    sq = seq_of[sa]
    vd = valid[sa]
    dup_flag = jnp.any((fr[1:] == fr[:-1]) & (sq[1:] == sq[:-1]) & vd[1:])

    # capped LCP of adjacent entries by binary descent over rank levels
    a = sa[:-1]
    b = sa[1:]
    off = jnp.zeros(n_total - 1, dtype=jnp.int32)
    for t in range(levels - 1, -1, -1):
        ga = adv(a, off)
        gb = adv(b, off)
        eq = rank_stack[t][ga] == rank_stack[t][gb]
        off = jnp.where(eq, off + jnp.int32(PACK_W << t), off)
    # sub-PACK_W tail: after the window-12 check, <12 chars remain
    # undetermined; compare chars sequentially with a stop flag (a +1
    # step past a mismatch could otherwise re-match by accident)
    still = jnp.ones(n_total - 1, dtype=bool)
    for _ in range(PACK_W - 1):
        eqc = cflat[adv(a, off)] == cflat[adv(b, off)]
        still = still & eqc
        off = jnp.where(still, off + 1, off)
    cap = jnp.minimum(n_of[a], n_of[b])
    raw = jnp.concatenate([jnp.zeros(1, jnp.int32), off.astype(jnp.int32)])
    lcp = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.minimum(off, cap).astype(jnp.int32)]
    )
    return rank_stack, sa, lcp, raw, dup_flag


_build_device_index = functools.partial(
    jax.jit, static_argnames=("k", "n_max", "levels")
)(device_index_program)


def collect_program(sa, lcp, lengths, *, k: int, n_max: int, levels: int):
    """Enumerate collected (deepest all-seq) nodes on device.

    Returns (collected mask over boundaries, start, end) arrays of length N.
    """
    n_total = k * n_max
    seq_sorted = (sa // n_max).astype(jnp.int32)
    pos_sorted = (sa % n_max).astype(jnp.int32)

    # ---- sparse table: range-min VALUES only.  The leftmost-argmin
    # table of the round-1 design doubled the biggest allocation
    # (2 x tlevels x N int32 was the HBM high-water mark at Mbp scale,
    # docs/PERFORMANCE.md); argmins are instead derived from the value
    # table by a threshold binary descent (see range_argmin below) ----
    tlevels = max(1, int(np.ceil(np.log2(max(n_total, 2)))) + 1)
    INF = jnp.int32(np.iinfo(np.int32).max)
    minv = [lcp]
    for t in range(tlevels - 1):
        half = 1 << t
        prev_v = minv[-1]
        shifted_v = jnp.concatenate([prev_v[half:], jnp.full(half, INF, jnp.int32)])
        minv.append(jnp.minimum(prev_v, shifted_v))
    minv_st = jnp.stack(minv)
    minv_flat = minv_st.reshape(-1)  # flattened: 1D gathers beat generic 2D

    idx = jnp.arange(n_total, dtype=jnp.int32)

    # PSV: largest j < i with lcp[j] < lcp[i]; lcp[0] = 0 is the sentinel.
    ln = jnp.zeros(n_total, jnp.int32)
    for t in range(tlevels - 1, -1, -1):
        j = idx - ln - jnp.int32(1 << t)
        ok = j >= 0
        mv = minv_st[t][jnp.maximum(j, 0)]
        grow = ok & (mv >= lcp)
        ln = jnp.where(grow, ln + jnp.int32(1 << t), ln)
    psv = idx - ln - 1  # may be -1

    # NSV: smallest j > i with lcp[j] < lcp[i]
    rn = jnp.zeros(n_total, jnp.int32)
    for t in range(tlevels - 1, -1, -1):
        j = idx + rn + 1
        ok = (j + jnp.int32(1 << t) - 1) <= jnp.int32(n_total - 1)
        mv = minv_st[t][jnp.minimum(j, n_total - 1)]
        grow = ok & (mv >= lcp)
        rn = jnp.where(grow, rn + jnp.int32(1 << t), rn)
    nsv = idx + rn + 1  # may be n_total

    start = jnp.maximum(psv, 0)  # interval start member
    end = nsv - 1  # interval end member (inclusive)

    def range_argmin(lo, hi):
        """leftmost argmin of lcp over [lo, hi], elementwise; lo <= hi.

        Two-phase, value-table only: (1) range min m via the classic
        two-window lookup; (2) leftmost j in [lo, hi] with lcp[j] <= m by
        binary descent — advance pos past every power-of-two window whose
        min stays > m.  Since m IS the range min, the landing position is
        exactly the leftmost argmin.
        """
        span = jnp.maximum(hi - lo + 1, 1)
        # exact floor(log2(span)) via integer comparisons; the two windows
        # [lo, lo+2^tt) and [hi-2^tt+1, hi] cover since 2^(tt+1) > span
        tt = jnp.zeros(span.shape, jnp.int32)
        for t in range(1, tlevels):
            tt = jnp.where(span >= jnp.int32(1 << t), jnp.int32(t), tt)
        pow_tt = jnp.left_shift(jnp.int32(1), tt)
        base = tt * jnp.int32(n_total)
        lv = minv_flat[base + lo]
        rstart = hi - pow_tt + 1
        rv = minv_flat[base + rstart]
        m = jnp.minimum(lv, rv)
        pos = lo
        for t in range(tlevels - 1, -1, -1):
            j_end = pos + jnp.int32((1 << t) - 1)
            ok = j_end <= hi
            wv = minv_st[t][jnp.minimum(pos, n_total - 1)]
            adv = ok & (wv > m)
            pos = jnp.where(adv, pos + jnp.int32(1 << t), pos)
        return pos

    # canonical boundary of the interval of boundary i: leftmost minimum in
    # [start+1, end] (non-empty whenever lcp[i] >= 1: i itself is inside)
    has_node = lcp >= 1
    canon = jnp.where(
        has_node, range_argmin(jnp.minimum(start + 1, n_total - 1), jnp.maximum(end, 0)), idx
    )
    is_canon = has_node & (canon == idx)

    # ---- all-sequences coverage of each boundary's interval ----
    # one fused (N+1, k) prefix-count instead of k separate cumsum passes
    one_hot = (
        seq_sorted[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
    ).astype(jnp.int32)
    pref = jnp.concatenate(
        [jnp.zeros((1, k), jnp.int32), jnp.cumsum(one_hot, axis=0)]
    )
    cnt = pref[end + 1] - pref[start]  # (N, k) via two row-gathers
    allseq = jnp.all(cnt >= 1, axis=1) & has_node

    # ---- mark parents that have an all-seq child ----
    lcp_ext = jnp.concatenate([lcp, jnp.zeros(1, jnp.int32)])
    left_d = lcp_ext[start]
    right_d = lcp_ext[jnp.minimum(end + 1, n_total)]
    parent_bound = jnp.where(left_d >= right_d, start, end + 1)
    parent_d = jnp.maximum(left_d, right_d)
    has_parent = is_canon & allseq & (parent_d >= 1)
    pb = jnp.where(has_parent, parent_bound, 0)
    # canonical boundary of the parent's interval
    p_start = jnp.maximum(psv[pb], 0)
    p_end = nsv[pb] - 1
    p_canon = range_argmin(
        jnp.minimum(p_start + 1, n_total - 1), jnp.maximum(p_end, 0)
    )
    haschild = jnp.zeros(n_total, dtype=bool).at[
        jnp.where(has_parent, p_canon, n_total - 1)
    ].max(has_parent)
    # note: scatter target n_total-1 for inactive lanes writes False (no-op)

    collected = is_canon & allseq & ~haschild
    return collected, start, end, pos_sorted, seq_sorted


_collect_device = functools.partial(
    jax.jit, static_argnames=("k", "n_max", "levels")
)(collect_program)


def linear_index_program(s, valid_n, *, total: int, levels: int):
    """Prefix-doubling suffix sort of ONE linear string (device twin of
    :func:`csa_tpu.align.anchors.build_linear_index`'s host loop).

    ``s``: (total,) int32, real values in ``[0, valid_n)`` (smaller values
    sort first — the caller encodes separators below character codes);
    pad slots get unique sentinel ranks above every real rank.  Returns
    ``(sa, lcp)`` where ``sa`` is the full sorted order (pads last) and
    ``lcp[i]`` is the LCP of sorted entries ``i-1``/``i`` (``lcp[0]=0``).

    Shifted ranks follow the linear convention ``rank2 = -1`` past the end
    of the string (matching numpy's host twin), NOT the cyclic wrap of
    :func:`device_index_program`.
    """
    g = jnp.arange(total, dtype=jnp.int32)
    big = jnp.int32(total)
    real = g < valid_n
    rank = jnp.where(real, s.astype(jnp.int32), big + g)
    rank_levels = [rank]
    order = None
    for t in range(levels - 1):
        pos2 = g + jnp.int32(1 << t)
        rank2 = jnp.where(
            real & (pos2 < valid_n),
            rank[jnp.minimum(pos2, total - 1)],
            jnp.int32(-1),
        )
        r1s, r2s, order = jax.lax.sort((rank, rank2, g), num_keys=2, is_stable=True)
        newgrp = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(jnp.int32),
            ]
        )
        dense = jnp.cumsum(newgrp)
        rank = jnp.zeros(total, jnp.int32).at[order].set(dense.astype(jnp.int32))
        rank = jnp.where(real, rank, big + g)
        rank_levels.append(rank)
    stack = jnp.stack(rank_levels)
    if order is None:
        sa = jnp.argsort(rank).astype(jnp.int32)
    else:
        sa = order.astype(jnp.int32)

    a = sa[:-1]
    b = sa[1:]
    off = jnp.zeros(total - 1, dtype=jnp.int32)
    for t in range(levels - 1, -1, -1):
        ga = a + off
        gb = b + off
        ok = (ga < valid_n) & (gb < valid_n)
        eq = ok & (
            stack[t][jnp.minimum(ga, total - 1)]
            == stack[t][jnp.minimum(gb, total - 1)]
        )
        off = jnp.where(eq, off + jnp.int32(1 << t), off)
    lcp = jnp.concatenate([jnp.zeros(1, jnp.int32), off])
    return sa, lcp


_linear_index_device = functools.partial(
    jax.jit, static_argnames=("total", "levels")
)(linear_index_program)


def linear_suffix_order(s_real: np.ndarray):
    """Host wrapper: pad, run the device linear sort, return (sa, lcp)
    over the real entries only (sorted order, pads stripped)."""
    n = len(s_real)
    total = _bucket(max(n, 8))
    levels = _linear_levels(total)
    s = np.zeros(total, dtype=np.int32)
    s[:n] = s_real
    sa, lcp = _linear_index_device(
        jnp.asarray(s), jnp.int32(n), total=total, levels=levels
    )
    sa = np.asarray(sa).astype(np.int64)
    lcp = np.asarray(lcp).astype(np.int64)
    return sa[:n], lcp[:n]


def build_index_jax(encoded: Sequence[np.ndarray]) -> cyclic.RotationIndex:
    """Build a :class:`cyclic.RotationIndex` using the device engine.

    Falls back to the numpy engine when duplicate rotations are present
    (degenerate periodic inputs; see docs/PARITY.md).
    """
    k = len(encoded)
    sizes = np.array([len(e) for e in encoded], dtype=np.int32)
    n_max = _bucket(int(sizes.max()))
    levels = _num_levels(n_max)
    codes = np.zeros((k, n_max), dtype=np.int32)
    for i, e in enumerate(encoded):
        codes[i, : len(e)] = e
    rank_stack, sa, lcp, raw, dup = _build_device_index(
        jnp.asarray(codes), jnp.asarray(sizes), k=k, n_max=n_max, levels=levels
    )
    if bool(dup):
        return cyclic.build_rotation_index(encoded)
    return _index_from_device(rank_stack, sa, lcp, raw, sizes, k, n_max,
                              codes=jnp.asarray(codes))


def collect_blocks_jax(
    encoded: Sequence[np.ndarray],
) -> Tuple[cyclic.RotationIndex, cyclic.BlockSet]:
    """Device-accelerated index build + block collection."""
    k = len(encoded)
    sizes = np.array([len(e) for e in encoded], dtype=np.int32)
    n_max = _bucket(int(sizes.max()))
    levels = _num_levels(n_max)
    codes = np.zeros((k, n_max), dtype=np.int32)
    for i, e in enumerate(encoded):
        codes[i, : len(e)] = e
    jsizes = jnp.asarray(sizes)
    rank_stack, sa, lcp, raw, dup = _build_device_index(
        jnp.asarray(codes), jsizes, k=k, n_max=n_max, levels=levels
    )
    if bool(dup):
        index = cyclic.build_rotation_index(encoded)
        return index, cyclic.collect_blocks(index)
    collected, start, end, _, _ = _collect_device(
        sa, lcp, jsizes, k=k, n_max=n_max, levels=levels
    )

    index = _index_from_device(rank_stack, sa, lcp, raw, sizes, k, n_max,
                               codes=jnp.asarray(codes))
    mask = np.asarray(collected)
    cstart = np.asarray(start)[mask].astype(np.int64)
    cend = np.asarray(end)[mask].astype(np.int64)
    cdepth = np.asarray(lcp)[mask].astype(np.int64)
    blocks = cyclic.BlockSet(index, cstart, cend, cdepth)
    return index, blocks


MAX_DEPTH_SLOTS = 512  # static bound on distinct block depths (escalated)


def compact_blocks_program(collected, start, end, lcp, *, cap: int):
    """Compact the collected-block mask to a static ``cap``-sized table."""
    nb = jnp.sum(collected).astype(jnp.int32)
    (bidx,) = jnp.nonzero(collected, size=cap, fill_value=0)
    bidx = bidx.astype(jnp.int32)
    valid = jnp.arange(cap, dtype=jnp.int32) < nb
    bstart = jnp.where(valid, start[bidx], 0)
    bend = jnp.where(valid, end[bidx], 0)
    bdepth = jnp.where(valid, lcp[bidx], 1)  # >=1 keeps log2 well-defined
    return nb, valid, bstart, bend, bdepth


def member_tables_program(sa, lengths, *, k: int, n_max: int):
    """Per-sequence member tables for occurrence queries.

    ``M[s]`` holds, in ascending order, the sorted-order indices of
    sequence ``s``'s real rotation entries (padded with ``n_total``);
    ``Mpos[s]`` holds the rotation start position of each such entry
    (pad slots hold 0).  Both tables are row-shardable over the "seq"
    mesh axis: a shard can answer occurrence-count / first-position
    queries for its own sequences locally (the sharded chain merge
    in :mod:`csa_tpu.parallel.sharded` relies on this).
    """
    n_total = k * n_max
    seq_sorted = (sa // n_max).astype(jnp.int32)
    pos_sorted = (sa % n_max).astype(jnp.int32)
    member_valid = pos_sorted < lengths[seq_sorted]
    seq_key = jnp.where(member_valid, seq_sorted, jnp.int32(k))
    ord2 = jnp.argsort(seq_key, stable=True).astype(jnp.int32)
    sorted_seq = seq_key[ord2]
    first_of_seq = jnp.searchsorted(
        sorted_seq, jnp.arange(k, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    col = jnp.arange(n_total, dtype=jnp.int32) - first_of_seq[
        jnp.minimum(sorted_seq, k - 1)
    ]
    flat = jnp.where(
        sorted_seq < k,
        sorted_seq * n_max + col,
        n_total,  # dump slot for pad members
    )
    M = (
        jnp.full(n_total + 1, jnp.int32(n_total), jnp.int32)
        .at[flat]
        .set(ord2)[:n_total]
        .reshape(k, n_max)
    )
    pos_ext = jnp.concatenate([pos_sorted, jnp.zeros(1, jnp.int32)])
    Mpos = pos_ext[M]
    return M, Mpos


def uniqueness_counts(M, Mpos, bstart, bend):
    """Occurrence counts + first positions per (sequence-row, block).

    ``M``/``Mpos`` may be a row shard of the full member tables; returns
    ``cnts (rows, cap)`` and ``first_pos (rows, cap)``.
    """
    rows, n_max = M.shape
    cap = bstart.shape[0]
    q_lo = jnp.broadcast_to(bstart, (rows, cap))
    q_hi = jnp.broadcast_to(bend + 1, (rows, cap))
    lo = jax.vmap(lambda row, q: jnp.searchsorted(row, q, side="left"))(M, q_lo)
    hi = jax.vmap(lambda row, q: jnp.searchsorted(row, q, side="left"))(M, q_hi)
    cnts = hi - lo  # (rows, cap)
    first_pos = Mpos[jnp.arange(rows)[:, None], jnp.minimum(lo, n_max - 1)]
    return cnts, first_pos


def suffix_filter_program(
    sa, lcp, lengths, valid, bstart, bend, bdepth, *, k: int, n_max: int, cap: int, slots: int
):
    """Suffix-containment filter (removeSuffixNodes semantics).

    Drop block i iff some strictly deeper block j has block i's string as
    its length-depth[i] suffix.  Exact via the suffix array itself: the
    length-d suffix of block j starts at rotation q = adv(rep_j, d_j - d);
    block i (depth d) contains that string iff q's sorted position lies in
    i's lcp-interval [bstart_i, bend_i].  Blocks of equal depth have
    disjoint intervals, so a (depth-slot, sorted-position) join decides
    membership with one search per block instead of a cap^2 matrix.

    Returns (keep_suffix (cap,) bool, num_distinct ()).
    """
    n_total = k * n_max

    def adv(gg, off):
        s = gg // n_max
        p = gg % n_max
        nn = jnp.maximum(lengths[s], 1)
        return s * n_max + (p + off) % nn

    BIG = jnp.int32(1 << 30)
    nslots = cap if cap < slots else slots
    uniqd = jnp.unique(
        jnp.where(valid, bdepth, BIG), size=nslots, fill_value=BIG
    )
    num_distinct = jnp.sum(uniqd < BIG).astype(jnp.int32)
    slot_of_block = jnp.searchsorted(uniqd, bdepth).astype(jnp.int32)

    inv_sa = (
        jnp.zeros(n_total, jnp.int32)
        .at[sa]
        .set(jnp.arange(n_total, dtype=jnp.int32))
    )
    rep = sa[bstart]
    dq = uniqd[None, :]  # (1, nslots)
    djm = bdepth[:, None]  # (cap, 1)
    qvalid = valid[:, None] & (dq < BIG) & (djm > dq)
    q_g = adv(rep[:, None], jnp.where(qvalid, djm - dq, 0))
    q_r = inv_sa[q_g]  # (cap, nslots) sorted position of each suffix start
    slot_mat = jnp.broadcast_to(
        jnp.arange(nslots, dtype=jnp.int32)[None, :], (cap, nslots)
    )
    key_slot = jnp.where(qvalid, slot_mat, jnp.int32(nslots)).reshape(-1)
    key_r = jnp.where(qvalid, q_r, jnp.int32(n_total)).reshape(-1)
    ks, rs = jax.lax.sort((key_slot, key_r), num_keys=2)
    seg = jnp.searchsorted(
        ks, jnp.arange(nslots + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    nq = cap * nslots
    lo0 = seg[slot_of_block]
    hi0 = seg[jnp.minimum(slot_of_block + 1, nslots)]

    def seg_lower_bound(target):
        lo, hi = lo0, hi0
        for _ in range(int(np.ceil(np.log2(nq + 1))) + 1):
            cond = lo < hi
            mid = (lo + hi) >> 1
            v = rs[jnp.clip(mid, 0, nq - 1)]
            less = v < target
            lo = jnp.where(cond & less, mid + 1, lo)
            hi = jnp.where(cond & ~less, mid, hi)
        return lo

    cnt_in = seg_lower_bound(bend + 1) - seg_lower_bound(bstart)
    keep_suffix = valid & (cnt_in == 0)
    return keep_suffix, num_distinct


def full_rotation_program(codes, lengths, *, k: int, n_max: int, levels: int, cap: int, slots: int = MAX_DEPTH_SLOTS):
    """Index + collect + suffix-filter + uniqueness + positions, fused.

    One device program covering the whole block stage of the reference
    rotation phase (csamsa.c:271-308: collectNodes, removeSuffixNodes,
    removeNonUniqueNodes + collectPositions), returning ONE packed int32
    vector so the host pays a single device round trip (the tunneled-chip
    transfer latency dominates wall time otherwise).

    Packed layout: [dup, nb, num_distinct,
                    bstart (cap), bend (cap), bdepth (cap),
                    keep_suffix (cap), unique (cap),
                    positions (cap*k, row-major block-major)].
    ``nb`` may exceed ``cap``; the host must re-run with a larger cap then.
    """
    rank_stack, sa, lcp, raw, dup = device_index_program(
        codes, lengths, k=k, n_max=n_max, levels=levels
    )
    collected, start, end, _, _ = collect_program(
        sa, lcp, lengths, k=k, n_max=n_max, levels=levels
    )
    nb, valid, bstart, bend, bdepth = compact_blocks_program(
        collected, start, end, lcp, cap=cap
    )
    M, Mpos = member_tables_program(sa, lengths, k=k, n_max=n_max)
    cnts, first_pos = uniqueness_counts(M, Mpos, bstart, bend)
    unique = jnp.all(cnts == 1, axis=0) & valid
    positions = first_pos.T  # (cap, k)
    keep_suffix, num_distinct = suffix_filter_program(
        sa, lcp, lengths, valid, bstart, bend, bdepth,
        k=k, n_max=n_max, cap=cap, slots=slots,
    )

    packed = jnp.concatenate(
        [
            jnp.stack([dup.astype(jnp.int32), nb, num_distinct]),
            bstart,
            bend,
            jnp.where(valid, bdepth, 0),
            keep_suffix.astype(jnp.int32),
            unique.astype(jnp.int32),
            positions.astype(jnp.int32).reshape(-1),
        ]
    )
    return packed, rank_stack, sa, lcp, raw


@functools.partial(
    jax.jit, static_argnames=("k", "n_max", "levels", "cap", "slots")
)
def _full_rotation_packed(codes, lengths, *, k, n_max, levels, cap, slots):
    """Packed-vector-only variant: the rank stack and suffix order are
    NOT program outputs, so XLA frees each rank level after its last LCP-
    descent use instead of pinning the whole (levels, k*n_max) stack —
    the difference between fitting and not fitting Mbp-scale sets in HBM
    (docs/PERFORMANCE.md memory model)."""
    packed, *_ = full_rotation_program(
        codes, lengths, k=k, n_max=n_max, levels=levels, cap=cap, slots=slots
    )
    return packed


class RotationBlocks:
    """Host view of the fused rotation block stage (one transfer)."""

    __slots__ = (
        "start", "end", "depth", "keep_suffix", "unique", "positions",
        "num_collected",
    )

    def __init__(self, arr: np.ndarray, cap: int, k: int, nb: int):
        f = arr[3:]
        self.num_collected = nb
        sl = lambda i: f[i * cap : (i + 1) * cap][:nb]
        self.start = sl(0).astype(np.int64)
        self.end = sl(1).astype(np.int64)
        self.depth = sl(2).astype(np.int64)
        self.keep_suffix = sl(3).astype(bool)
        self.unique = sl(4).astype(bool)
        self.positions = (
            f[5 * cap : (5 + k) * cap].reshape(cap, k)[:nb].astype(np.int64)
        )

    @classmethod
    def from_fields(
        cls, *, num_collected, start, end, depth, keep_suffix, unique, positions
    ) -> "RotationBlocks":
        self = object.__new__(cls)
        self.num_collected = int(num_collected)
        self.start = np.asarray(start).astype(np.int64)
        self.end = np.asarray(end).astype(np.int64)
        self.depth = np.asarray(depth).astype(np.int64)
        self.keep_suffix = np.asarray(keep_suffix).astype(bool)
        self.unique = np.asarray(unique).astype(bool)
        self.positions = np.asarray(positions).astype(np.int64)
        return self


def rotation_blocks_jax(encoded: Sequence[np.ndarray], cap: int = 4096):
    """Run the fused rotation block stage; returns ``RotationBlocks`` or
    ``None`` when duplicate within-sequence rotations demand the exact
    numpy fallback (degenerate periodic inputs, docs/PARITY.md)."""
    k = len(encoded)
    sizes = np.array([len(e) for e in encoded], dtype=np.int32)
    n_max = _bucket(int(sizes.max()))
    levels = _num_levels(n_max)
    codes = np.zeros((k, n_max), dtype=np.int32)
    for i, e in enumerate(encoded):
        codes[i, : len(e)] = e
    jc = jnp.asarray(codes)
    js = jnp.asarray(sizes)
    slots = MAX_DEPTH_SLOTS
    while True:
        packed = _full_rotation_packed(
            jc, js, k=k, n_max=n_max, levels=levels, cap=cap, slots=slots
        )
        arr = np.asarray(packed)  # the single device->host transfer
        dup, nb, ndepth = int(arr[0]), int(arr[1]), int(arr[2])
        if dup:
            return None
        if nb <= cap and ndepth <= slots:
            return RotationBlocks(arr, cap, k, nb)
        if nb > cap:
            cap = _bucket(nb, 1024)
        if ndepth > slots:
            slots = _bucket(ndepth, 256)


def _index_from_device(rank_stack, sa, lcp, raw, sizes, k, n_max,
                       codes=None):
    """Host RotationIndex view; the rank stack (and code matrix, for
    sub-PACK_W fingerprints) stays on the device and is consulted via
    :func:`device_fingerprint` (transfers of the full stack dominate wall
    time otherwise)."""
    sa_np = np.asarray(sa)
    lcp_np = np.asarray(lcp).astype(np.int64)
    raw_np = np.asarray(raw).astype(np.int64)
    seq_pad = sa_np // n_max
    pos_pad = sa_np % n_max
    real = pos_pad < sizes[seq_pad]
    sa_real = sa_np[real]
    m = len(sa_real)
    offsets = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(sizes.astype(np.int64), out=offsets[1:])
    total = int(offsets[-1])
    seq_of = np.repeat(np.arange(k, dtype=np.int64), sizes)
    pos_of = np.arange(total, dtype=np.int64) - offsets[seq_of]
    n_of = sizes.astype(np.int64)[seq_of]
    sa_compact = offsets[sa_real // n_max] + (sa_real % n_max)
    return cyclic.RotationIndex(
        seq_of=seq_of,
        pos_of=pos_of,
        n_of=n_of,
        offsets=offsets,
        levels=[],
        sa=sa_compact,
        lcp=lcp_np[:m],
        num_seqs=k,
        raw_lcp=raw_np[:m],
        device_ranks=(rank_stack, codes),
        device_layout=(k, n_max),
    )


@functools.partial(jax.jit, static_argnames=("n_max",))
def _fingerprint_mixed_device(rank_stack, codes, lengths, g_pad, t_arr,
                              off_arr, d_arr, *, n_max: int):
    """Mixed-depth fingerprints in ONE dispatch.

    Per element: for ``d >= PACK_W`` the classic two-overlapping-windows
    rank pair (level ``t_arr``, second window at offset ``off_arr``);
    for ``d < PACK_W`` the exact base-5 packed key of the first ``d``
    chars (read from the code matrix) with r2 = -1 — same-d comparisons
    only, so the two encodings never cross.
    """
    s = g_pad // n_max
    p = g_pad % n_max
    nn = jnp.maximum(lengths[s], 1)
    g2 = s * n_max + (p + off_arr) % nn
    r1 = rank_stack[t_arr, g_pad]
    r2 = rank_stack[t_arr, g2]
    cflat = codes.reshape(-1).astype(jnp.int32)
    acc = jnp.zeros_like(g_pad)
    for i in range(PACK_W - 1):
        gi = s * n_max + (p + jnp.int32(i)) % nn
        take = jnp.int32(i) < d_arr
        acc = jnp.where(take, acc * _ALPHA + cflat[gi], acc)
    short = d_arr < jnp.int32(PACK_W)
    r1 = jnp.where(short, acc, r1)
    r2 = jnp.where(short, jnp.int32(-1), r2)
    return r1, r2


def _fingerprint_params(d: np.ndarray):
    """Per-element packed level + second-window offset for d >= PACK_W
    (zeros for shorter depths, which take the char-packed path)."""
    d = np.asarray(d, dtype=np.int64)
    q = np.maximum(d // PACK_W, 1)
    t = np.zeros(len(d), dtype=np.int64)
    qq = q.copy()
    while np.any(qq > 1):
        grow = qq > 1
        t[grow] += 1
        qq[grow] >>= 1
    off = d - (np.int64(PACK_W) << t)
    shortm = d < PACK_W
    return (
        np.where(shortm, 0, t).astype(np.int32),
        np.where(shortm, 0, off).astype(np.int32),
    )


def device_fingerprint_mixed(index: cyclic.RotationIndex, g: np.ndarray, d: np.ndarray):
    """Fingerprints for per-element prefix lengths ``d`` (one dispatch)."""
    k, n_max = index.device_layout
    g = np.asarray(g, dtype=np.int64)
    d = np.asarray(d, dtype=np.int64)
    seq = index.seq_of[g]
    g_pad = (seq * n_max + index.pos_of[g]).astype(np.int32)
    t, off = _fingerprint_params(d)
    lengths = index.n_of[index.offsets[:-1]].astype(np.int32)
    rank_stack, codes = index.device_ranks
    r1, r2 = _fingerprint_mixed_device(
        rank_stack,
        codes,
        jnp.asarray(lengths),
        jnp.asarray(g_pad),
        jnp.asarray(t),
        jnp.asarray(off),
        jnp.asarray(d.astype(np.int32)),
        n_max=n_max,
    )
    r1 = np.asarray(r1).astype(np.int64)
    r2 = np.asarray(r2).astype(np.int64)
    return r1 * np.int64(k * n_max + 1) + r2


def device_fingerprint(index: cyclic.RotationIndex, g: np.ndarray, d: int):
    """Fingerprint length-``d`` prefixes via on-device rank gathers."""
    g = np.asarray(g, dtype=np.int64)
    return device_fingerprint_mixed(
        index, g, np.full(len(g), int(d), dtype=np.int64)
    )
