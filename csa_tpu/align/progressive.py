"""Progressive profile DP over inter-anchor gaps.

Exact-semantics re-implementation of the reference's per-gap MSA engine
(``/root/reference/source/dynamicprogramming.c``): sequences ordered
shortest-first (``SortSequencesForDP`` :276-308, the live selection-sort
part), each aligned by Needleman-Wunsch against the expanding column-count
profile (recurrence :993-998 with tie-break diag >= left >= up
:1014-1026), consensus grown during backtrack (:1032-1138), followed by
the gap-block shift compaction pass (``DeleteGappedColumns`` :643-899).

Scores: MATCH +1, DOUBLEGAP 0, MISMATCH -1, INDEL -1 (:16-19).

The DP fill is vectorized over anti-diagonals (numpy backend) or executed
on the accelerator (:mod:`csa_tpu.dp` wavefront kernel); both produce the
identical integer score/direction matrices, so parity does not depend on
the backend.

Char codes: A=0 C=1 G=2 T=3 gap=4.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

MATCH = 1
DOUBLEGAP = 0
MISMATCH = -1
INDEL = -1
GAP = 4

# direction codes
D_DIAG = 0
D_LEFT = 1
D_UP = 2

# optional debug hook: when set to a list, every applied gap-block shift
# appends (col, dirsignal, bestshift, bestscore, ntoshift, maxposaffected)
SHIFT_TRACE = None


def sort_sequences_for_dp(gaplens: np.ndarray):
    """Selection sort, shortest gap first (dynamicprogramming.c:276-308).

    Returns (orderedseqs, seqlengths) exactly as the reference computes
    them (first minimum wins; swap placement).
    """
    k = len(gaplens)
    ordered = list(range(k))
    lens = [int(x) for x in gaplens]
    for i in range(k - 1):
        minv = lens[i]
        minpos = i
        for j in range(i + 1, k):
            if lens[j] < minv:
                minv = lens[j]
                minpos = j
        if minpos != i:
            ordered[i], ordered[minpos] = ordered[minpos], ordered[i]
            lens[i], lens[minpos] = lens[minpos], lens[i]
    return ordered, lens


def default_top_row(scorevector: np.ndarray, i: int) -> np.ndarray:
    """Fresh dp[0][*] boundary: cumulative horizontal gap costs
    (dynamicprogramming.c:969-973)."""
    sv_gap = scorevector[:, GAP]
    colgap = DOUBLEGAP * sv_gap + INDEL * (i - sv_gap)
    return np.concatenate([[np.int64(0)], np.cumsum(colgap)])


def dp_fill(
    row_codes: np.ndarray,
    scorevector: np.ndarray,
    i: int,
    top_row: Optional[np.ndarray] = None,
    edge_rowgap: Optional[int] = None,
):
    """Fill the DP matrix for one sequence against the current profile.

    row_codes: (nrows,) char codes of the sequence's gap substring.
    scorevector: (ncols, 5) counts of each char code per profile column
    (0-indexed here; the reference's column c is scorevector[c-1]).
    i: number of previously aligned sequences.
    top_row / edge_rowgap: dp boundary values (dp[0][*] and the per-row
    scale of dp[j][0]).  The reference re-initializes these only when it
    reallocates its DP matrix (dynamicprogramming.c:957-987), so between
    same-shape merges they are STALE values from the allocating merge;
    progressive_dp threads the emulated allocation state through here.
    Defaults reproduce a fresh allocation.

    Returns (score, dirs) where dirs is (nrows+1, ncols+1) int8.
    Dispatches to the native host kernel when built (bit-identical);
    falls back to the anti-diagonal numpy sweep.
    """
    if top_row is None:
        top_row = default_top_row(scorevector, i)
    if edge_rowgap is None:
        edge_rowgap = INDEL * i
    if len(row_codes) and len(scorevector):
        from .. import native

        res = native.dp_fill_dirs(row_codes, scorevector, i, top_row, edge_rowgap)
        if res is not None:
            return res
    nrows = len(row_codes)
    ncols = len(scorevector)
    sv_gap = scorevector[:, GAP]  # (ncols,)

    # per-(row j, col c) substitution score and move costs
    # score(j,c) = MATCH*cnt[char_j] + INDEL*cnt[gap] + MISMATCH*(i - cnt[char_j] - cnt[gap])
    cnt_char = scorevector[:, :4].take(row_codes, axis=1).T  # (nrows, ncols)
    sub = (
        MATCH * cnt_char
        + INDEL * sv_gap[None, :]
        + MISMATCH * (i - cnt_char - sv_gap[None, :])
    )
    rowgap = INDEL * i  # scalar, vertical move
    colgap = DOUBLEGAP * sv_gap + INDEL * (i - sv_gap)  # (ncols,), horizontal

    dp = np.zeros((nrows + 1, ncols + 1), dtype=np.int64)
    dirs = np.zeros((nrows + 1, ncols + 1), dtype=np.int8)
    dp[:, 0] = np.arange(nrows + 1) * edge_rowgap
    dp[0, :] = top_row[: ncols + 1]
    dirs[:, 0] = D_UP
    dirs[0, 1:] = D_LEFT
    dirs[0, 0] = D_DIAG

    # anti-diagonal sweep: cells (j, c) with j + c = d
    for d in range(2, nrows + ncols + 1):
        j_lo = max(1, d - ncols)
        j_hi = min(nrows, d - 1)
        if j_lo > j_hi:
            continue
        j = np.arange(j_lo, j_hi + 1)
        c = d - j
        diag = dp[j - 1, c - 1] + sub[j - 1, c - 1]
        up = dp[j - 1, c] + rowgap
        left = dp[j, c - 1] + colgap[c - 1]
        take_diag = (diag >= up) & (diag >= left)
        take_left = ~take_diag & (left >= up)
        val = np.where(take_diag, diag, np.where(take_left, left, up))
        dp[j, c] = val
        dirs[j, c] = np.where(
            take_diag, D_DIAG, np.where(take_left, D_LEFT, D_UP)
        ).astype(np.int8)
    return int(dp[nrows, ncols]), dirs


def _dirs_to_maps(dirs: np.ndarray, nrows: int, ncols: int):
    """Walk the direction matrix from (nrows, ncols) back to (0, 0),
    recording per new column the source old column (-1 for a fresh
    all-gap column) and the current-sequence row (-1 for a gap in the
    current sequence); returned in forward (left-to-right) order."""
    j, c = nrows, ncols
    old_cols_r: List[int] = []
    row_r: List[int] = []
    while j > 0 and c > 0:
        dcode = dirs[j, c]
        if dcode == D_DIAG:
            old_cols_r.append(c - 1)
            row_r.append(j - 1)
            j -= 1
            c -= 1
        elif dcode == D_LEFT:
            old_cols_r.append(c - 1)
            row_r.append(-1)
            c -= 1
        else:  # D_UP
            old_cols_r.append(-1)
            row_r.append(j - 1)
            j -= 1
    while j > 0:
        old_cols_r.append(-1)
        row_r.append(j - 1)
        j -= 1
    while c > 0:
        old_cols_r.append(c - 1)
        row_r.append(-1)
        c -= 1
    old_cols = np.asarray(old_cols_r[::-1], dtype=np.int64)
    rows = np.asarray(row_r[::-1], dtype=np.int64)
    return old_cols, rows


def _path_to_maps(path_codes: np.ndarray):
    """Same maps from a walk-order direction-code path (device backtrack,
    :func:`csa_tpu.dp.wavefront.dp_path_device`), vectorized: in forward
    order, the t-th row-consuming step consumes row (count-1), ditto
    columns."""
    codes_f = np.asarray(path_codes[::-1], dtype=np.int64)
    adv_row = codes_f != D_LEFT
    adv_col = codes_f != D_UP
    rows = np.where(adv_row, np.cumsum(adv_row) - 1, -1)
    old_cols = np.where(adv_col, np.cumsum(adv_col) - 1, -1)
    return old_cols, rows


def backtrack_merge(
    dirs: np.ndarray,
    row_codes: np.ndarray,
    strings: List[Optional[np.ndarray]],
    scorevector: np.ndarray,
    ordered: List[int],
    i: int,
    n: int,
):
    """Backtrack, producing the merged strings + scorevector.

    strings: per-sequence code arrays (gap = 4) of the current consensus
    (length ncols) for the first i ordered sequences; returns
    (new_strings, new_scorevector, consensussize).
    """
    nrows = len(row_codes)
    ncols = len(scorevector)
    old_cols, rows = _dirs_to_maps(dirs, nrows, ncols)
    return _merge_from_maps(
        old_cols, rows, row_codes, strings, scorevector, ordered, i, n
    )


def merge_from_path(
    path_codes: np.ndarray,
    row_codes: np.ndarray,
    strings: List[Optional[np.ndarray]],
    scorevector: np.ndarray,
    ordered: List[int],
    i: int,
    n: int,
):
    """backtrack_merge from a device-produced walk-order path."""
    old_cols, rows = _path_to_maps(path_codes)
    return _merge_from_maps(
        old_cols, rows, row_codes, strings, scorevector, ordered, i, n
    )


def _merge_from_maps(
    old_cols: np.ndarray,
    rows: np.ndarray,
    row_codes: np.ndarray,
    strings: List[Optional[np.ndarray]],
    scorevector: np.ndarray,
    ordered: List[int],
    i: int,
    n: int,
):
    consensussize = len(old_cols)

    has_old = old_cols >= 0
    has_row = rows >= 0
    old_idx = old_cols[has_old]

    new_sv = np.zeros((consensussize, 5), dtype=np.int64)
    new_sv[has_old] = scorevector[old_idx]
    new_sv[~has_old, GAP] = i
    cur = np.full(consensussize, GAP, dtype=np.int8)
    cur[has_row] = row_codes[rows[has_row]].astype(np.int8)
    np.add.at(new_sv, (np.arange(consensussize), cur.astype(np.int64)), 1)

    new_strings: List[Optional[np.ndarray]] = [None] * len(strings)
    for t in range(i):
        p = ordered[t]
        ns = np.full(consensussize, GAP, dtype=np.int8)
        ns[has_old] = strings[p][old_idx]
        new_strings[p] = ns
    new_strings[n] = cur
    return new_strings, new_sv, consensussize


def _run_scan(window: np.ndarray, start: int, limit: int, value: int,
              find_value: bool) -> int:
    """First index >= start where window == value (find_value) or
    != value (not find_value); returns limit if none.  Doubling chunks
    keep short runs cheap inside huge windows."""
    chunk = 64
    pos = start
    while pos < limit:
        end = min(pos + chunk, limit)
        seg = window[pos:end]
        hits = np.nonzero((seg == value) if find_value else (seg != value))[0]
        if len(hits):
            return pos + int(hits[0])
        pos = end
        chunk *= 4
    return limit


def delete_gapped_columns(
    usableseqs: List[int],
    strings: List[Optional[np.ndarray]],
    numseqs: int,
    scorevector: np.ndarray,
    consize: int,
    maxnongaps: int,
):
    """Gap-block shift compaction (dynamicprogramming.c:643-899), exact.

    strings are code arrays of logical length >= consize (codes 0-4);
    scorevector is (cap, 5) with logical length consize.  Returns the new
    consize; strings and scorevector are modified in place.

    Dispatches to the native host kernel (csa_host.cpp::csa_dgc,
    bit-identical) unless the SHIFT_TRACE debug hook is armed; the numpy
    path below is the exactness twin and fallback.
    """
    if SHIFT_TRACE is None and consize:
        from .. import native

        res = native.dgc(
            usableseqs, strings, numseqs, scorevector, consize, maxnongaps
        )
        if res is not None:
            return res
    mingaps = numseqs - maxnongaps
    col = 1
    while col <= consize:
        if scorevector[col - 1, GAP] < mingaps:
            col += 1
            continue
        seqstoshift = [
            ii for ii in usableseqs[:numseqs] if strings[ii][col - 1] != GAP
        ]
        ntoshift = len(seqstoshift)
        if ntoshift == 0:
            col += 1
            continue
        bestscore = 0
        bestshift = 0
        bestdir = 0
        best_nposaffected = None
        best_maxposaffected = 0
        best_workingsv = None
        looplimit = consize + 1
        dirsignal = 1
        while True:
            # find, per shifting sequence, the non-gap run from col and the
            # gap run after it, in direction dirsignal (vectorized scans)
            postonextgap = []
            nnextgaps = []
            hit_end = False
            postofarthestgap = 0
            minnextgaps = consize
            for ii in seqstoshift:
                s = strings[ii]
                if dirsignal > 0:
                    window = s[col - 1 : looplimit - 1]
                else:
                    window = s[col - 1 :: -1]  # looplimit is 0 going left
                wlen = len(window)
                cnt = _run_scan(window, 0, wlen, GAP, find_value=True)
                if cnt >= wlen:
                    hit_end = True
                    break
                postonextgap.append(cnt)
                if cnt > postofarthestgap:
                    postofarthestgap = cnt
                gend = _run_scan(window, cnt, wlen, GAP, find_value=False)
                g = gend - cnt
                nnextgaps.append(g)
                if g < minnextgaps:
                    minnextgaps = g
            if hit_end:
                if dirsignal == -1:
                    break
                looplimit = 0
                dirsignal = -1
                continue
            nposaffected = [p + minnextgaps for p in postonextgap]
            maxposaffected = postofarthestgap + minnextgaps

            # static / moving count vectors over the affected window
            cols_idx = col + dirsignal * np.arange(maxposaffected) - 1
            staticsv = scorevector[cols_idx].copy()  # (maxpos, 5)
            movingsv = np.zeros((maxposaffected, 5), dtype=np.int64)
            window_codes = np.stack(
                [strings[ii][cols_idx] for ii in seqstoshift]
            ).astype(np.int64)  # (ntoshift, maxpos)
            inblock = (
                np.arange(maxposaffected)[None, :]
                < np.asarray(nposaffected)[:, None]
            )
            for kk in range(ntoshift):
                idxs = np.nonzero(inblock[kk])[0]
                np.add.at(movingsv, (idxs, window_codes[kk][idxs]), 1)
            staticsv = staticsv - movingsv

            # current (unshifted) score of the moving chars
            sv_win = scorevector[cols_idx]
            mc = movingsv[:, :4]
            sc = sv_win[:, :4]
            colscore = np.where(
                mc != 0,
                mc
                * (
                    MATCH * (sc - 1)
                    + MISMATCH
                    * (numseqs - (sc + sv_win[:, GAP][:, None]))
                    + INDEL * sv_win[:, GAP][:, None]
                ),
                0,
            ).sum()
            mg = movingsv[:, GAP]
            colscore += np.where(
                mg != 0,
                mg
                * (
                    DOUBLEGAP * (sv_win[:, GAP] - 1)
                    + INDEL * (numseqs - sv_win[:, GAP])
                ),
                0,
            ).sum()
            currentscore = int(colscore)

            # simulate shifts 1..minnextgaps; the reference peels one
            # trailing gap off each moving block per iteration
            moving_i = movingsv.copy()
            nposaff_i = list(nposaffected)
            found_dir_best = False
            for sh in range(1, minnextgaps + 1):
                for kk in range(ntoshift):
                    nposaff_i[kk] -= 1
                    moving_i[nposaff_i[kk], GAP] -= 1
                working = np.empty_like(staticsv)
                jarr = np.arange(maxposaffected)
                lead = jarr < sh
                working[lead] = 0
                working[lead, GAP] = staticsv[lead, GAP] + ntoshift
                src = np.clip(jarr - sh, 0, maxposaffected - 1)
                working[~lead] = staticsv[~lead] + moving_i[src[~lead]]
                full_gap = working[:, GAP] == numseqs
                wsc = working[:, :4]
                wg = working[:, GAP]
                sc_lead = np.where(
                    lead & ~full_gap,
                    ntoshift
                    * (DOUBLEGAP * (wg - 1) + INDEL * (numseqs - wg)),
                    0,
                )
                msrc = moving_i[src]
                sc_body_c = np.where(
                    (~lead & ~full_gap)[:, None] & (msrc[:, :4] != 0),
                    msrc[:, :4]
                    * (
                        MATCH * (wsc - 1)
                        + MISMATCH * (numseqs - (wsc + wg[:, None]))
                        + INDEL * wg[:, None]
                    ),
                    0,
                ).sum(axis=1)
                sc_body_g = np.where(
                    (~lead & ~full_gap) & (msrc[:, GAP] != 0),
                    msrc[:, GAP]
                    * (DOUBLEGAP * (wg - 1) + INDEL * (numseqs - wg)),
                    0,
                )
                shifted = int(
                    sc_lead.sum() + sc_body_c.sum() + sc_body_g.sum()
                ) - currentscore
                if shifted >= bestscore:
                    bestshift = dirsignal * sh
                    bestscore = shifted
                    found_dir_best = True
            if bestshift != 0 and bestshift * dirsignal > 0:
                best_maxposaffected = maxposaffected
                sh = bestshift * dirsignal
                nrem = minnextgaps - sh
                # moving_i has all minnextgaps trailing gaps peeled; the
                # reference re-adds the nrem still-remaining ones (:800-807)
                moving_best = moving_i.copy()
                for kk in range(ntoshift):
                    mpos = postonextgap[kk]
                    for t in range(nrem):
                        moving_best[mpos + t, GAP] += 1
                best_nposaffected = [postonextgap[kk] + sh for kk in range(ntoshift)]
                jarr = np.arange(maxposaffected)
                lead = jarr < sh
                bw = np.empty_like(staticsv)
                bw[lead] = staticsv[lead]
                bw[lead, GAP] += ntoshift
                src = np.clip(jarr - sh, 0, maxposaffected - 1)
                bw[~lead] = staticsv[~lead] + moving_best[src[~lead]]
                best_workingsv = bw
                bestdir = dirsignal
            if dirsignal == -1:
                break
            looplimit = 0
            dirsignal = -1
        if bestshift == 0:
            col += 1
            continue
        dirsignal = 1
        if bestshift < 0:
            dirsignal = -1
            bestshift = -bestshift
        if SHIFT_TRACE is not None:
            SHIFT_TRACE.append(
                (col, dirsignal, bestshift, bestscore, ntoshift,
                 best_maxposaffected,
                 tuple(usableseqs[:numseqs]), tuple(seqstoshift))
            )
        # apply: counts
        cols_idx = col + dirsignal * np.arange(best_maxposaffected) - 1
        scorevector[cols_idx] = best_workingsv
        # apply: shift string chars (vectorized block move + gap fill)
        for kk, ii in enumerate(seqstoshift):
            s = strings[ii]
            np_aff = best_nposaffected[kk]
            if dirsignal > 0:
                src = s[col - 1 : col - 1 + np_aff - bestshift].copy()
                s[col - 1 + bestshift : col - 1 + np_aff] = src
                s[col - 1 : col - 1 + bestshift] = GAP
            else:
                src = s[col - np_aff + bestshift : col].copy()
                s[col - np_aff : col - bestshift] = src
                s[col - bestshift : col] = GAP
        # remove all-gap columns around col
        n_ = consize
        mrun = 0
        j = col
        while j <= n_ and scorevector[j - 1, GAP] == numseqs:
            mrun += 1
            j += 1
        krun = 0
        j = col - 1
        while j >= 1 and scorevector[j - 1, GAP] == numseqs:
            krun += 1
            j -= 1
        mtot = mrun + krun
        start = col - krun  # leftmost empty column (1-based)
        if mtot > 0:
            # shift left by mtot from start..n-mtot
            src_lo = start + mtot - 1  # 0-based source start
            dst_lo = start - 1
            length = n_ - mtot - start + 1
            if length > 0:
                scorevector[dst_lo : dst_lo + length] = scorevector[
                    src_lo : src_lo + length
                ]
                for ii in usableseqs[:numseqs]:
                    strings[ii][dst_lo : dst_lo + length] = strings[ii][
                        src_lo : src_lo + length
                    ]
            scorevector[n_ - mtot : n_] = 0
            consize = consize - mtot
        col = col - (krun + 1)
        col += 1  # reference: for-loop increment after `col=(col-(k+1))`
    return consize


# Device-routing gates: a device merge only pays off when the matrix
# amortizes the dispatch round trip over the tunneled chip.  Defaults
# live in config.RunConfig (device_min_cells / batch_min_cells, set by
# the round-4 Pallas-kernel crossover measurements in
# docs/PERFORMANCE.md); CSA_TPU_DEVICE_MIN_CELLS / CSA_TPU_BATCH_MIN_CELLS
# remain as emergency env overrides.


def device_min_cells() -> int:
    """Per-merge gate: below this many cells the native host fill wins."""
    import os

    env = os.environ.get("CSA_TPU_DEVICE_MIN_CELLS")
    if env:
        return int(env)
    from ..config import run_config

    return run_config().device_min_cells


def batch_device_min_cells() -> int:
    """Whole-round gate for the batched launch: rounds below this total
    cell count are cheaper on the host than one dispatch round trip."""
    import os

    env = os.environ.get("CSA_TPU_BATCH_MIN_CELLS")
    if env:
        return int(env)
    from ..config import run_config

    return run_config().batch_min_cells
BATCH_DIRS_CAP = 1 << 30  # max padded batched direction-tensor bytes


class GapProgressiveState:
    """Step-wise host state of ONE gap's progressive merge sequence.

    Factors the ProgressiveDP loop (dynamicprogramming.c:906-1171) into
    ``prepare() -> fill inputs`` / ``apply(maps) -> merge + DGC`` steps
    so independent gaps can run their i-th merges as one batched device
    launch (:func:`progressive_dp_batched`) while the single-gap path
    (:func:`progressive_dp`) drives the exact same transitions.
    """

    def __init__(self, gap_codes: List[np.ndarray]):
        k = len(gap_codes)
        self.k = k
        self.gap_codes = gap_codes
        gaplens = np.array([len(g) for g in gap_codes], dtype=np.int64)
        self.ordered, self.lens = sort_sequences_for_dp(gaplens)
        self.strings: List[Optional[np.ndarray]] = [None] * k
        self.consensussize = self.lens[0]
        n0 = self.ordered[0]
        self.scorevector = np.zeros((self.consensussize, 5), dtype=np.int64)
        cur = np.asarray(gap_codes[n0], dtype=np.int8)
        self.strings[n0] = cur.copy()
        if self.consensussize:
            np.add.at(
                self.scorevector,
                (np.arange(self.consensussize), cur.astype(np.int64)),
                1,
            )
        # emulated DP-matrix allocation state: the reference reallocates
        # (and re-initializes the dp boundaries) only when the column
        # count changed or the row count grew
        # (dynamicprogramming.c:957-987); otherwise the boundary
        # row/column keep the allocating merge's values
        self.prev_consensussize = 0
        self.prev_nrows = 0
        self.alloc_top: Optional[np.ndarray] = None
        self.alloc_rowgap = 0
        self.i = 1

    def _skip_trivial(self):
        while self.i < self.k and self.lens[self.i] == 0:
            n = self.ordered[self.i]
            self.strings[n] = np.full(self.consensussize, GAP, dtype=np.int8)
            self.i += 1

    def prepare(self):
        """Fill inputs of the next merge, or None when all merges done.

        Returns (row_codes, scorevector view, i, top_row view,
        edge_rowgap); mutates the emulated allocation state, so call it
        exactly once per merge.
        """
        self._skip_trivial()
        if self.i >= self.k:
            return None
        i = self.i
        ncols = self.consensussize
        nrows = self.lens[i]
        if ncols != self.prev_consensussize or nrows > self.prev_nrows:
            self.alloc_rowgap = INDEL * i
            self.alloc_top = default_top_row(self.scorevector[:ncols], i)
            self.prev_nrows = nrows
        row_codes = np.asarray(self.gap_codes[self.ordered[i]], dtype=np.int64)
        return (
            row_codes,
            self.scorevector[:ncols],
            i,
            self.alloc_top[: ncols + 1],
            self.alloc_rowgap,
        )

    def apply(self, old_cols: np.ndarray, rows: np.ndarray):
        """Merge the prepared sequence via alignment maps, then DGC."""
        from ..utils.profiling import PROFILER

        i = self.i
        ncols = self.consensussize
        n = self.ordered[i]
        row_codes = np.asarray(self.gap_codes[n], dtype=np.int64)
        strings_l = [None if s is None else s[:ncols] for s in self.strings]
        with PROFILER.phase("align.dp_merge"):
            new_strings, new_sv, consensussize = _merge_from_maps(
                old_cols, rows, row_codes, strings_l,
                self.scorevector[:ncols], self.ordered, i, n,
            )
        self.prev_consensussize = ncols
        self.strings = new_strings
        self.scorevector = new_sv
        self.consensussize = consensussize
        if i > 1:
            with PROFILER.phase("align.dgc"):
                self.consensussize = delete_gapped_columns(
                    self.ordered, self.strings, i + 1, self.scorevector,
                    self.consensussize, (i + 1) // 2,
                )
        self.i += 1

    def results(self) -> List[np.ndarray]:
        self._skip_trivial()
        cs = self.consensussize
        return [
            (s[:cs] if s is not None else np.full(cs, GAP, dtype=np.int8))
            for s in self.strings
        ]


def _fill_to_maps(prep, dp_backend: str):
    """Run one prepared fill on the chosen backend; returns maps."""
    row_codes, sv, i, top, erg = prep
    nrows = len(row_codes)
    ncols = len(sv)
    from ..utils.profiling import PROFILER

    PROFILER.add("dp_cells", nrows * ncols)
    if dp_backend == "jax" and nrows * ncols >= device_min_cells():
        from ..dp import wavefront

        PROFILER.add("dp_device_dispatches", 1)
        with PROFILER.phase("align.dp_fill"):
            path = wavefront.dp_path_device(
                row_codes, sv, i, top_row=top, edge_rowgap=erg
            )
        return _path_to_maps(path)
    from .. import native

    if nrows and ncols:
        with PROFILER.phase("align.dp_fill"):
            res = native.dp_fill_path(row_codes, sv, i, top, erg)
        if res is not None:
            return _path_to_maps(res[1])
    with PROFILER.phase("align.dp_fill"):
        _, dirs = dp_fill(row_codes, sv, i, top_row=top, edge_rowgap=erg)
    return _dirs_to_maps(dirs, nrows, ncols)


def progressive_dp(
    gap_codes: List[np.ndarray],
    *,
    dp_backend: str = "numpy",
) -> List[np.ndarray]:
    """Align the per-sequence gap substrings; returns code strings.

    gap_codes[i] = char codes (0-3) of sequence i's gap substring.
    Mirrors ProgressiveDP (dynamicprogramming.c:906-1171): shortest-first
    ordering, NW vs profile, backtrack merge, DeleteGappedColumns after
    each merge from the 3rd sequence on.

    dp_backend "jax" routes merges with >= device_min_cells() cells to the
    accelerator (fill + backtrack both on device, only the O(R+C) path
    transferred); smaller merges stay on the native host kernel.  All
    paths produce identical direction decisions, so the output is
    backend-independent (tests/test_dp_wavefront.py).
    """
    st = GapProgressiveState(gap_codes)
    while True:
        prep = st.prepare()
        if prep is None:
            break
        old_cols, rows = _fill_to_maps(prep, dp_backend)
        st.apply(old_cols, rows)
    return st.results()


def progressive_dp_batched(
    gaps: List[List[np.ndarray]],
    *,
    min_batch: int = 2,
    mesh=None,
) -> List[List[np.ndarray]]:
    """Align MANY independent inter-anchor gaps, batching the i-th merge
    of every gap into ONE padded device launch (alignment.c:179-208:
    each gap is an independent sub-problem; SURVEY.md §7 M2).

    Host state transitions (merge + DeleteGappedColumns) are the exact
    single-gap ones, so output is identical to per-gap progressive_dp.
    """
    from ..dp import wavefront
    from ..utils.profiling import PROFILER

    states = [GapProgressiveState(g) for g in gaps]
    while True:
        preps = []
        for idx, st in enumerate(states):
            p = st.prepare()
            if p is not None:
                preps.append((idx, p))
        if not preps:
            break
        # degenerate fills (empty rows/cols) take the host path; the
        # rest go to the device as one batch
        dev = [(idx, p) for idx, p in preps if len(p[0]) and len(p[1])]
        host = [(idx, p) for idx, p in preps if not (len(p[0]) and len(p[1]))]
        if dev:
            # the batched direction tensor is Gp x Rp x Cp int8; a few
            # giant gaps (Primates' 4.6 kbp control region, Set3's
            # ~17k x 28k merges) would force every lane to their padded
            # dims.  Partition by size: grow the batch smallest-first
            # while the padded tensor stays under the cap; the leftover
            # giants run as individual device launches.
            dev.sort(key=lambda ip: len(ip[1][0]) * len(ip[1][1]))
            batch = []
            rmax = cmax = 0
            for item in dev:
                r = max(rmax, len(item[1][0]))
                c = max(cmax, len(item[1][1]))
                gp = max(8, 1 << max(0, len(batch)).bit_length())
                if gp * (r + 512) * (c + 512) > BATCH_DIRS_CAP and batch:
                    break
                batch.append(item)
                rmax, cmax = r, c
            giants = dev[len(batch):]
            for idx, p in giants:
                if mesh is not None:
                    # mesh present: run the giant merge column-sharded
                    # with halo exchange (SURVEY §5 long-context row);
                    # only the O(R+C) path crosses the host link
                    from ..dp import seqpar

                    PROFILER.add("dp_cells", len(p[0]) * len(p[1]))
                    PROFILER.add("dp_device_dispatches", 1)
                    with PROFILER.phase("align.dp_fill"):
                        path = seqpar.dp_path_seqpar(
                            p[0], p[1], p[2], mesh=mesh,
                            top_row=p[3], edge_rowgap=p[4],
                        )
                    old_cols, rows = _path_to_maps(path)
                else:
                    old_cols, rows = _fill_to_maps(p, "jax")
                states[idx].apply(old_cols, rows)
            dev = batch
        round_cells = sum(len(p[0]) * len(p[1]) for _, p in dev)
        if dev and mesh is None and round_cells < batch_device_min_cells():
            # the whole round is cheaper on the host than one dispatch
            # round trip over the tunnel; run it there (bit-identical)
            for idx, p in dev:
                old_cols, rows = _fill_to_maps(p, "numpy")
                states[idx].apply(old_cols, rows)
            dev = []
        if len(dev) >= min_batch:
            for (idx, p) in dev:
                PROFILER.add("dp_cells", len(p[0]) * len(p[1]))
            PROFILER.add("dp_device_dispatches", 1)
            with PROFILER.phase("align.dp_fill"):
                if mesh is not None:
                    paths = wavefront.dp_paths_device_sharded(
                        [p for _, p in dev], mesh=mesh
                    )
                else:
                    paths = wavefront.dp_paths_device_batched(
                        [p for _, p in dev]
                    )
            for (idx, _), path in zip(dev, paths):
                old_cols, rows = _path_to_maps(path)
                states[idx].apply(old_cols, rows)
        else:
            # sub-batch leftovers keep the per-merge device routing
            # (device for >= device_min_cells(), native below)
            for idx, p in dev:
                old_cols, rows = _fill_to_maps(p, "jax")
                states[idx].apply(old_cols, rows)
        for idx, p in host:
            old_cols, rows = _fill_to_maps(p, "numpy")
            states[idx].apply(old_cols, rows)
    return [st.results() for st in states]
