"""Device wavefront for the progressive profile NW fill.

The reference's DP inner loop (``dynamicprogramming.c:990-1029``) is a
row-major O(rows x cols) scan.  Here the matrix is skewed so cells on an
anti-diagonal form a vector lane dimension, and ``lax.scan`` walks the
2R+C-ish diagonals: cell ``(j, c)`` lives at ``(d=j+c, lane=j)``.  The
substitution matrix is produced by an MXU-friendly one-hot matmul before
the scan; integer arithmetic matches the host engine bit for bit, so the
alignment output is backend-independent.

Two consumers:

* :func:`dp_fill_device` — returns the full direction matrix (int8) for
  host backtracking; used by exactness tests.
* :func:`dp_path_device` — the production path (``--backend jax``): the
  direction matrix STAYS in device memory and a fused ``while_loop``
  backtrack walks it on the device, so only the O(R+C) path codes cross
  the host link (the direction matrix itself is O(R*C) — tens of MB for
  the large inter-anchor gaps, which would dominate wall time over a
  tunneled chip).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..align.progressive import D_DIAG, D_LEFT, D_UP, DOUBLEGAP, GAP, INDEL, MATCH, MISMATCH

NEG = jnp.int32(-(2**30))


def _wavefront_dirs(codes, sv, i, top_row, edge_rowgap, *, R: int, C: int):
    """codes: (R,) int32; sv: (C, 5) int32; i: () int32;
    top_row: (C+1,) int32 dp[0][*] boundary; edge_rowgap: () int32 scale
    of dp[j][0] (possibly stale, see progressive.dp_fill).

    Returns the skewed direction matrix (R+C, R+1): row d-1 holds
    diagonal d, lane j = cell (j, c=d-j).
    """
    onehot = jax.nn.one_hot(codes, 4, dtype=jnp.int32)  # (R, 4)
    cnt = jnp.dot(onehot, sv[:, :4].T, preferred_element_type=jnp.int32)  # (R, C)
    svg = sv[:, GAP]  # (C,)
    sub = MATCH * cnt + INDEL * svg[None, :] + MISMATCH * (i - cnt - svg[None, :])
    rowgap = INDEL * i
    colgap = DOUBLEGAP * svg + INDEL * (i - svg)  # (C,)

    # skew sub and colgap: skew[d, j] = sub[j-1, (d - j) - 1] for the cell
    # (j, c=d-j); lanes j = 0..R (lane 0 is the dp top row)
    lanes = jnp.arange(R + 1)

    def scan_body(carry, d):
        dp1, dp2 = carry  # dp at d-1 and d-2, width R+1
        c = d - lanes  # column per lane
        in_range = (lanes >= 1) & (c >= 1) & (c <= C) & (lanes <= R)
        cj = jnp.clip(c - 1, 0, C - 1)
        lj = jnp.clip(lanes - 1, 0, R - 1)
        sub_d = sub[lj, cj]
        colgap_d = colgap[cj]
        dp1_up = jnp.concatenate([jnp.full(1, NEG), dp1[:-1]])
        dp2_diag = jnp.concatenate([jnp.full(1, NEG), dp2[:-1]])
        diag = dp2_diag + sub_d
        up = dp1_up + rowgap
        left = dp1 + colgap_d
        take_diag = (diag >= up) & (diag >= left)
        take_left = (~take_diag) & (left >= up)
        val = jnp.where(take_diag, diag, jnp.where(take_left, left, up))
        dirs_d = jnp.where(
            take_diag, jnp.int8(D_DIAG),
            jnp.where(take_left, jnp.int8(D_LEFT), jnp.int8(D_UP)),
        )
        # boundaries: lane 0 = top row dp[0, d]; lane j at c==0 uses the
        # (possibly stale) edge_rowgap scale
        val = jnp.where(lanes == 0, top_row[jnp.clip(d, 0, C)], val)
        val = jnp.where((c == 0) & (lanes > 0), lanes * edge_rowgap, val)
        val = jnp.where(in_range | (lanes == 0) | (c == 0), val, NEG)
        dirs_d = jnp.where(in_range, dirs_d, jnp.int8(D_DIAG))
        return (val, dp1), dirs_d

    dp0 = jnp.where(lanes == 0, top_row[0], lanes * edge_rowgap).astype(jnp.int32)
    dp0 = jnp.where(lanes <= R, dp0, NEG)
    dpm1 = jnp.full(R + 1, NEG)
    (_, _), dirs_sk = jax.lax.scan(
        scan_body, (dp0, dpm1), jnp.arange(1, R + C + 1)
    )
    # dirs_sk: (R+C, R+1) at diagonals 1..R+C
    return dirs_sk


@functools.partial(jax.jit, static_argnames=("R", "C"))
def _wavefront_program(codes, sv, i, top_row, edge_rowgap, *, R: int, C: int):
    return _wavefront_dirs(codes, sv, i, top_row, edge_rowgap, R=R, C=C)


@functools.partial(jax.jit, static_argnames=("R", "C"))
def _wavefront_path_program(
    codes, sv, i, top_row, edge_rowgap, r_real, c_real, *, R: int, C: int
):
    """Fused fill + device backtrack.

    Walks the reference backtrack (dynamicprogramming.c:1032-1138 order:
    main region by direction code, then the remaining j>0 / c>0 edge
    runs) over
    the device-resident skewed direction matrix, returning the direction
    codes in walk order (from (R, C) back to (0, 0)) plus the step count.
    Only this O(R+C) vector is transferred to the host.
    """
    dirs_sk = _wavefront_dirs(codes, sv, i, top_row, edge_rowgap, R=R, C=C)

    L = R + C

    def cond(state):
        j, c, t, path = state
        return (j > 0) | (c > 0)

    def body(state):
        j, c, t, path = state
        inmain = (j > 0) & (c > 0)
        d = j + c
        dcode_main = dirs_sk[jnp.maximum(d - 1, 0), jnp.clip(j, 0, R)]
        dcode = jnp.where(
            inmain,
            dcode_main,
            jnp.where(j > 0, jnp.int8(D_UP), jnp.int8(D_LEFT)),
        )
        nj = jnp.where(dcode != D_LEFT, j - 1, j)
        nc = jnp.where(dcode != D_UP, c - 1, c)
        path = path.at[t].set(dcode)
        return (nj, nc, t + 1, path)

    path0 = jnp.zeros(L, jnp.int8)
    _, _, nsteps, path = jax.lax.while_loop(
        cond, body, (r_real, c_real, jnp.int32(0), path0)
    )
    return path, nsteps


def _pad_args(row_codes, scorevector, top_row):
    R = len(row_codes)
    C = len(scorevector)
    Rp = max(64, -(-R // 64) * 64)
    Cp = max(64, -(-C // 64) * 64)
    codes = np.zeros(Rp, dtype=np.int32)
    codes[:R] = row_codes
    sv = np.zeros((Cp, 5), dtype=np.int32)
    sv[:C] = scorevector
    top = np.zeros(Cp + 1, dtype=np.int32)
    top[: C + 1] = top_row[: C + 1]
    return codes, sv, top, R, C, Rp, Cp


def dp_fill_device(
    row_codes: np.ndarray,
    scorevector: np.ndarray,
    i: int,
    top_row=None,
    edge_rowgap=None,
):
    """Drop-in device replacement for progressive.dp_fill (dirs only).

    Pads R, C to multiples of 64 to bound recompiles.
    """
    from ..align.progressive import default_top_row

    if top_row is None:
        top_row = default_top_row(scorevector, i)
    if edge_rowgap is None:
        edge_rowgap = INDEL * i
    codes, sv, top, R, C, Rp, Cp = _pad_args(row_codes, scorevector, top_row)
    dirs_sk = np.asarray(
        _wavefront_program(
            jnp.asarray(codes), jnp.asarray(sv), jnp.int32(i),
            jnp.asarray(top), jnp.int32(edge_rowgap), R=Rp, C=Cp
        )
    )
    # unskew: dirs[j, c] = dirs_sk[j + c - 1, j]
    dirs = np.zeros((R + 1, C + 1), dtype=np.int8)
    jj = np.arange(1, R + 1)
    for c in range(1, C + 1):
        dirs[1:, c] = dirs_sk[jj + c - 1, jj]
    dirs[:, 0] = D_UP
    dirs[0, 1:] = D_LEFT
    dirs[0, 0] = D_DIAG
    return dirs


def dp_path_device(
    row_codes: np.ndarray,
    scorevector: np.ndarray,
    i: int,
    top_row=None,
    edge_rowgap=None,
) -> np.ndarray:
    """Device fill + device backtrack; returns the walk-order path codes.

    The direction matrix never leaves the device; the host receives only
    the (<= R+C) int8 path, which `progressive.merge_from_path` consumes.
    """
    from ..align.progressive import default_top_row

    if top_row is None:
        top_row = default_top_row(scorevector, i)
    if edge_rowgap is None:
        edge_rowgap = INDEL * i
    codes, sv, top, R, C, Rp, Cp = _pad_args(row_codes, scorevector, top_row)
    path, nsteps = _wavefront_path_program(
        jnp.asarray(codes), jnp.asarray(sv), jnp.int32(i),
        jnp.asarray(top), jnp.int32(edge_rowgap),
        jnp.int32(R), jnp.int32(C), R=Rp, C=Cp,
    )
    n = int(nsteps)
    return np.asarray(path)[:n]
