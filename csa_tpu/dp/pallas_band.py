"""Pallas column-stripe BAND kernel for the sequence-parallel profile DP.

VERDICT r4 #1 (second half): ``dp/seqpar.py``'s per-band fill was the
cummax row-scan (0.59-0.74 Gcell/s per device); this module gives the
banded wavefront the same Mosaic formulation as the production
single-device kernel (``dp/pallas_profile.py``), so the halo-exchange
path distributes at kernel rate instead of row-scan rate.

Decomposition (unchanged from ``dp/seqpar.py``): the DP matrix of ONE
giant inter-anchor gap (R rows x C columns; the recurrence of
``/root/reference/source/dynamicprogramming.c:993-1026``) is split
column-wise over a 1D ``("col",)`` mesh — device ``d`` owns global dp
columns ``d*Cloc+1 .. (d+1)*Cloc``.  Rows are processed in bands of
``Rb``; in superstep ``s`` device ``d`` fills band ``s - d`` and sends
the (Rb,) right-edge value vector to its right neighbor via
``jax.lax.ppermute`` (ICI on real meshes).  After ``nb + D - 1``
supersteps every band is filled.

Inside a superstep the band fill is ONE :func:`_band_kernel` launch — a
copy of the profile kernel's column-static-lane anti-diagonal design
(lane = dp column, stripes fold the local column range across sublanes,
2-bit packed directions streamed to HBM) with three generalizations:

* the left boundary (band-local column 0 = the neighbor's last column)
  is an arbitrary per-row vector, injected from an SMEM array ``lb``
  indexed by the diagonal (the full-matrix kernel hard-codes the linear
  ``t * edge_rowgap`` form);
* the bottom row (the next band's top boundary) is captured by a
  predicated accumulate at ``flat == t - Rb`` and emitted in kernel
  lane layout, so the carried ``topv`` never needs reshaping;
* the right-edge column (the halo to send) is extracted per diagonal
  with a one-lane predicated reduce at the static lane of column
  ``Cloc``.

Exactness: every real cell computes the identical integer recurrence
with identical boundary operands, so direction decisions are
bit-identical to the row-scan seqpar fill and to every other backend
(tests/test_seqpar.py).  The backtrack walks the PACKED per-band
direction blocks directly (no unpack pass): cell (j, c) lives in band
``(j-1)//Rb`` of device ``(c-1)//Cloc`` at block diagonal
``t = jloc + cloc``, byte ``[t//4, cloc//Cs, cloc%Cs]``, bits
``2*(t%4)``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.progressive import D_DIAG, D_LEFT, D_UP, GAP
from ..config import Scoring, scoring as _current_scoring
from .pallas_profile import (
    K, NEG, BT_UNROLL, PRI_DIAG, PRI_LEFT, PRI_UP, _round_up,
)


def _band_kernel(rv_ref, svp_ref, rest_ref, cg_ref,
                 topv_ref, aux_ref, lb_ref, dirs_ref, edge_ref, bot_ref,
                 wroll_ref, dp1_ref, rp_ref, bots_ref,
                 *, S: int, Cs: int, TP: int, Rb: int, Cloc: int,
                 A4: int):
    """One grid step = K anti-diagonals of one (Rb x Cloc) band.

    Same x4-scaled priority domain as the full-matrix kernel
    (``pallas_profile._profile_kernel``): the tie-break is a two-level
    max over values carrying 2 priority bits, the substitution select a
    shift/mask of 7-bit packed counts.  All boundary values (topv, lb,
    halo/bottom outputs) live in the x4 domain end-to-end, so the
    carried band state never rescales.

    rv: (S, TP) int32 reversed band codes x7, per-stripe pre-shifted;
    svp/rest/cg/topv: (S, Cs) int32 channels (see the profile kernel);
    aux: (S, 128) int32 with [:,0]=4*rowgap+PRI_UP; lb: (Dtot,) int32
    SMEM x4-scaled left-boundary value per diagonal.  Outputs: dirs
    block (K//4, S, Cs) int8 packed PRIORITIES; edge block (1, 8, 128)
    int32 — lane p (any sublane) holds the x4 column-``Cloc`` value of
    diagonal ``blk*K + p``; bot (S, Cs) int32 — the x4 bottom row
    (written every block, last write wins).
    """
    blk = pl.program_id(0)
    Z = TP - Cs

    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Cs), 1)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (S, Cs), 0)
    flat = sub_i * Cs + lane            # band-local dp column per lane
    lane0 = lane == 0
    flat0 = flat == 0
    sC, lC = Cloc // Cs, Cloc % Cs
    edge_mask = (sub_i == sC) & (lane == lC)
    # Mosaic requires out blocks with (8, 128)-divisible trailing dims;
    # the per-diagonal edge scalars are accumulated into an (8, 128)
    # register (value replicated across sublanes) and stored once/block
    lanes128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    @pl.when(blk == 0)
    def _init():
        wroll_ref[:] = rv_ref[:]
        dp1_ref[:] = jnp.full((S, Cs), 4 * NEG, jnp.int32)
        rp_ref[:] = jnp.full((S, Cs), 4 * NEG, jnp.int32)
        bots_ref[:] = jnp.zeros((S, Cs), jnp.int32)

    svp = svp_ref[:]
    rest = rest_ref[:]
    cg = cg_ref[:]
    topv = topv_ref[:]
    rowgap = aux_ref[:, 0:1]

    dp1 = dp1_ref[:]
    rp = rp_ref[:]
    bot = bots_ref[:]
    edge_row = jnp.zeros((8, 128), jnp.int32)
    acc = jnp.zeros((S, Cs), jnp.int32)
    for phase in range(K):
        t = blk * K + phase
        w7 = wroll_ref[:, Z - phase : Z - phase + Cs]
        svw = jax.lax.shift_right_logical(svp, w7) & 127
        sub = svw * A4 + rest
        a = pltpu.roll(dp1, shift=1, axis=1)
        if S > 1:
            b = pltpu.roll(a, shift=1, axis=0)
            lshift = jnp.where(lane0, b, a)
        else:
            lshift = a
        diag = rp + sub
        up = dp1 + rowgap
        left = lshift + cg
        valp = jnp.maximum(jnp.maximum(diag, up), left)
        pri = valp & 3
        val = valp - pri
        # boundary injections (x4-clean): column 0 <- lb[t] (halo /
        # global edge), then row 0 <- topv (t == 0 corner takes topv[0])
        val = jnp.where(flat0, lb_ref[t], val)
        val = jnp.where(flat == t, topv, val)
        es = jnp.sum(jnp.where(edge_mask, val, 0))
        edge_row = jnp.where(lanes128 == phase, es, edge_row)
        bot = jnp.where(flat == t - Rb, val, bot)
        if phase % 4 == 0:
            acc = pri
        else:
            acc = acc | (pri << (2 * (phase % 4)))
        if phase % 4 == 3:
            dirs_ref[phase // 4, :, :] = acc.astype(jnp.int8)
        rp = lshift
        dp1 = val
    dp1_ref[:] = dp1
    rp_ref[:] = rp
    bots_ref[:] = bot
    bot_ref[:, :] = bot
    edge_ref[0, :, :] = edge_row
    wroll_ref[:] = pltpu.roll(wroll_ref[:], shift=K, axis=1)


def _band_shape(Rb: int, Cloc: int, stripes: int = 8):
    """Static launch geometry for one (Rb x Cloc) band."""
    S = stripes
    Cs = max(128, _round_up(-(-(Cloc + 1) // S), 128))
    Dtot = _round_up(Rb + Cloc + 1, K)
    TP = _round_up(Dtot + Cs, 128)
    return S, Cs, Dtot, TP


def _band_call(rv, svp, rest, cg, topv, aux, lb, *, S, Cs, Dtot, TP, Rb,
               Cloc, A4, interpret):
    """pallas_call wrapper: returns (dirs_packed (Dtot//4, S, Cs) int8,
    edge (Dtot//K, 8, 128) int32, bot (S, Cs) int32)."""
    nblk = Dtot // K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec(
                (K // 4, S, Cs), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Cs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, TP), jnp.int32),
            pltpu.VMEM((S, Cs), jnp.int32),
            pltpu.VMEM((S, Cs), jnp.int32),
            pltpu.VMEM((S, Cs), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _band_kernel, S=S, Cs=Cs, TP=TP, Rb=Rb, Cloc=Cloc, A4=A4
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblk * (K // 4), S, Cs), jnp.int8),
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((S, Cs), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rv, svp, rest, cg, topv, aux, lb)


_PROGRAMS: dict = {}


def _band_fill_program(mesh, R: int, C: int, D: int, Rb: int, sc: Scoring,
                       interpret: bool):
    """shard_map fill: each device's bands filled by the Mosaic kernel,
    halo ppermuted between supersteps.  Returns the per-device PACKED
    direction blocks, concatenated over the mesh axis:
    global (D*nb, Dtot//4, S, Cs) int8 where block ``d*nb + b`` is
    device ``d``'s band ``b``."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _shard_map

    key = (id(mesh), R, C, D, Rb, sc, interpret)
    prog = _PROGRAMS.get(key)
    if prog is not None:
        return prog

    Cloc = C // D
    nb = R // Rb
    nsteps = nb + D - 1
    S, Cs, Dtot, TP = _band_shape(Rb, Cloc)
    Cpad = S * Cs
    Z = TP - Cs
    A = sc.match - sc.mismatch
    Bc = sc.indel - sc.mismatch

    def body(codes, sv_loc, top, i, edge_rowgap):
        d = jax.lax.axis_index("col")
        i32 = i.astype(jnp.int32)
        sv32 = sv_loc.astype(jnp.int32)                   # (Cloc, 5)

        def chan(x):  # (Cloc,) column data -> (S, Cs); dp col f <- x[f-1]
            z = jnp.zeros(1, jnp.int32)
            pad = jnp.zeros(Cpad - Cloc - 1, jnp.int32)
            return jnp.concatenate([z, x, pad]).reshape(S, Cs)

        svg = sv32[:, GAP]
        svpack = chan(
            sv32[:, 0] | (sv32[:, 1] << 7) | (sv32[:, 2] << 14)
            | (sv32[:, 3] << 21)
        )
        restch = chan(4 * (Bc * svg + sc.mismatch * i32) + PRI_DIAG)
        cgch = chan(
            4 * (sc.doublegap * svg + sc.indel * (i32 - svg)) + PRI_LEFT
        )
        aux = jnp.zeros((S, 128), jnp.int32).at[:, 0].set(
            4 * sc.indel * i32 + PRI_UP
        )
        # top boundary of band 0 (x4 domain): global top_row columns
        # [d*Cloc .. d*Cloc + Cloc] in lane layout
        c0 = d * jnp.int32(Cloc)
        top_slice = 4 * jax.lax.dynamic_slice(top, (c0,), (Cloc + 1,))
        topv0 = jnp.concatenate(
            [top_slice, jnp.zeros(Cpad - Cloc - 1, jnp.int32)]
        ).reshape(S, Cs)

        u = jnp.arange(TP, dtype=jnp.int32)[None, :]
        s_idx = jnp.arange(S, dtype=jnp.int32)[:, None]
        src = Z - u - 1 - s_idx * Cs                      # (S, TP)
        valid = (src >= 0) & (src < Rb)
        srcc = jnp.clip(src, 0, Rb - 1)
        trange = jnp.arange(Dtot, dtype=jnp.int32)

        def superstep(carry, s):
            topv, halo_in, first = carry
            b = s - d
            active = (b >= 0) & (b < nb)
            bb = jnp.clip(b, 0, nb - 1)
            codes_band = jax.lax.dynamic_slice(
                codes, (bb * jnp.int32(Rb),), (Rb,)
            ).astype(jnp.int32)
            rv = jnp.where(valid, codes_band[srcc], jnp.int32(4)) * 7
            # left boundary per diagonal: device 0 owns the global
            # column-0 edge (linear form); others take the neighbor halo
            lb_edge = (bb * jnp.int32(Rb) + trange) * (4 * edge_rowgap)
            lb_halo = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), halo_in,
                 jnp.zeros(Dtot - Rb - 1, jnp.int32)]
            )
            lb = jnp.where(d == 0, lb_edge, lb_halo).astype(jnp.int32)
            topv_in = jnp.where(first & (b == 0), topv0, topv)
            dirs_p, edge, bot = _band_call(
                rv, svpack, restch, cgch, topv_in, aux, lb, S=S, Cs=Cs,
                Dtot=Dtot, TP=TP, Rb=Rb, Cloc=Cloc, A4=4 * A,
                interpret=interpret,
            )
            edge_flat = edge[:, 0, :K].reshape(-1)        # (Dtot,)
            halo_out = jax.lax.dynamic_slice(
                edge_flat, (Cloc + 1,), (Rb,)
            )
            topv = jnp.where(active, bot, topv)
            halo_out = jnp.where(active, halo_out, jnp.int32(0))
            halo_next = jax.lax.ppermute(
                halo_out, "col", [(t, t + 1) for t in range(D - 1)]
            )
            first = first & ~active
            return (topv, halo_next, first), jnp.where(
                active, dirs_p, jnp.int8(0)
            )

        carry0 = (topv0, jnp.zeros(Rb, jnp.int32), jnp.ones((), bool))
        _, ys = jax.lax.scan(
            superstep, carry0, jnp.arange(nsteps, dtype=jnp.int32)
        )                         # (nsteps, Dtot//4, S, Cs)
        # device d's band b lives at superstep b + d
        return jnp.take(ys, d + jnp.arange(nb, dtype=jnp.int32), axis=0)

    prog = jax.jit(
        _shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P("col", None), P(), P(), P()),
            out_specs=P("col", None, None, None),
            check_vma=False,
        )
    )
    _PROGRAMS[key] = prog
    return prog


def _band_path_program(mesh, R: int, C: int, D: int, Rb: int, sc: Scoring,
                       interpret: bool):
    """Fill + on-device backtrack over the packed per-band blocks; only
    the O(R+C) walk-order path codes reach the host."""
    key = ("path", id(mesh), R, C, D, Rb, sc, interpret)
    prog = _PROGRAMS.get(key)
    if prog is not None:
        return prog

    fill = _band_fill_program(mesh, R, C, D, Rb, sc, interpret)
    Cloc = C // D
    nb = R // Rb
    S, Cs, _, _ = _band_shape(Rb, Cloc)

    def walk(codes, sv, top, i, edge_rowgap, r_real, c_real):
        blocks = fill(codes, sv, top, i, edge_rowgap)
        # replicate once (all_gather over the mesh; ICI on real
        # hardware) so the serial walk below is shard-local
        blocks = jax.lax.with_sharding_constraint(
            blocks,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            ),
        )
        L = R + C

        def cond(state):
            j, c, t, path = state
            return (j > 0) | (c > 0)

        def body(state):
            j, c, t, path = state
            for _ in range(BT_UNROLL):
                active = (j > 0) | (c > 0)
                inmain = (j > 0) & (c > 0)
                dd = jnp.clip((c - 1) // Cloc, 0, D - 1)
                cloc = c - dd * Cloc
                b = jnp.clip((j - 1) // Rb, 0, nb - 1)
                jloc = j - b * Rb
                td = jloc + cloc
                byte = (
                    blocks[
                        dd * nb + b, td // 4, cloc // Cs, cloc % Cs
                    ].astype(jnp.int32)
                    & 0xFF
                )
                # stored priorities -> direction codes via 2 - pri
                dmain = 2 - (
                    jax.lax.shift_right_logical(byte, 2 * (td % 4)) & 3
                )
                dcode = jnp.where(
                    inmain,
                    dmain.astype(jnp.int8),
                    jnp.where(j > 0, jnp.int8(D_UP), jnp.int8(D_LEFT)),
                )
                path = path.at[jnp.clip(t, 0, L - 1)].set(dcode)
                j = jnp.where(active & (dcode != D_LEFT), j - 1, j)
                c = jnp.where(active & (dcode != D_UP), c - 1, c)
                t = jnp.where(active, t + 1, t)
            return (j, c, t, path)

        path0 = jnp.zeros(L, jnp.int8)
        _, _, nsteps, path = jax.lax.while_loop(
            cond, body, (r_real, c_real, jnp.int32(0), path0)
        )
        return path, nsteps

    prog = jax.jit(walk)
    _PROGRAMS[key] = prog
    return prog


def dp_path_band_pallas(
    row_codes: np.ndarray,
    scorevector: np.ndarray,
    i: int,
    mesh=None,
    *,
    band_rows: int = 2048,
    top_row=None,
    edge_rowgap=None,
    interpret: bool | None = None,
) -> np.ndarray:
    """Column-sharded Pallas band fill + device backtrack for ONE giant
    gap merge — drop-in for :func:`csa_tpu.dp.seqpar.dp_path_seqpar`
    with the Mosaic kernel as the per-band body.  Bit-identical to
    every other backend (tests/test_seqpar.py)."""
    from jax.sharding import Mesh

    from ..align.progressive import default_top_row

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("col",))
    elif tuple(mesh.axis_names) != ("col",):
        mesh = Mesh(mesh.devices.reshape(-1), ("col",))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    D = int(np.prod(mesh.devices.shape))
    if top_row is None:
        top_row = default_top_row(scorevector, i)
    sc = _current_scoring()
    if edge_rowgap is None:
        edge_rowgap = sc.indel * i

    R = len(row_codes)
    C = len(scorevector)
    Rb = band_rows
    Rp = max(Rb, -(-R // Rb) * Rb)
    # local column counts lane-aligned where possible (same policy as
    # seqpar._pad_for_mesh)
    Cp = max(D, -(-C // D) * D)
    if (Cp // D) % 128 and Cp >= 128 * D:
        Cp = -(-Cp // (128 * D)) * (128 * D)
    codes = np.zeros(Rp, dtype=np.int8)
    codes[:R] = row_codes
    sv = np.zeros((Cp, 5), dtype=np.int8)
    sv[:C] = scorevector
    top = np.zeros(Cp + 1, dtype=np.int32)
    top[: C + 1] = top_row[: C + 1]

    prog = _band_path_program(mesh, Rp, Cp, D, Rb, sc, interpret)
    path, nsteps = prog(
        jnp.asarray(codes), jnp.asarray(sv), jnp.asarray(top),
        jnp.int32(i), jnp.int32(edge_rowgap), jnp.int32(R), jnp.int32(C),
    )
    n = int(nsteps)
    return np.asarray(path)[:n]
