"""Multi-chip sharding of the rotation engine.

The reference (`/root/reference/source/`) is single-core C with no
parallelism of any kind (SURVEY.md §2); every axis here is new design:

* **data parallel over sequences** (`"seq"` mesh axis): the ``(k, n_max)``
  code matrix is sharded by row; per-sequence work (k-mer ranks, coverage
  prefix sums) stays shard-local.
* **sequence parallel over positions** (`"pos"` mesh axis): each row's 2-bit
  codes are sharded by column; the prefix-doubling global ranks and suffix
  order require cross-shard sorts, for which XLA's SPMD partitioner inserts
  the all-to-all / all-gather collectives over ICI (scaling-book recipe:
  annotate shardings, let XLA place collectives).

The "full step" is the whole rotation-analysis device program: prefix-
doubling ranks -> suffix order -> capped LCPs -> deepest-all-sequences
block collection (equivalent of the reference's buildGeneralizedTree +
collectNodes cascade, csamsa.c:271-308).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index import engine


def _factor_mesh(n: int) -> Tuple[int, int]:
    """Split n devices into a (seq, pos) grid, favoring the seq axis."""
    best = (n, 1)
    a = 1
    while a * a <= n:
        if n % a == 0:
            best = (n // a, a)
        a += 1
    return best


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("seq", "pos"),
) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if shape is None:
        shape = _factor_mesh(n_devices)
    mesh_devices = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def sharded_rotation_step(mesh: Mesh, *, k: int, n_max: int, levels: int):
    """Jit the full rotation-analysis step over ``mesh``.

    Returns a compiled callable ``step(codes, lengths)`` with ``codes``
    sharded ``P("seq", "pos")`` and ``lengths`` sharded ``P("seq")``.
    Outputs are replicated (the collected block set is tiny).
    """
    code_shard = NamedSharding(mesh, P("seq", "pos"))
    len_shard = NamedSharding(mesh, P("seq"))
    out_shard = NamedSharding(mesh, P())

    def step(codes, lengths):
        rank_stack, sa, lcp, raw, dup = engine.device_index_program(
            codes, lengths, k=k, n_max=n_max, levels=levels
        )
        collected, start, end, _, _ = engine.collect_program(
            sa, lcp, lengths, k=k, n_max=n_max, levels=levels
        )
        return sa, lcp, raw, collected, start, end, dup

    return jax.jit(
        step,
        in_shardings=(code_shard, len_shard),
        out_shardings=out_shard,
        static_argnames=(),
    )


def run_sharded_collect(
    encoded: Sequence[np.ndarray], mesh: Optional[Mesh] = None
):
    """Host convenience wrapper: pad, shard, run one collection step."""
    if mesh is None:
        mesh = make_mesh()
    k = len(encoded)
    sizes = np.array([len(e) for e in encoded], dtype=np.int32)
    n_max = max(int(sizes.max()), 8)
    # round n_max up so the pos axis divides it evenly
    pos_axis = mesh.shape["pos"]
    n_max = ((n_max + pos_axis - 1) // pos_axis) * pos_axis
    levels = engine._num_levels(n_max)
    codes = np.zeros((k, n_max), dtype=np.int32)
    for i, e in enumerate(encoded):
        codes[i, : len(e)] = e
    step = sharded_rotation_step(mesh, k=k, n_max=n_max, levels=levels)
    code_shard = NamedSharding(mesh, P("seq", "pos"))
    len_shard = NamedSharding(mesh, P("seq"))
    jcodes = jax.device_put(jnp.asarray(codes), code_shard)
    jsizes = jax.device_put(jnp.asarray(sizes), len_shard)
    return step(jcodes, jsizes)
