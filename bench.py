"""Headline benchmark on the real chip.

Primary metric: DP cell-updates/s of the Pallas wavefront kernel
(batched pairwise cyclic NW, exact integer scores) — the engine the
reference's dynamicprogramming.c workload maps onto.  Baseline: the
optimized native C++ host kernel measured on this machine's x86 core
(~0.2 Gcell/s), the same order as the reference's own DP loop.

Also measured and reported as extra fields: Primates rotation wall time
(vs the reference's 0.45 s user, SURVEY.md par.6) with a bit-identical
rotation check.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _enable_compile_cache():
    """Persist compiled executables across bench runs (first compile over
    the tunneled chip takes minutes)."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

ROTATION_BASELINE_S = 0.45  # reference `CSA R Primates.txt` (SURVEY.md par.6)

EXPECTED_ROT = {
    "NC_001643": 1947, "NC_001644": 1949, "NC_001646": 1950,
    "NC_001807": 2530, "NC_001992": 1952, "NC_002082": 1946,
    "NC_002083": 1951, "NC_002763": 1952, "NC_002765": 1975,
    "NC_002811": 1955, "NC_004025": 1954, "NC_005943": 2475,
    "NC_006900": 1948, "NC_008217": 1947, "NC_009748": 1940,
    "NC_011120": 1948,
}


def bench_kernel():
    import numpy as np

    from csa_tpu.dp import pallas_nw

    rng = np.random.default_rng(0)
    B, la, lb = 64, 2048, 2048
    a = rng.integers(0, 4, size=(B, la))
    b = rng.integers(0, 4, size=(B, lb))
    s = pallas_nw.pairwise_nw_scores(a, b)  # compile + warm
    exact = bool(
        (s[:3] == pallas_nw.nw_scores_host(a[:3], b[:3])).all()
    )
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pallas_nw.pairwise_nw_scores(a, b)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    cells_per_s = B * la * lb / dt

    # native host kernel baseline on one x86 core
    t0 = time.perf_counter()
    pallas_nw.nw_scores_host(a[:4], b[:4])
    host_dt = time.perf_counter() - t0
    host_cells_per_s = 4 * la * lb / host_dt
    return cells_per_s, host_cells_per_s, exact


def bench_rotation():
    import io

    from csa_tpu.io import fasta as fio
    from csa_tpu.rotation import pipeline as rot

    fixture = REPO / "tests" / "fixtures" / "Primates.txt"
    seqs = fio.load_fasta(str(fixture), log=io.StringIO())
    sink = io.StringIO()
    res = rot.analyze(seqs, log=sink, backend="jax")  # compile + warm
    rotations = {}
    for i, desc in enumerate(seqs.names):
        for key in EXPECTED_ROT:
            if key in desc:
                rotations[key] = int(res.rotations[i])
                break
    parity = rotations == EXPECTED_ROT
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rot.analyze(seqs, log=sink, backend="jax")
        times.append(time.perf_counter() - t0)
    return min(times), parity


def main() -> None:
    cells_per_s, host_cells_per_s, exact = bench_kernel()
    rot_wall, rot_parity = bench_rotation()
    print(json.dumps({
        "metric": "dp_cell_updates_per_s_per_chip",
        "value": round(cells_per_s / 1e9, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(cells_per_s / host_cells_per_s, 2),
        "kernel_exact_vs_host": exact,
        "host_kernel_gcells_per_s": round(host_cells_per_s / 1e9, 3),
        "primates_rotation_wall_s": round(rot_wall, 3),
        "primates_rotation_vs_reference": round(
            ROTATION_BASELINE_S / rot_wall, 3
        ),
        "rotation_parity_bit_identical": rot_parity,
    }))


if __name__ == "__main__":
    main()
