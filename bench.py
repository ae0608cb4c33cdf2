"""Headline benchmark: Primates mtDNA rotation throughput on one chip.

Runs the full rotation analysis (`CSA R Primates.txt` equivalent,
reference baseline 0.45 s user on host CPU, SURVEY.md §6) with the JAX
device backend, verifies bit-identical rotations against the captured
reference output, and prints one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_S = 0.45  # reference `CSA R Primates.txt`, survey run (SURVEY.md §6)

EXPECTED_ROT = {
    "NC_001643": 1947, "NC_001644": 1949, "NC_001646": 1950,
    "NC_001807": 2530, "NC_001992": 1952, "NC_002082": 1946,
    "NC_002083": 1951, "NC_002763": 1952, "NC_002765": 1975,
    "NC_002811": 1955, "NC_004025": 1954, "NC_005943": 2475,
    "NC_006900": 1948, "NC_008217": 1947, "NC_009748": 1940,
    "NC_011120": 1948,
}


def main() -> None:
    import io

    from csa_tpu.io import fasta as fio
    from csa_tpu.rotation import pipeline as rot

    fixture = REPO / "tests" / "fixtures" / "Primates.txt"
    seqs = fio.load_fasta(str(fixture), log=io.StringIO())

    sink = io.StringIO()
    # warmup (compile)
    res = rot.analyze(seqs, log=sink, backend="jax")

    rotations = {}
    for i, desc in enumerate(seqs.descs):
        acc = desc.split()[0].split("|")[-1].split(".")[0]
        for key in EXPECTED_ROT:
            if key in desc:
                acc = key
                break
        rotations[acc] = int(res.rotations[i])
    parity = rotations == EXPECTED_ROT

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rot.analyze(seqs, log=sink, backend="jax")
        times.append(time.perf_counter() - t0)
    wall = min(times)

    print(json.dumps({
        "metric": "primates_rotation_wall_s",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / wall, 3),
        "parity_bit_identical": parity,
    }))


if __name__ == "__main__":
    main()
