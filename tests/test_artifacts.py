"""Artifact parity: Blocks.csv content vs the reference's own output.

Per docs/PARITY.md, the `Length` (totalsize) column and equal-size row order
are traversal-order-dependent in the reference, so rows are compared as a
set of (label, positions) pairs.
"""

import csv
import io
import os
import pathlib
import subprocess
import sys

from csa_tpu.io.fasta import load_fasta, discard_duplicate_rotations

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _csv_rows(path):
    rows = set()
    with open(path) as f:
        reader = csv.reader(f)
        next(reader)  # header
        for row in reader:
            label = row[1]
            positions = tuple(row[2:])
            rows.add((label, positions))
    return rows


def test_blocks_csv_parity(fixtures_dir, tmp_path):
    src = tmp_path / "Primates.txt"
    src.write_text((fixtures_dir / "Primates.txt").read_text())
    proc = subprocess.run(
        [sys.executable, "-m", "csa_tpu.cli", "R", str(src)],
        capture_output=True,
        text=True,
        cwd=tmp_path,
        timeout=1200,
        env={**os.environ,
             "PYTHONPATH": str(REPO_ROOT) + os.pathsep + os.environ.get("PYTHONPATH", "")},
    )
    assert proc.returncode == 0, proc.stderr
    assert "> Done!" in proc.stdout
    assert "19 chains found" in proc.stdout

    got = _csv_rows(tmp_path / "Primates-Blocks.csv")
    want = _csv_rows(fixtures_dir / "Primates-Blocks.csv")
    assert got == want

    # all artifacts exist
    for suffix in ("-Rotated.fasta", "-Blocks.csv", "-Blocks.bmp",
                   "-positions.txt", "-imagemap.txt"):
        assert (tmp_path / f"Primates{suffix}").exists()

    # BMP is structurally valid
    from csa_tpu.report.bmp import read_bmp_info

    info = read_bmp_info(str(tmp_path / "Primates-Blocks.bmp"))
    assert info["magic"] == "BM" and info["bpp"] == 8
