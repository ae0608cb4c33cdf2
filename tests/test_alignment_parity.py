"""Alignment-phase parity against captured reference outputs.

The tiny fixtures (tests/fixtures/tiny/t*.txt) are 4x150bp circular sets
whose full-pipeline outputs were captured from the compiled reference
(/root/reference/source built with gcc -fcommon; DEBUG traces were used
to verify border nodes, chains, and segments during development).
"""

import io
import pathlib

import numpy as np
import pytest

from csa_tpu.align import anchors, runner
from csa_tpu.io import fasta as fio
from csa_tpu.rotation import pipeline as rot

TINY = pathlib.Path(__file__).parent / "fixtures" / "tiny"
SEEDS = [1, 3, 4, 6, 8]
# adversarial generated sets (captured from the compiled reference):
# tandem repeats, homopolymer runs, 8-seq high divergence, GC-skew
ADVERSARIAL = sorted(p.stem for p in TINY.glob("a-*.txt"))


def _rotated_codes(seqs, rotations):
    return [
        np.roll(e, -int(r)) for e, r in zip(seqs.encoded_all(), rotations)
    ]


@pytest.mark.parametrize(
    "name", [f"t{s}" for s in SEEDS] + ADVERSARIAL
)
def test_tiny_full_pipeline_alignment_byte_identical(name, tmp_path):
    base = TINY / name
    seqs = fio.load_fasta(str(base) + ".txt", log=io.StringIO())
    res = rot.analyze(seqs, log=io.StringIO())

    # rotation parity first (headers of the captured -Rotated.fasta)
    expected_rot = {}
    for line in open(str(base) + "-Rotated.fasta"):
        if line.startswith(">"):
            name, _, r = line[1:].strip().rpartition(" @ ")
            expected_rot[name] = int(r)
    got = {n: int(r) for n, r in zip(seqs.names, res.rotations)}
    assert got == expected_rot

    rot_codes = _rotated_codes(seqs, res.rotations)
    log = io.StringIO()
    result = runner.run_alignment(rot_codes, log=log)
    out = tmp_path / "aligned.fasta"
    runner.save_alignment(
        str(out), result, rot_codes, seqs.names, res.rotations, log=log
    )
    assert out.read_text() == open(str(base) + "-Aligned.fasta").read()


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_border_nodes_have_all_sequences(seed):
    base = TINY / f"t{seed}"
    seqs = fio.load_fasta(str(base) + ".txt", log=io.StringIO())
    res = rot.analyze(seqs, log=io.StringIO())
    nodes = anchors.compute_border_nodes(_rotated_codes(seqs, res.rotations))
    assert nodes
    k = len(seqs)
    all_pos = [set() for _ in range(k)]
    for node in nodes:
        assert node.size >= 1
        assert len(node.positions) == k
        for i, p in enumerate(node.positions):
            assert len(p) > 0
            assert np.all(np.diff(p) > 0)
            # attachment is unique: a suffix belongs to exactly one node
            assert not (all_pos[i] & set(p))
            all_pos[i].update(p)


def test_alignment_integrity_roundtrip(tmp_path):
    """The aligned strings minus gaps must equal the rotated inputs."""
    from csa_tpu.tools import files

    base = TINY / "t1"
    seqs = fio.load_fasta(str(base) + ".txt", log=io.StringIO())
    res = rot.analyze(seqs, log=io.StringIO())
    rot_codes = _rotated_codes(seqs, res.rotations)
    result = runner.run_alignment(rot_codes, log=io.StringIO())
    out = tmp_path / "aligned.fasta"
    runner.save_alignment(
        str(out), result, rot_codes, seqs.names, res.rotations,
        log=io.StringIO(),
    )
    ok = files.test_alignment_output(
        str(base) + "-Rotated.fasta", str(out), log=io.StringIO()
    )
    assert ok


def test_primates_full_alignment_content_identical(tmp_path):
    """The headline parity target: full-pipeline alignment on Primates
    (16 mitogenomes) matches the reference's output byte for byte
    (content rows; headers differ by mode: the fixture was captured via
    `CSA A` on the rotated FASTA)."""
    fx = pathlib.Path(__file__).parent / "fixtures"
    seqs = fio.load_fasta(str(fx / "Primates.txt"), log=io.StringIO())
    res = rot.analyze(seqs, log=io.StringIO())
    rot_codes = _rotated_codes(seqs, res.rotations)
    result = runner.run_alignment(rot_codes, log=io.StringIO())
    out = tmp_path / "aligned.fasta"
    runner.save_alignment(
        str(out), result, rot_codes, seqs.names, res.rotations,
        log=io.StringIO(),
    )
    ref = [
        l for l in (fx / "Primates-Rotated-Aligned.fasta").read_text().splitlines()
        if not l.startswith(">")
    ]
    mine = [
        l for l in out.read_text().splitlines() if not l.startswith(">")
    ]
    assert mine == ref


@pytest.mark.skipif(
    not __import__("os").environ.get("CSA_TPU_SLOW_TESTS"),
    reason="set CSA_TPU_SLOW_TESTS=1 for the large acceptance sets",
)
@pytest.mark.parametrize("name", ["Mammals", "Set3"])
def test_mammals_full_alignment_content_identical(tmp_path, name):
    fx = pathlib.Path(__file__).parent / "fixtures"
    seqs = fio.load_fasta(str(fx / f"{name}.txt"), log=io.StringIO())
    res = rot.analyze(seqs, log=io.StringIO())
    rot_codes = _rotated_codes(seqs, res.rotations)
    result = runner.run_alignment(rot_codes, log=io.StringIO())
    out = tmp_path / "aligned.fasta"
    runner.save_alignment(
        str(out), result, rot_codes, seqs.names, res.rotations,
        log=io.StringIO(),
    )
    ref = [
        l
        for l in (fx / f"{name}-Rotated-Aligned.fasta").read_text().splitlines()
        if not l.startswith(">")
    ]
    mine = [l for l in out.read_text().splitlines() if not l.startswith(">")]
    assert mine == ref


@pytest.mark.skipif(
    not __import__("os").environ.get("CSA_TPU_SLOW_TESTS"),
    reason="set CSA_TPU_SLOW_TESTS=1 for the large acceptance sets",
)
def test_set3_jax_backend_end_to_end_identical(tmp_path):
    """Rotation AND alignment through the jax backend (on the test CPU
    mesh) stay byte-identical on the hardest published set."""
    fx = pathlib.Path(__file__).parent / "fixtures"
    seqs = fio.load_fasta(str(fx / "Set3.txt"), log=io.StringIO())
    res = rot.analyze(seqs, log=io.StringIO(), backend="jax")
    rot_codes = _rotated_codes(seqs, res.rotations)
    result = runner.run_alignment(
        rot_codes, log=io.StringIO(), dp_backend="jax"
    )
    out = tmp_path / "aligned.fasta"
    runner.save_alignment(
        str(out), result, rot_codes, seqs.names, res.rotations,
        log=io.StringIO(),
    )
    ref = [
        l
        for l in (fx / "Set3-Rotated-Aligned.fasta").read_text().splitlines()
        if not l.startswith(">")
    ]
    mine = [l for l in out.read_text().splitlines() if not l.startswith(">")]
    assert mine == ref


def test_blocked_his_matches_brute_force():
    """The round-5 blocked HIS (2k-item blocks, early-exit dominance
    scan, block splits) must reproduce the original full-scan semantics
    exactly — chain order, weights, and backtrack links — on a set
    large enough to force multiple block splits."""
    import numpy as np

    from csa_tpu.align import machine

    rng = np.random.default_rng(42)
    k = 3
    M = 6000
    nodes = []
    base = np.sort(rng.choice(500_000, size=M, replace=False))
    for m in range(M):
        size = int(rng.integers(5, 60))
        p0 = int(base[m])
        positions = [[p0]] + [
            [p0 + int(rng.integers(-200, 200))] for _ in range(k - 1)
        ]
        nodes.append(
            machine.BorderNode(size=size, positions=positions)
            if hasattr(machine, "BorderNode")
            else type("N", (), {"size": size, "positions": positions})()
        )
    endpos = [600_000] * k
    bl = machine.BorderList(list(nodes), k)
    got = bl.calculate_his(endpos)

    # brute force: the pre-round-5 full-scan formulation
    endpos_arr = np.asarray(endpos)
    chain = []  # list of [positions, size, weight, backtrack_idx]
    order = sorted(range(M), key=lambda m: nodes[m].positions[0][0])
    for m in order:
        positions = np.array(
            [nodes[m].positions[i][0] for i in range(k)], dtype=np.int64
        )
        size = nodes[m].size
        trims = endpos_arr - positions
        mask = positions + size >= endpos_arr
        if mask.any():
            size = min(size, int(trims[mask].min()))
        weight = size
        backtrack = None
        for item in chain:
            if np.all(positions >= item[0] + item[1]):
                weight += item[2]
                backtrack = item
                break
        new = [positions, size, weight, backtrack]
        ins = 0
        while ins < len(chain) and chain[ins][2] > weight:
            ins += 1
        chain.insert(ins, new)

    assert len(got) == len(chain)
    for g, w in zip(got, chain):
        assert np.array_equal(g.positions, w[0])
        assert g.size == w[1]
        assert g.weight == w[2]
        if w[3] is None:
            assert g.backtrack is None
        else:
            assert g.backtrack is not None
            assert np.array_equal(g.backtrack.positions, w[3][0])
            assert g.backtrack.weight == w[3][2]
