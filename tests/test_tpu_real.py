"""Opt-in REAL-chip exactness coverage (VERDICT r1 item 8).

Run with ``CSA_TPU_TPU_TESTS=1 python -m pytest tests/test_tpu_real.py``
— the conftest then leaves the actual accelerator registered instead of
pinning the virtual CPU mesh.  These assert that the production device
paths are exact on the real backend, not just under the CPU emulation
the rest of the suite uses:

* fused rotation program -> bit-identical Primates rotations;
* Pallas pairwise NW kernel -> full-batch equality with the C++ host
  kernel;
* device profile-DP fill + on-device backtrack -> identical alignment
  strings to the host engine on real gap data.
"""

import io
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("CSA_TPU_TPU_TESTS"),
    reason="set CSA_TPU_TPU_TESTS=1 to run against the real accelerator",
)


@requires_tpu
def test_device_backend_is_accelerator():
    import jax

    assert jax.default_backend() != "cpu", (
        "CSA_TPU_TPU_TESTS=1 but JAX still resolved to CPU — the real "
        "chip is not reachable"
    )


@requires_tpu
def test_rotation_bit_identical_on_chip(fixtures_dir):
    from csa_tpu.io import fasta as fio
    from csa_tpu.rotation import pipeline as rot

    seqs = fio.load_fasta(str(fixtures_dir / "Primates.txt"), log=io.StringIO())
    a = rot.analyze(seqs, log=io.StringIO(), backend="numpy")
    b = rot.analyze(seqs, log=io.StringIO(), backend="jax")
    assert list(a.rotations) == list(b.rotations)
    assert (a.num_collected, int(a.num_after_suffix), a.num_after_unique,
            a.num_chains) == (b.num_collected, int(b.num_after_suffix),
                              b.num_after_unique, b.num_chains)


@requires_tpu
def test_pallas_kernel_full_batch_exact_on_chip():
    from csa_tpu.dp import pallas_nw

    rng = np.random.default_rng(11)
    B, L = 64, 1024
    a = rng.integers(0, 4, size=(B, L))
    b = rng.integers(0, 4, size=(B, L))
    dev = pallas_nw.pairwise_nw_scores(a, b)
    host = pallas_nw.nw_scores_host(a, b)
    assert (dev == host).all()


@requires_tpu
def test_progressive_dp_device_path_on_chip():
    from csa_tpu.align import progressive

    rng = np.random.default_rng(5)
    gaps = [rng.integers(0, 4, size=rng.integers(900, 1400)).astype(np.int8)
            for _ in range(6)]
    host = progressive.progressive_dp([g.copy() for g in gaps],
                                      dp_backend="numpy")
    dev = progressive.progressive_dp(
        [g.copy() for g in gaps], dp_backend="jax"
    )
    assert len(host) == len(dev)
    for a, b in zip(host, dev):
        np.testing.assert_array_equal(a, b)


@requires_tpu
def test_pallas_profile_forced_on_chip(monkeypatch):
    """Force EVERY merge through the Pallas profile-DP kernel (single
    and batched launches) and pin the alignments against numpy."""
    from csa_tpu.align import progressive

    monkeypatch.setenv("CSA_TPU_DEVICE_MIN_CELLS", "1")
    monkeypatch.setenv("CSA_TPU_BATCH_MIN_CELLS", "1")
    rng = np.random.default_rng(17)
    gaps = [
        rng.integers(0, 4, size=rng.integers(200, 700)).astype(np.int8)
        for _ in range(5)
    ]
    host = progressive.progressive_dp([g.copy() for g in gaps],
                                      dp_backend="numpy")
    dev = progressive.progressive_dp([g.copy() for g in gaps],
                                     dp_backend="jax")
    for a, b in zip(host, dev):
        np.testing.assert_array_equal(a, b)

    many = [
        [rng.integers(0, 4, size=rng.integers(100, 400)) for _ in range(4)]
        for _ in range(3)
    ]
    hostb = [
        progressive.progressive_dp([g.copy() for g in gs],
                                   dp_backend="numpy")
        for gs in many
    ]
    devb = progressive.progressive_dp_batched(
        [[g.copy() for g in gs] for gs in many]
    )
    for hs, ds in zip(hostb, devb):
        for a, b in zip(hs, ds):
            np.testing.assert_array_equal(a, b)
