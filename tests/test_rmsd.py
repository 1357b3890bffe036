"""Symmetry-corrected RMSD tests."""

import numpy as np

from confidence_bootstrapping_tpu.eval import rmsd


def _ring(n=6, r=1.4):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pos = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(n)], axis=1)
    bonds = [(i, (i + 1) % n, 4) for i in range(n)]
    return pos, bonds


def test_symmetry_rmsd_benzene_rotation():
    """Rotating a benzene-like ring by 60 deg is a graph automorphism:
    naive RMSD is large, symmetry RMSD ~ 0."""
    pos, bonds = _ring()
    nums = [6] * 6
    rot = np.roll(np.arange(6), 1)
    pose = pos[rot]
    naive = rmsd.plain_rmsd(pos, pose)
    assert naive > 1.0
    sym = rmsd.symmetry_rmsd(pos, pose, nums, bonds)
    assert sym < 1e-6


def test_symmetry_rmsd_distinguishes_elements():
    """If one ring atom is N, the 60-deg rotation is NOT an automorphism."""
    pos, bonds = _ring()
    nums = [6, 6, 6, 6, 6, 7]
    pose = pos[np.roll(np.arange(6), 1)]
    sym = rmsd.symmetry_rmsd(pos, pose, nums, bonds)
    assert sym > 1.0
    # mirror symmetry (reflection through the N axis) IS an automorphism:
    # reversing order around the ring keeping N fixed
    perm = np.array([4, 3, 2, 1, 0, 5])
    pose2 = pos[perm]
    sym2 = rmsd.symmetry_rmsd(pos, pose2, nums, bonds)
    assert sym2 < 1e-6


def test_symmetry_rmsd_batch_and_plain_case():
    rng = np.random.RandomState(0)
    pos = rng.randn(8, 3)
    bonds = [(i, i + 1, 1) for i in range(7)]
    nums = [6, 7, 8, 6, 7, 8, 6, 7]  # chain, no symmetry
    poses = pos[None] + rng.randn(3, 8, 3) * 0.1
    out = rmsd.symmetry_rmsd(pos, poses, nums, bonds)
    want = np.array([rmsd.plain_rmsd(pos, p) for p in poses])
    np.testing.assert_allclose(out, want, atol=1e-9)


def test_hungarian_fallback():
    pos, bonds = _ring()
    nums = [6] * 6
    pose = pos[np.roll(np.arange(6), 2)]
    h = rmsd.hungarian_rmsd(pos, pose, nums)
    assert h < 1e-6
