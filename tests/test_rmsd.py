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


def test_symmetry_rmsd_multi_pose_ground_truth():
    """Multi-binding-pose ground truth (reference moad.py:506-518): the
    metric is the min over valid poses AND automorphisms."""
    pos, bonds = _ring()
    nums = [6] * 6
    alt = pos + np.array([10.0, 0.0, 0.0])  # second valid binding site
    ref = np.stack([pos, alt])

    # a pose at the ALTERNATE site, ring-rotated by 60 deg
    pose = alt[np.roll(np.arange(6), 1)]
    assert rmsd.plain_rmsd(pos, pose) > 5.0
    assert float(rmsd.symmetry_rmsd(ref, pose, nums, bonds)) < 1e-6
    # batch form: one pose per site
    out = rmsd.symmetry_rmsd(ref, np.stack([pos, pose]), nums, bonds)
    np.testing.assert_allclose(out, [0.0, 0.0], atol=1e-6)
    # single-ref behavior unchanged
    assert rmsd.symmetry_rmsd(pos, pose, nums, bonds) > 5.0


def test_ground_truth_poses_helper():
    from confidence_bootstrapping_tpu.data.complex_graph import HostComplex

    pos, _ = _ring()
    hc_kwargs = dict(
        name="t", lig_f=np.zeros((6, 16)), lig_pos=pos, lig_edge_src=np.zeros(0, int),
        lig_edge_dst=np.zeros(0, int), lig_edge_attr=np.zeros((0, 4)), tor_src=np.zeros(0, int),
        tor_dst=np.zeros(0, int), mask_rotate=np.zeros((0, 6), bool), rec_f=np.zeros(1, int),
        rec_lm=np.zeros((1, 0)), rec_pos=np.zeros((1, 3)), rec_nbr=np.zeros((1, 1), int),
        rec_nbr_mask=np.zeros((1, 1), bool), orig_center=np.zeros(3), orig_lig_pos=pos,
    )
    hc = HostComplex(**hc_kwargs)
    assert rmsd.ground_truth_poses(hc).shape == (6, 3)
    hc2 = HostComplex(**{**hc_kwargs, "alt_orig_lig_pos": (pos + 5)[None]})
    assert rmsd.ground_truth_poses(hc2).shape == (2, 6, 3)


def test_benchmark_reports_symmetry_corrected_value(tmp_path, monkeypatch):
    """VERDICT r1 next-round #5 'Done' criterion: with a symmetric ligand
    where plain RMSD != symmetry RMSD, the in-training benchmark reports
    the corrected value."""
    import jax

    from confidence_bootstrapping_tpu.cli.train import inference_benchmark
    from confidence_bootstrapping_tpu.config import ScoreModelConfig
    from confidence_bootstrapping_tpu.data import mol_io
    from confidence_bootstrapping_tpu.data.complex_graph import HostComplex

    pos, bonds = _ring()
    rng = np.random.RandomState(0)
    rec_pos = rng.randn(16, 3).astype(np.float32) * 5
    from scipy.spatial import cKDTree

    _, idx = cKDTree(rec_pos).query(rec_pos, k=5)
    src = np.asarray([b[0] for b in bonds] + [b[1] for b in bonds], dtype=np.int32)
    dst = np.asarray([b[1] for b in bonds] + [b[0] for b in bonds], dtype=np.int32)
    attr = np.zeros((len(src), 4), dtype=np.float32)
    attr[:, 3] = 1
    hc = HostComplex(
        name="ring", lig_f=rng.randint(0, 2, (6, 16)), lig_pos=pos.astype(np.float32),
        lig_edge_src=src, lig_edge_dst=dst, lig_edge_attr=attr,
        tor_src=np.zeros(0, np.int32), tor_dst=np.zeros(0, np.int32),
        mask_rotate=np.zeros((0, 6), bool), rec_f=rng.randint(0, 20, 16).astype(np.int32),
        rec_lm=np.zeros((16, 16), np.float32), rec_pos=rec_pos,
        rec_nbr=idx[:, 1:].astype(np.int32), rec_nbr_mask=np.ones((16, 4), bool),
        orig_center=np.zeros(3, np.float32), orig_lig_pos=pos.astype(np.float32),
    )
    mol = mol_io.Molecule(np.full(6, 6), pos, bonds, np.zeros(6, int), "ring")

    class _DS:
        complexes = [hc]
        mols = {"ring": mol}

        def lm_dim(self):
            return 16

    # stub the sampler: "predict" the ring rotated by 60 deg — exactly the
    # case where plain RMSD is large but symmetry RMSD is 0
    from confidence_bootstrapping_tpu.sampler import sampling as sampling_mod

    rotated = pos[np.roll(np.arange(6), 1)].astype(np.float32)

    def fake_sample_jit(model, variables, batch, key, mcfg, scfg, traj=False):
        B, L = batch.lig_pos.shape[:2]
        lp = np.zeros((B, L, 3), np.float32)
        lp[:, :6] = rotated
        return batch.replace(lig_pos=jax.numpy.asarray(lp)), None

    monkeypatch.setattr(sampling_mod, "sample_jit", fake_sample_jit)
    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1, lm_embedding_dim=16)
    out = inference_benchmark(None, None, _DS(), cfg, 1, 2, 2, jax.random.PRNGKey(0))
    assert out["valinf_rmsds_lt2"] == 1.0  # symmetry-corrected: a hit
    assert out["valinf_mean_rmsd"] < 1e-5
    assert rmsd.plain_rmsd(pos, rotated) > 1.0  # plain RMSD would have missed
