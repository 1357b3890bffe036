"""Evaluator CLI smoke test: mixed receptor buckets + all-atom confidence
model (round-1 weak #6 — previously untested path)."""

import json
import os

import numpy as np

from confidence_bootstrapping_tpu.config import ScoreModelConfig, save_yaml
from confidence_bootstrapping_tpu.train import checkpoints

from test_datasets import _write_toy_complex_dir


def _model_dir(path, cfg):
    os.makedirs(path, exist_ok=True)
    save_yaml(cfg, os.path.join(path, checkpoints.CONFIG_NAME))
    return path


def test_infer_mixed_buckets_with_aa_confidence(tmp_path):
    from confidence_bootstrapping_tpu.cli import infer

    data = tmp_path / "data"
    # two complexes landing in different receptor buckets (64 vs 128)
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    _write_toy_complex_dir(str(data), "bbbb", seed=1, n_res=70)

    score_dir = _model_dir(
        str(tmp_path / "score"),
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                         lm_embedding_dim=0, dropout=0.0),
    )
    conf_dir = _model_dir(
        str(tmp_path / "conf"),
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                         lm_embedding_dim=0, dropout=0.0, all_atoms=True,
                         confidence_mode=True),
    )
    out = str(tmp_path / "out")
    infer.main([
        "--data_dir", str(data), "--out_dir", out,
        "--model_dir", score_dir, "--confidence_model_dir", conf_dir,
        "--samples_per_complex", "2", "--inference_steps", "2", "--batch_size", "2",
        # phased receptor compaction rides along: the batch carries atom
        # graphs for the AA confidence model but the coarse score model
        # still compacts (sampler gate is model_cfg.all_atoms)
        "--rec_phase_plan", "1:32",
    ])

    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["n_complexes"] == 2
    assert m["failures"] == 0
    # cross-cap telemetry present (weak #3)
    assert "cross_cap_dropped_edge_frac" in m
    assert m["cross_cap_dropped_edge_frac"] >= 0.0
    confs = np.load(os.path.join(out, "confidences.npy"))
    assert confs.shape == (2, 2)
    assert np.isfinite(confs).all()  # AA confidence model scored both buckets


def test_infer_moad_split_filter_and_visualisation(tmp_path):
    """MOAD split pickles restrict evaluation to the split's cluster ligands
    (reference inference.py evaluates the MOAD test split) and
    --save_visualisation writes reverse-diffusion trajectory PDBs."""
    import pickle

    from confidence_bootstrapping_tpu.cli import infer

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    _write_toy_complex_dir(str(data), "bbbb", seed=1, n_res=12)

    splits = {"test": ["c1"], "train": ["c2"]}
    with open(tmp_path / "splits.pkl", "wb") as f:
        pickle.dump(splits, f)
    with open(tmp_path / "c2l.pkl", "wb") as f:
        pickle.dump({"c1": ["aaaa"], "c2": ["bbbb"]}, f)

    score_dir = _model_dir(
        str(tmp_path / "score"),
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                         lm_embedding_dim=0, dropout=0.0),
    )
    out = str(tmp_path / "out")
    infer.main([
        "--data_dir", str(data), "--out_dir", out, "--model_dir", score_dir,
        "--samples_per_complex", "2", "--inference_steps", "2", "--batch_size", "2",
        "--moad_splits_pkl", str(tmp_path / "splits.pkl"),
        "--cluster_to_ligands_pkl", str(tmp_path / "c2l.pkl"),
        "--save_visualisation",
        # exercise the per-manifold schedules + truncation through the CLI
        "--different_schedules", "--rot_inf_sched_alpha", "2.0",
        "--actual_steps", "2",
    ])
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["n_complexes"] == 1  # only the test-split cluster ligand
    trajs = os.listdir(os.path.join(out, "visualisation", "aaaa"))
    assert sorted(trajs) == ["traj_0.pdb", "traj_1.pdb"]
    txt = open(os.path.join(out, "visualisation", "aaaa", "traj_0.pdb")).read()
    assert txt.count("MODEL") >= 3  # init + 2 steps


def test_infer_data_parallel_matches_single_device(tmp_path):
    """--data_parallel shards pose batches over the 8-device CPU mesh; the
    sampler is element-wise over poses so results match the unsharded run."""
    from confidence_bootstrapping_tpu.cli import infer

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    score_dir = _model_dir(
        str(tmp_path / "score"),
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                         lm_embedding_dim=0, dropout=0.0),
    )
    outs = []
    for tag, extra in (("single", []), ("dp", ["--data_parallel"])):
        out = str(tmp_path / f"out_{tag}")
        infer.main([
            "--data_dir", str(data), "--out_dir", out, "--model_dir", score_dir,
            "--samples_per_complex", "8", "--inference_steps", "2", "--batch_size", "8",
            "--seed", "3",
        ] + extra)
        outs.append(np.load(os.path.join(out, "rmsds.npy")))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-4)


def test_infer_no_rec_overlap_subset_metrics(tmp_path):
    """--no_rec_overlap_names reports a second metric pass over the
    receptor-unseen subset with the no_overlap_ prefix (reference
    inference.py:596-605)."""
    from confidence_bootstrapping_tpu.cli import infer

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    _write_toy_complex_dir(str(data), "bbbb", seed=1, n_res=10)
    (tmp_path / "no_overlap.txt").write_text("bbbb\n")
    score_dir = _model_dir(
        str(tmp_path / "score"),
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                         lm_embedding_dim=0, dropout=0.0),
    )
    out = str(tmp_path / "out")
    infer.main([
        "--data_dir", str(data), "--out_dir", out, "--model_dir", score_dir,
        "--samples_per_complex", "2", "--inference_steps", "2", "--batch_size", "2",
        "--no_rec_overlap_names", str(tmp_path / "no_overlap.txt"),
    ])
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["no_overlap_n_complexes"] == 1
    assert "no_overlap_run_times_mean" in m
    assert "no_overlap_rmsds_below_2" in m


def test_infer_no_model_baseline(tmp_path):
    """--no_model evaluates the randomized initialization without denoising
    (reference inference.py --no_model baseline); --cache_path makes the
    second run reuse the featurization cache."""
    from confidence_bootstrapping_tpu.cli import infer

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    score_dir = _model_dir(
        str(tmp_path / "score"),
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                         lm_embedding_dim=0, dropout=0.0),
    )
    out = str(tmp_path / "out")
    for _ in range(2):  # second run hits the featurization cache
        infer.main([
            "--data_dir", str(data), "--out_dir", out, "--model_dir", score_dir,
            "--samples_per_complex", "2", "--inference_steps", "2", "--batch_size", "2",
            "--no_model", "--resample_rdkit", "--cache_path", str(tmp_path / "fcache"),
        ])
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["n_complexes"] == 1 and m["failures"] == 0
    import glob
    assert glob.glob(str(tmp_path / "fcache" / "infer_aaaa_*.pkl"))
