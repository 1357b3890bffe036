"""Confidence-Bootstrapping loop tests (tiny synthetic cluster)."""

import pytest
import numpy as np
import jax

from confidence_bootstrapping_tpu.config import CBConfig
from confidence_bootstrapping_tpu.bootstrapping.buffer import CBBuffer
from confidence_bootstrapping_tpu.bootstrapping import finetune
from confidence_bootstrapping_tpu.data.complex_graph import HostComplex, pick_bucket
from confidence_bootstrapping_tpu.data.mol_io import Molecule
from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel

from test_score_model import SMALL_CFG


def _synthetic_target(name="AAAA_1", seed=0, n_lig=8, n_rec=20, all_atoms=False, n_atoms=30):
    rng = np.random.RandomState(seed)
    pos = np.cumsum(rng.randn(n_lig, 3).astype(np.float32), axis=0)  # chain
    bonds = [(i, i + 1, 1) for i in range(n_lig - 1)]
    mol = Molecule(np.full(n_lig, 6), pos, bonds, np.zeros(n_lig, dtype=int))
    src = np.asarray([b[0] for b in bonds] + [b[1] for b in bonds], dtype=np.int32)
    dst = np.asarray([b[1] for b in bonds] + [b[0] for b in bonds], dtype=np.int32)
    attr = np.zeros((len(src), 4), dtype=np.float32)
    attr[:, 0] = 1
    tor_src = np.asarray([2], dtype=np.int32)
    tor_dst = np.asarray([3], dtype=np.int32)
    mask_rotate = np.zeros((1, n_lig), dtype=bool)
    mask_rotate[0, 3:] = True
    rec_pos = rng.randn(n_rec, 3).astype(np.float32) * 5
    k = 4
    from scipy.spatial import cKDTree

    _, idx = cKDTree(rec_pos).query(rec_pos, k=k + 1)
    atom_kwargs = {}
    if all_atoms:
        ka = 4
        atom_res = rng.randint(0, n_rec, size=n_atoms).astype(np.int32)
        atom_pos = (rec_pos[atom_res] + rng.randn(n_atoms, 3).astype(np.float32) * 1.5)
        _, aidx = cKDTree(atom_pos).query(atom_pos, k=ka + 1)
        atom_kwargs = dict(
            atom_f=rng.randint(0, 3, size=(n_atoms, 4)).astype(np.int32),
            atom_pos=atom_pos.astype(np.float32),
            atom_nbr=aidx[:, 1:].astype(np.int32),
            atom_nbr_mask=np.ones((n_atoms, ka), dtype=bool),
            atom_res=atom_res,
        )
    hc = HostComplex(
        name=name,
        lig_f=rng.randint(0, 2, size=(n_lig, 16)),
        lig_pos=pos,
        lig_edge_src=src,
        lig_edge_dst=dst,
        lig_edge_attr=attr,
        tor_src=tor_src,
        tor_dst=tor_dst,
        mask_rotate=mask_rotate,
        rec_f=rng.randint(0, 20, size=n_rec).astype(np.int32),
        rec_lm=np.zeros((n_rec, 16), dtype=np.float32),
        rec_pos=rec_pos,
        rec_nbr=idx[:, 1:].astype(np.int32),
        rec_nbr_mask=np.ones((n_rec, k), dtype=bool),
        orig_center=np.zeros(3, dtype=np.float32),
        orig_lig_pos=pos,
        **atom_kwargs,
    )
    return finetune.CBTarget(hc, mol, lm_dim=16)


def test_buffer_semantics():
    buf = CBBuffer(cluster_ligands=["AAAA_1"], max_complexes_per_couple=2, fixed_length=8, temperature=1.0)
    items = [({"lig_pos": np.zeros((4, 3))}, "AAAA_1", c) for c in [0.1, 0.9, 0.5]]
    buf.add_complexes(items)
    assert len(buf.complexes) == 2  # capped per receptor
    confs = sorted(c.confidence for c in buf.complexes)
    assert confs == [0.5, 0.9]
    assert len(buf) == 8  # fixed length
    _ = buf.sample_batch(4)
    # reset buffer drops old
    buf2 = CBBuffer(cluster_ligands=["AAAA_1"], reset_buffer=True)
    buf2.add_complexes(items[:2])
    buf2.add_complexes(items[2:])
    assert len(buf2.complexes) == 1


@pytest.mark.slow
def test_cb_loop_oracle():
    """Two-epoch CB loop with oracle confidence on a tiny synthetic cluster."""
    targets = [_synthetic_target("AAAA_1", 0), _synthetic_target("BBBB_1", 1)]
    model = TensorProductScoreModel(SMALL_CFG)
    from confidence_bootstrapping_tpu.data.complex_graph import replicate_complex

    variables = model.init(jax.random.PRNGKey(0), replicate_complex(targets[0].padded, 1))

    cb = CBConfig(
        n_epochs=2,
        cb_inference_freq=1,
        inference_samples=2,
        inference_steps=2,
        initial_iterations=1,
        inference_iterations=1,
        confidence_cutoff=-1000.0,  # keep everything
        oracle_confidence=True,
        fixed_length=4,
        batch_size=2,
        max_complexes_per_couple=None,
    )
    state, history = finetune.inference_finetune(
        model, variables, targets, SMALL_CFG, cb, jax.random.PRNGKey(1)
    )
    assert len(history) == 2
    assert history[0]["inference"]["n_sampled"] == 4  # 2 targets x 2 samples
    assert history[0]["buffer"]["size"] > 0
    assert np.isfinite(history[-1]["train"]["loss"])
    assert int(state.step) > 0


def test_finetune_cli_with_all_atom_confidence(tmp_path):
    """CB finetune end-to-end through the CLI with an ALL-ATOM confidence
    (filtering) model — the pretrained confidence architecture. The targets
    must be featurized with receptor-atom graphs for the filtering forward
    (previously only oracle/CG confidence worked through the CLI)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_datasets import _write_toy_complex_dir

    from confidence_bootstrapping_tpu.cli import finetune as cli
    from confidence_bootstrapping_tpu.config import ScoreModelConfig, save_yaml
    from confidence_bootstrapping_tpu.train import checkpoints as ckpt_mod

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)

    conf_dir = tmp_path / "conf"
    os.makedirs(conf_dir)
    save_yaml(ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                               lm_embedding_dim=0, dropout=0.0, all_atoms=True,
                               confidence_mode=True),
              os.path.join(conf_dir, ckpt_mod.CONFIG_NAME))
    score_dir = tmp_path / "score"
    os.makedirs(score_dir)
    save_yaml(ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                               lm_embedding_dim=0, dropout=0.0),
              os.path.join(score_dir, ckpt_mod.CONFIG_NAME))

    state, history = cli.main([
        "--data_dir", str(data), "--cache_path", str(tmp_path / "cache"),
        "--workdir", str(tmp_path / "wd"),
        "--model_dir", str(score_dir), "--confidence_model_dir", str(conf_dir),
        "--n_epochs", "1", "--inference_samples", "2", "--inference_steps", "2",
        "--confidence_cutoff", "-1000", "--initial_iterations", "1",
        "--inference_iterations", "1", "--batch_size", "2",
    ])
    assert len(history) >= 1


def test_bootstrap_gen_cli_and_training_mix(tmp_path):
    """The offline-bootstrapping workflow end-to-end: generate the filtered
    pose pickle through the CLI (reference bootstrapping/bootstrapping.py
    cache pipeline), then mix it into training via
    train --add_bootstrapping_dataset."""
    import os
    import pickle as pkl
    import sys

    import yaml

    sys.path.insert(0, os.path.dirname(__file__))
    from test_datasets import _write_toy_complex_dir

    from confidence_bootstrapping_tpu.cli import bootstrap_gen, train as train_cli
    from confidence_bootstrapping_tpu.config import ScoreModelConfig, save_yaml
    from confidence_bootstrapping_tpu.train import checkpoints as ckpt_mod

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    score_dir = tmp_path / "score"
    os.makedirs(score_dir)
    save_yaml(ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                               lm_embedding_dim=0, dropout=0.0),
              os.path.join(score_dir, ckpt_mod.CONFIG_NAME))

    kept = bootstrap_gen.main([
        "--data_dir", str(data), "--cache_path", str(tmp_path / "cache"),
        "--model_dir", str(score_dir), "--samples_per_target", "2",
        "--inference_steps", "2", "--confidence_cutoff", "-1",
    ])
    out = tmp_path / "cache" / "complexes_id1.pkl"
    assert out.exists()
    with open(out, "rb") as f:
        assert len(pkl.load(f)) == len(kept) == 2

    cfgfile = tmp_path / "tiny.yml"
    cfgfile.write_text(yaml.dump(dict(ns=8, nv=2, num_conv_layers=1,
                                      num_prot_emb_layers=1, lm_embedding_dim=0, dropout=0.0)))
    _, hist = train_cli.main([
        "--data_dir", str(data), "--cache_path", str(tmp_path / "cache"),
        "--workdir", str(tmp_path / "wd"), "--config", str(cfgfile),
        "--batch_size", "2", "--n_epochs", "1", "--val_inference_freq", "0",
        "--add_bootstrapping_dataset", str(out),
    ])
    assert np.isfinite(hist[-1]["train"]["loss"])


def test_finetune_cli_data_parallel(tmp_path):
    """CB loop with --data_parallel: rollout and finetune batches shard over
    the 8-device virtual CPU mesh and the loop completes."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_datasets import _write_toy_complex_dir

    from confidence_bootstrapping_tpu.cli import finetune as cli
    from confidence_bootstrapping_tpu.config import ScoreModelConfig, save_yaml
    from confidence_bootstrapping_tpu.train import checkpoints as ckpt_mod

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    score_dir = tmp_path / "score"
    os.makedirs(score_dir)
    save_yaml(ScoreModelConfig(ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=1,
                               lm_embedding_dim=0, dropout=0.0),
              os.path.join(score_dir, ckpt_mod.CONFIG_NAME))

    state, history = cli.main([
        "--data_dir", str(data), "--cache_path", str(tmp_path / "cache"),
        "--workdir", str(tmp_path / "wd"), "--model_dir", str(score_dir),
        "--n_epochs", "1", "--inference_samples", "8", "--inference_steps", "2",
        "--oracle_confidence", "--confidence_cutoff", "-1000",
        "--initial_iterations", "1", "--inference_iterations", "1",
        "--batch_size", "8", "--data_parallel",
    ])
    assert len(history) == 1
    assert history[0]["inference"]["n_kept"] == 8


def test_buffer_mixed_bucket_batches():
    """A CB cluster whose complexes land in DIFFERENT padding buckets must
    still produce stackable single-bucket training batches (the reference's
    dynamic PyG graphs batch freely; our device batches cannot mix shapes).
    sample_batch picks a bucket weight-proportionally per batch."""
    import numpy as np

    def item(name, n_res, conf):
        padded = {"lig_pos": np.zeros((8, 3), np.float32),
                  "rec_pos": np.zeros((n_res, 3), np.float32)}
        return (padded, name, conf)

    buf = CBBuffer(cluster_ligands=["AAAA_1", "BBBB_1"], fixed_length=16, temperature=1.0)
    buf.add_complexes([item("AAAA_1", 16, 0.5) for _ in range(3)]
                      + [item("BBBB_1", 32, 0.4) for _ in range(3)])
    seen = set()
    for _ in range(20):
        batch = buf.sample_batch(4)
        assert len(batch) == 4
        shapes = {p["rec_pos"].shape for p in batch}
        assert len(shapes) == 1, shapes  # single bucket per batch
        seen |= shapes
    assert seen == {(16, 3), (32, 3)}  # both buckets get trained over time

    # single-bucket buffers keep the exact old behavior
    buf1 = CBBuffer(cluster_ligands=["AAAA_1"], fixed_length=8)
    buf1.add_complexes([item("AAAA_1", 16, 0.1) for _ in range(2)])
    assert len(buf1.sample_batch(8)) == 8
