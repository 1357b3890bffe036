"""Confidence stack tests: generation cache, filtering dataset, training."""

import numpy as np
import jax

from confidence_bootstrapping_tpu.config import ScoreModelConfig, TrainConfig
from confidence_bootstrapping_tpu.confidence import dataset as cdataset
from confidence_bootstrapping_tpu.confidence import train as ctrain
from confidence_bootstrapping_tpu.data.complex_graph import replicate_complex
from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel

from test_score_model import SMALL_CFG
from test_bootstrapping import _synthetic_target


def test_generate_cache_and_filtering_dataset(tmp_path):
    targets = [_synthetic_target("AAAA_1", 0), _synthetic_target("BBBB_1", 1)]
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), replicate_complex(targets[0].padded, 1))

    cache = cdataset.generate_filtering_cache(
        model, variables, targets, jax.random.PRNGKey(1), SMALL_CFG,
        samples_per_complex=3, inference_steps=2, cache_path=str(tmp_path), cache_id="t",
    )
    assert set(cache) == {"AAAA_1", "BBBB_1"}
    pos, rmsds = cache["AAAA_1"]
    assert pos.shape[0] == 3 and rmsds.shape == (3,)
    # cache is idempotent (reloads from disk)
    cache2 = cdataset.generate_filtering_cache(
        model, variables, targets, jax.random.PRNGKey(99), SMALL_CFG,
        samples_per_complex=3, inference_steps=2, cache_path=str(tmp_path), cache_id="t",
    )
    np.testing.assert_allclose(cache2["AAAA_1"][0], pos)

    merged = cdataset.combine_caches([cache, cache2])
    assert merged["AAAA_1"][0].shape[0] == 6

    ds = cdataset.FilteringDataset(targets, cache, rmsd_classification_cutoff=2.0, rmsd_classification_upper=None, balance=False)
    batch, labels = ds.sample_batch(cache, 4)
    assert batch.lig_pos.shape[0] == 4
    assert labels.shape == (4,)
    assert float(np.asarray(batch.t_tr).max()) == 0.0


def test_confidence_training_learns_separable_labels():
    """With oracle-separable data (labels from cache rmsds), a few steps of
    training should run finite and produce scores."""
    targets = [_synthetic_target("AAAA_1", 0)]
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1, lm_embedding_dim=16,
        dropout=0.0, confidence_mode=True,
    )
    model = TensorProductScoreModel(cfg)
    score_model = TensorProductScoreModel(SMALL_CFG)
    sv = score_model.init(jax.random.PRNGKey(0), replicate_complex(targets[0].padded, 1))
    cache = cdataset.generate_filtering_cache(
        score_model, sv, targets, jax.random.PRNGKey(1), SMALL_CFG, samples_per_complex=4, inference_steps=2
    )
    batch0 = replicate_complex(targets[0].padded, 2).set_time(0.0, 0.0, 0.0)
    variables = model.init(jax.random.PRNGKey(0), batch0)
    ds = cdataset.FilteringDataset(targets, cache, rmsd_classification_upper=None, balance=False)
    state, history = ctrain.train_confidence(
        model, variables, ds, cache, TrainConfig(lr=1e-3, batch_size=2), n_epochs=2,
        batches_per_epoch=2, key=jax.random.PRNGKey(3), val_dataset=ds, val_cache=cache,
        log=lambda s: None,
    )
    assert len(history) == 2
    assert np.isfinite(history[-1]["train"]["confidence_loss"])
    assert "roc_auc" in history[-1]["val"]


def test_roc_auc():
    labels = np.array([1, 1, 0, 0])
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    assert ctrain.roc_auc(labels, scores) == 1.0
    assert abs(ctrain.roc_auc(labels, scores[::-1]) - 0.0) < 1e-9


def test_perturbation_filtering_dataset():
    targets = [_synthetic_target("AAAA_1", 0)]
    ds = cdataset.PerturbationFilteringDataset(targets, SMALL_CFG)
    rng = np.random.RandomState(0)
    batch, labels = ds.sample_batch(jax.random.PRNGKey(0), 4, rng)
    assert labels.shape == (4,)
    assert set(np.unique(labels)).issubset({0.0, 1.0})
