"""End-to-end learns-to-dock proofs (VERDICT round-2 item 2).

The reference's de-facto regression check is its in-training inference
benchmark: sample poses with the current model and compute RMSD<2A rates
(utils/training.py:292-373 inference_epoch_fix, train.py:76-96). These tests
are the rebuild's analogue, asserting the PRODUCT (score matching -> sampler
-> pose RMSD), not just loss mechanics:

  (a) a tiny score model overfit on one toy complex until its SAMPLED poses
      dock (min RMSD < 2 A, from an initial > 2.5 A) — fails if training is
      a no-op;
  (b) the Confidence-Bootstrapping loop (rollout -> oracle filter -> buffer
      -> finetune, reference finetune_train.py:252-349) improves the sampled
      pose quality across CB epochs — the paper's core mechanism.

Both share one pretraining run (module-level cache): states are snapshotted
at a partial (200) and converged (500) step count. Everything is seeded and
runs on the CPU backend, so the assertions are deterministic.
"""

import pytest
import jax
import numpy as np

from confidence_bootstrapping_tpu.config import CBConfig, SamplerConfig, ScoreModelConfig, TrainConfig
from confidence_bootstrapping_tpu.data.complex_graph import replicate_complex
from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
from confidence_bootstrapping_tpu.ops.schedules import SigmaParams
from confidence_bootstrapping_tpu.sampler import sampling
from confidence_bootstrapping_tpu.train import train_loop
from confidence_bootstrapping_tpu.bootstrapping import finetune

from test_bootstrapping import _synthetic_target

# Reduced noise ranges keep the toy task learnable in a few hundred steps
# (the full 19 A translation range needs far more data/steps than a test).
SIGMA = SigmaParams(tr_sigma_min=0.1, tr_sigma_max=3.0,
                    rot_sigma_min=0.06, rot_sigma_max=1.6,
                    tor_sigma_min=0.0314, tor_sigma_max=3.14)
CFG = ScoreModelConfig(ns=16, nv=4, num_conv_layers=2, num_prot_emb_layers=1,
                       lm_embedding_dim=16, dropout=0.0, sigma=SIGMA)

_cache = {}


def _setup():
    """Train the tiny model on one toy complex; snapshot partial/converged
    states. Cached so both tests share the single pretraining run."""
    if _cache:
        return _cache
    target = _synthetic_target("AAAA_1", 0)
    model = TensorProductScoreModel(CFG)
    batch8 = replicate_complex(target.padded, 8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch8)

    tcfg = TrainConfig(lr=3e-3, batch_size=8, ema_rate=0.95)
    state = train_loop.init_train_state(variables, tcfg)
    step_fn = train_loop.make_train_step(model, CFG, tcfg)

    key = jax.random.PRNGKey(42)
    snapshots = {0: state}
    for i in range(500):
        key, k = jax.random.split(key)
        state, _ = step_fn(state, batch8, k)
        if i + 1 in (200, 500):
            snapshots[i + 1] = state
    _cache.update(target=target, model=model, snapshots=snapshots)
    return _cache


def _sample_rmsds(model, state, target, key, n=16, steps=10, ema=False):
    """Sample n poses and return their plain RMSDs to the crystal pose."""
    bundle = {"params": state.ema_params if ema else state.params,
              "batch_stats": state.batch_stats}
    batch = replicate_complex(target.padded, n)
    b0 = sampling.randomize_position(batch, key, CFG.sigma.tr_sigma_max)
    final, _ = sampling.sample_jit(model, bundle, b0, jax.random.fold_in(key, 1),
                                   CFG, SamplerConfig(inference_steps=steps))
    L = len(target.hc.lig_f)
    poses = np.asarray(final.lig_pos)[:, :L]
    ref = np.asarray(target.hc.orig_lig_pos)
    return np.sqrt(((poses - ref[None]) ** 2).sum(-1).mean(-1))


@pytest.mark.slow
def test_overfit_model_docks():
    """Score matching -> sampler -> RMSD: the converged model's sampled poses
    reach < 2 A of the crystal pose; the untrained model's do not."""
    c = _setup()
    key = jax.random.PRNGKey(100)
    r_init = _sample_rmsds(c["model"], c["snapshots"][0], c["target"], key)
    r_final = _sample_rmsds(c["model"], c["snapshots"][500], c["target"], key)
    assert r_init.min() > 2.5, r_init.min()  # untrained: nowhere near docked
    assert r_final.min() < 2.0, r_final.min()  # trained: docks
    assert r_final.mean() < 2.5, r_final.mean()
    assert r_final.mean() < 0.5 * r_init.mean()  # training moved the needle


@pytest.mark.slow
def test_cb_loop_improves_poses():
    """The CB loop's oracle-filtered self-training improves sampled pose
    quality across epochs (reference finetune_train.py:252-349): starting
    from a PARTIALLY trained model, rollout -> keep RMSD<3.5 poses -> train
    on the buffer lowers the rollout mean RMSD and raises RMSD<2 rates."""
    c = _setup()
    state200 = c["snapshots"][200]
    variables = {"params": state200.params, "batch_stats": state200.batch_stats}

    cb = CBConfig(
        n_epochs=7,
        cb_inference_freq=2,  # rollouts at epochs 0, 2, 4, 6
        inference_samples=16,
        inference_steps=10,
        initial_iterations=1,
        inference_iterations=1,
        confidence_cutoff=-3.5,  # oracle: keep poses with RMSD < 3.5 A
        oracle_confidence=True,
        batch_size=8,
        lr=3e-3,
        max_complexes_per_couple=None,
        use_ema_for_rollouts=False,  # short run: EMA lag would mask the gain
    )
    _, history = finetune.inference_finetune(
        c["model"], variables, [c["target"]], CFG, cb, jax.random.PRNGKey(7))

    inf = [h["inference"] for h in history if "inference" in h]
    print("CB rollout metrics:", [(m["mean_rmsd"], m["rmsds_lt5"], m["n_kept"]) for m in inf])
    assert len(inf) == 4
    assert inf[0]["n_kept"] > 0  # the partial model already finds some poses
    # the paper's mechanism: self-training on confidence-kept poses improves
    # the rollout distribution — fails if the finetuning is a no-op.
    # (rmsds_lt2 at 16 samples is a 0-or-1-pose count — too noisy to gate on;
    # mean RMSD and the kept-pose count are the stable signals at this scale.)
    assert inf[-1]["mean_rmsd"] < 0.9 * inf[0]["mean_rmsd"], (inf[0], inf[-1])
    assert inf[-1]["n_kept"] >= inf[0]["n_kept"]
    assert inf[-1]["rmsds_lt5"] > inf[0]["rmsds_lt5"]


@pytest.mark.slow
def test_confidence_reranking_lifts_top1():
    """The paper's headline mechanism, one level above learns-to-dock: a
    confidence model TRAINED on generated poses must make filtered top-1
    pose selection beat random ranking on held-out rollouts (reference
    inference.py:624-716 filtered_* metrics; VERDICT r3 item 5 — this test
    fails if confidence training is a ranking no-op)."""
    from confidence_bootstrapping_tpu.confidence import dataset as cdataset
    from confidence_bootstrapping_tpu.confidence import train as ctrain

    c = _setup()
    state200 = c["snapshots"][200]
    v200 = {"params": state200.params, "batch_stats": state200.batch_stats}
    target = c["target"]

    # pose pool from the PARTIAL model: mixed quality, so ranking matters
    cache = cdataset.generate_filtering_cache(
        c["model"], v200, [target], jax.random.PRNGKey(11), CFG,
        samples_per_complex=48, inference_steps=10,
    )
    rmsds = cache[target.name][1]
    cutoff = float(np.median(rmsds))  # balanced, learnable labels
    assert 0.5 < cutoff < 10.0, cutoff

    conf_cfg = ScoreModelConfig(ns=16, nv=4, num_conv_layers=2, num_prot_emb_layers=1,
                                lm_embedding_dim=16, dropout=0.0, sigma=SIGMA,
                                confidence_mode=True)
    conf_model = TensorProductScoreModel(conf_cfg)
    batch0 = replicate_complex(target.padded, 2).set_time(0.0, 0.0, 0.0)
    conf_vars = jax.jit(conf_model.init)(jax.random.PRNGKey(12), batch0)
    ds = cdataset.FilteringDataset([target], cache, rmsd_classification_cutoff=cutoff,
                                   rmsd_classification_upper=None, balance=False, seed=3)
    conf_state, history = ctrain.train_confidence(
        conf_model, conf_vars, ds, cache, TrainConfig(lr=3e-3, batch_size=16),
        n_epochs=30, batches_per_epoch=4, key=jax.random.PRNGKey(13),
        log=lambda s: None,
    )
    trained = {"params": conf_state.params, "batch_stats": conf_state.batch_stats}

    def score(variables, poses):
        b = replicate_complex(target.padded, len(poses))
        L = poses.shape[1]
        lp = b.lig_pos.at[:, :L].set(poses)
        return np.asarray(sampling.score_confidence(conf_model, variables, b, lig_pos=lp))

    # held-out rollouts: 6 independent batches of 8 poses; rank each batch
    rng = jax.random.PRNGKey(500)
    top1_trained, top1_rand, pool_means, pool_all = [], [], [], []
    for rep in range(6):
        rng, k = jax.random.split(rng)
        batch = replicate_complex(target.padded, 8)
        b0 = sampling.randomize_position(batch, k, CFG.sigma.tr_sigma_max)
        final, _ = sampling.sample_jit(c["model"], v200, b0, jax.random.fold_in(k, 1),
                                       CFG, SamplerConfig(inference_steps=10))
        L = len(target.hc.lig_f)
        poses = np.asarray(final.lig_pos)[:, :L]
        ref = np.asarray(target.hc.orig_lig_pos)
        r = np.sqrt(((poses - ref[None]) ** 2).sum(-1).mean(-1))
        conf = score(trained, poses)
        top1_trained.append(r[int(np.argmax(conf))])
        top1_rand.append(float(r.mean()))  # expectation of a random pick
        pool_means.append(float(r.mean()))
        pool_all.extend(r.tolist())

    t1, rnd = float(np.mean(top1_trained)), float(np.mean(top1_rand))
    print(f"confidence rerank: top1(trained)={t1:.2f} random={rnd:.2f} "
          f"pool min/med={np.min(pool_all):.2f}/{np.median(pool_all):.2f} cutoff={cutoff:.2f}")
    # the trained ranking must clearly beat random pose selection
    assert t1 < 0.85 * rnd, (t1, rnd)
    # and beat the pool median (it picks from the good half)
    assert t1 < np.median(pool_all), (t1, np.median(pool_all))
