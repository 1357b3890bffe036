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
