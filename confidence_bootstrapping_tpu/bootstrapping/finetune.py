"""The Confidence-Bootstrapping driver: rollout -> filter -> buffer -> train.

Re-implements the reference's ``finetune_train.py`` loop (lines 133-349):

  * ``inference_epoch``: sample ``inference_samples`` poses per target
    complex with the (EMA) score model, score them with the confidence
    model, compute symmetry RMSDs against the crystal pose, and keep poses
    above the confidence cutoff (or oracle -RMSD);
  * ``inference_finetune``: alternate rollout rounds (``initial_iterations``
    on epoch 0, then ``inference_iterations`` every ``cb_inference_freq``
    epochs) with score-matching finetune epochs on the buffer, using EMA
    weights for rollouts (reference :270-273) and checkpointing each epoch.

Device work (sampling, confidence scoring, train steps) runs as jitted
fixed-shape programs; RMSDs and buffer bookkeeping stay host-side.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import CBConfig, SamplerConfig, ScoreModelConfig, TrainConfig
from ..data.complex_graph import HostComplex, batch_complexes, pad_complex, pick_bucket, replicate_complex
from ..eval import rmsd as rmsd_mod
from ..sampler import sampling
from ..train import checkpoints, train_loop
from .buffer import CBBuffer


class CBTarget:
    """One target complex: host arrays + padded template + topology for RMSD."""

    def __init__(self, hc: HostComplex, mol_heavy, lm_dim: int = 0, bucket=None):
        self.hc = hc
        self.mol = mol_heavy  # Molecule (heavy atoms) for symmetry RMSD
        self.bucket = bucket or pick_bucket(
            len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f),
            n_atoms=0 if hc.atom_f is None else len(hc.atom_f),
            all_atoms=hc.atom_f is not None,
        )
        self.lm_dim = lm_dim
        self.padded = pad_complex(hc, self.bucket, lm_dim=lm_dim)
        self.name = hc.name


def inference_epoch(
    model,
    variables,
    targets: Sequence[CBTarget],
    key,
    model_cfg: ScoreModelConfig,
    cb: CBConfig,
    confidence_fn: Optional[Callable] = None,
    dp_mesh=None,
) -> Tuple[List[Tuple[dict, str, float]], Dict]:
    """One rollout round over the target complexes.

    confidence_fn(target, lig_pos [n, L, 3]) -> confidence [n]; None together
    with oracle_confidence=False keeps every pose with confidence 0.
    dp_mesh: optional jax.sharding Mesh — pose batches shard over its 'data'
    axis (params replicated). Returns (kept buffer items, metrics dict).
    """
    sampler_cfg = SamplerConfig(inference_steps=cb.inference_steps)
    kept: List[Tuple[dict, str, float]] = []
    _plan_cache: Dict[str, SamplerConfig] = {}

    def _sampler_cfg_for(target) -> SamplerConfig:
        # default-on phased receptor compaction in CB rollouts (VERDICT r3
        # item 2): derive the per-complex (step, cap) plan once per target
        # (host-side; caps quantized to powers of two so the compile-variant
        # count across targets stays tiny)
        if not sampler_cfg.rec_phase_auto:
            return sampler_cfg
        sc = _plan_cache.get(target.name)
        if sc is None:
            import dataclasses

            steps_a, caps_a = sampling.derive_phase_plan(
                model_cfg, sampler_cfg, target.padded["rec_pos"], target.padded["rec_mask"])
            sc = (dataclasses.replace(sampler_cfg, rec_phase_steps=steps_a, rec_phase_caps=caps_a)
                  if steps_a else sampler_cfg)
            _plan_cache[target.name] = sc
        return sc
    all_rmsds, all_confidences, kept_rmsds = [], [], []
    n_failures = 0
    # per-phase wall budget of the host<->device choreography (SURVEY §7.3-4):
    # rollout = batch build + reverse diffusion (np.asarray is the sync point),
    # rmsd = host-side symmetry RMSD, confidence = confidence-model scoring
    wall = dict(rollout=0.0, rmsd=0.0, confidence=0.0)

    for target in targets[: cb.num_inference_complexes or len(targets)]:
        key, k1, k2 = jax.random.split(key, 3)
        try:
            t0 = time.time()
            batch = replicate_complex(target.padded, cb.inference_samples)
            batch = sampling.randomize_position(batch, k1, model_cfg.sigma.tr_sigma_max)
            if dp_mesh is not None and cb.inference_samples % dp_mesh.devices.size == 0:
                from ..parallel import mesh as meshlib

                batch = meshlib.shard_batch(dp_mesh, batch)
            final, _ = sampling.sample_jit(model, variables, batch, k2, model_cfg, _sampler_cfg_for(target))
            L = len(target.hc.lig_f)
            poses = np.asarray(final.lig_pos)[:, :L]
            wall["rollout"] += time.time() - t0

            # symmetry-corrected, min over all valid ground-truth binding
            # poses (reference get_symmetry_rmsd over the orig_pos list)
            t0 = time.time()
            rmsds = rmsd_mod.symmetry_rmsd(
                rmsd_mod.ground_truth_poses(target.hc), poses, target.mol.atomic_nums, target.mol.bonds
            )
            wall["rmsd"] += time.time() - t0
            t0 = time.time()
            if cb.oracle_confidence:
                confidences = -rmsds
            elif confidence_fn is not None:
                confidences = np.asarray(confidence_fn(target, poses))
            else:
                confidences = np.zeros(len(poses))
            wall["confidence"] += time.time() - t0

            all_rmsds.extend(rmsds.tolist())
            all_confidences.extend(np.atleast_1d(confidences).tolist())
            for i in range(len(poses)):
                if confidences[i] > cb.confidence_cutoff:
                    item = dict(target.padded)
                    lig_pos = item["lig_pos"].copy()
                    lig_pos[:L] = poses[i]
                    item["lig_pos"] = lig_pos
                    kept.append((item, target.name, float(confidences[i])))
                    kept_rmsds.append(float(rmsds[i]))
        except Exception as e:  # skip-and-continue (reference finetune_train.py:171-197)
            n_failures += 1
            print(f"inference failed on {target.name}: {type(e).__name__}: {e}")
            if n_failures > cb.limit_failures:
                raise

    all_rmsds = np.asarray(all_rmsds) if all_rmsds else np.zeros(0)
    metrics = dict(
        n_sampled=len(all_rmsds),
        n_kept=len(kept),
        rmsds_lt2=float(np.mean(all_rmsds < 2)) if len(all_rmsds) else 0.0,
        rmsds_lt5=float(np.mean(all_rmsds < 5)) if len(all_rmsds) else 0.0,
        kept_rmsds_lt2=float(np.mean(np.asarray(kept_rmsds) < 2)) if kept_rmsds else 0.0,
        mean_rmsd=float(all_rmsds.mean()) if len(all_rmsds) else 0.0,
        mean_confidence=float(np.mean(all_confidences)) if all_confidences else 0.0,
        failures=n_failures,
        kept_rmsds=list(kept_rmsds),  # per-pose RMSDs of the confidence-filtered poses
        wall_rollout=wall["rollout"],
        wall_rmsd=wall["rmsd"],
        wall_confidence=wall["confidence"],
    )
    return kept, metrics


def inference_finetune(
    model,
    variables,
    targets: Sequence[CBTarget],
    model_cfg: ScoreModelConfig,
    cb: CBConfig,
    key,
    confidence_fn: Optional[Callable] = None,
    workdir: Optional[str] = None,
    original_dataset=None,
    dp_mesh=None,
):
    """The full CB loop. Returns (final TrainState, metric history)."""
    tcfg = TrainConfig(
        lr=cb.lr,
        batch_size=cb.batch_size,
        minimum_t=cb.minimum_t,
        sampling_mixing_coeff=cb.sampling_mixing_coeff,
        sampling_alpha=cb.sampling_alpha,
        sampling_beta=cb.sampling_beta,
        tr_weight=0.33, rot_weight=0.33, tor_weight=0.33,
    )
    state = train_loop.init_train_state(variables, tcfg)
    train_step = train_loop.make_train_step(model, model_cfg, tcfg)

    buffer = CBBuffer(
        cluster_ligands=[t.name for t in targets],
        max_complexes_per_couple=cb.max_complexes_per_couple,
        fixed_length=cb.fixed_length,
        temperature=cb.temperature,
        buffer_decay=cb.buffer_decay,
        reset_buffer=cb.reset_buffer,
    )
    history = []
    filtered_rmsds: list = []  # RMSDs of every confidence-kept pose across the run

    for epoch in range(cb.n_epochs):
        t0 = time.time()
        if epoch % cb.cb_inference_freq == 0:
            n_iters = cb.initial_iterations if epoch == 0 else cb.inference_iterations
            # rollouts use EMA weights (reference finetune_train.py:270-273)
            roll_vars = dict(variables)
            roll_vars["params"] = state.ema_params if cb.use_ema_for_rollouts else state.params
            roll_vars["batch_stats"] = state.batch_stats
            inf_metrics = {}
            for it in range(n_iters):
                key, k = jax.random.split(key)
                kept, inf_metrics = inference_epoch(model, roll_vars, targets, k, model_cfg, cb, confidence_fn,
                                                    dp_mesh=dp_mesh)
                filtered_rmsds.extend(inf_metrics.pop("kept_rmsds", []))
                buffer.add_complexes(kept)
                print(f"epoch {epoch} rollout {it}: kept {inf_metrics['n_kept']}/{inf_metrics['n_sampled']}, "
                      f"rmsds<2A {inf_metrics['rmsds_lt2']:.3f}, buffer {buffer.statistics()['size']}")

        # finetune on the buffer (optionally mixed with original train
        # batches, reference --keep_original_train finetune_train.py:116-126;
        # batches alternate because bucket shapes must stay uniform per batch)
        train_metrics = {}
        t_train0 = time.time()
        if len(buffer.complexes) > 0:
            n_batches = max(1, len(buffer) // cb.batch_size)
            meter = train_loop.AverageMeter()
            orig_batches = []
            if cb.keep_original_train and original_dataset is not None and len(original_dataset) > 0:
                rng = np.random.RandomState(epoch)
                orig_batches = original_dataset.epoch_batches(cb.batch_size, rng)[: max(1, n_batches)]
            for bi in range(n_batches + len(orig_batches)):
                if bi % 2 == 1 and orig_batches:
                    batch = orig_batches.pop()
                else:
                    batch = batch_complexes(buffer.sample_batch(cb.batch_size))
                if dp_mesh is not None and cb.batch_size % dp_mesh.devices.size == 0:
                    from ..parallel import mesh as meshlib

                    batch = meshlib.shard_batch(dp_mesh, batch)
                key, k = jax.random.split(key)
                state, metrics = train_step(state, batch, k)
                meter.add({m: float(v) for m, v in metrics.items()})
            train_metrics = meter.summary()

        entry = dict(epoch=epoch, buffer=buffer.statistics(), train=train_metrics,
                     wall=time.time() - t0, wall_train=time.time() - t_train0)
        if epoch % cb.cb_inference_freq == 0:
            entry["inference"] = inf_metrics
        history.append(entry)
        print(f"epoch {epoch}: loss {train_metrics.get('loss', float('nan')):.4f} ({entry['wall']:.1f}s)")

        if workdir:
            os.makedirs(workdir, exist_ok=True)
            v = dict(variables)
            v["params"] = state.params
            v["batch_stats"] = state.batch_stats
            checkpoints.save_params(os.path.join(workdir, "last_model.msgpack"), v)
            v["params"] = state.ema_params
            checkpoints.save_params(os.path.join(workdir, "ema_model.msgpack"), v)
            with open(os.path.join(workdir, "metrics.pkl"), "wb") as f:
                pickle.dump(history, f)
            # RMSDs of every confidence-filtered pose (reference
            # finetune_train.py:348-349 --save_final_rmsds)
            np.save(os.path.join(workdir, "final_filtered_rmsds.npy"), np.asarray(filtered_rmsds))

    return state, history
