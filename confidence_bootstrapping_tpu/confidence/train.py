"""Confidence-model training (reference confidence/confidence_train.py).

BCE pose classification (optionally RMSD regression / per-atom labels) with
jitted train/eval steps, accuracy + ROC-AUC validation metrics, and the
best/EMA checkpoint bookkeeping of the reference (:283-446).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ScoreModelConfig, TrainConfig
from ..train.losses import affinity_loss, atom_confidence_loss, confidence_loss
from ..train.train_loop import AverageMeter, TrainState, init_train_state, make_optimizer


def _normalize_labels(labels):
    """Accept a bare label array (back-compat) or the FilteringDataset
    labels dict; -> dict with at least 'y'."""
    if isinstance(labels, dict):
        return labels
    return {"y": labels}


def _affinity_terms(out, labels_d, parallel: int):
    """-> (confidence_pred with the affinity column stripped, affinity loss).

    Two model layouts (reference confidence_train.py:224-237):
      * parallel > 1 (legacy all-atom affinity model): out.affinity is one
        value per group of `parallel` consecutive batch elements; every group
        contributes MSE against its (per-group) label;
      * parallel == 1: the affinity rides as the LAST column of the
        confidence head; only poses below the RMSD cutoff (labels
        "affinity_valid") contribute.
    """
    if "affinity" not in labels_d:
        raise ValueError("affinity_prediction requires 'affinity' labels (FilteringDataset(affinities=...))")
    if parallel > 1:
        if out.affinity is None:
            raise ValueError("parallel > 1 requires a model with affinity_prediction=True (legacy all-atom)")
        return out.confidence, affinity_loss(out.affinity, labels_d["affinity"][::parallel])
    pred = out.confidence
    aff_pred = pred[..., -1]
    pred = pred[..., :-1]
    if pred.shape[-1] == 1 and labels_d["y"].ndim == 1:
        pred = pred[..., 0]
    return pred, affinity_loss(aff_pred, labels_d["affinity"], labels_d.get("affinity_valid"))


def _accuracy(pred, y, rmsd_prediction):
    if rmsd_prediction:
        return jnp.mean(jnp.abs(pred - y))
    if y.ndim >= 2 and y.shape[-1] > 1:  # one-hot bins
        return jnp.mean((jnp.argmax(pred, -1) == jnp.argmax(y, -1)).astype(jnp.float32))
    return jnp.mean(((pred > 0) == (y > 0.5)).astype(jnp.float32))


def _maybe_compact(model, batch):
    """Crop + compact the receptor view before the forward when the model
    crops — the reference TRAINS the confidence model on subgraphed
    complexes (confidence/dataset.py:376-377 crops before every forward),
    so the embedding phase must also see the cropped graph. Jittable; the
    compacted buckets are the model config's (crop_res_cap, crop_atom_cap)."""
    c = model.cfg
    if (
        getattr(c, "all_atoms", False)
        and c.crop_beyond is not None
        and c.crop_res_cap > 0
        and c.crop_atom_cap > 0
        and batch.atom_f is not None
        and batch.rec_pos.shape[1] > c.crop_res_cap
    ):
        from ..models.all_atom_model import compact_crop

        batch, _, _ = compact_crop(batch, None, float(c.crop_beyond), c.crop_res_cap, c.crop_atom_cap)
    return batch


def make_confidence_train_step(
    model,
    cfg: TrainConfig,
    rmsd_prediction: bool = False,
    confidence_loss_weight: float = 1.0,
    atom_confidence_loss_weight: float = 0.0,
    affinity_prediction: bool = False,
    affinity_loss_weight: float = 1.0,
    parallel: int = 1,
):
    """Jitted confidence train step. With atom_confidence_loss_weight > 0
    the model's per-atom head is trained jointly (reference
    confidence_train.py:249-261, the pretrained recipe uses weight 0.5).
    With affinity_prediction the affinity MSE (reference :224-237) joins
    the objective — see _affinity_terms for the two head layouts."""
    tx = make_optimizer(cfg)

    @jax.jit
    def step(state: TrainState, batch, labels, key):
        labels_d = _normalize_labels(labels)
        batch = _maybe_compact(model, batch)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                rngs={"dropout": key},
                mutable=["batch_stats"],
            )
            conf_pred, afloss = (
                _affinity_terms(out, labels_d, parallel) if affinity_prediction
                else (out.confidence, jnp.float32(0.0))
            )
            closs = confidence_loss(conf_pred, labels_d["y"], rmsd_prediction)
            aloss = jnp.float32(0.0)
            if atom_confidence_loss_weight > 0:
                if out.atom_confidence is None:
                    raise ValueError("atom_confidence_loss_weight > 0 requires a model with atom_confidence=True")
                if "atom_y" not in labels_d:
                    raise ValueError("atom_confidence_loss_weight > 0 requires atom_y labels (set atom_label_cutoff)")
                aloss = atom_confidence_loss(out.atom_confidence, labels_d["atom_y"], batch.lig_mask)
            loss = (confidence_loss_weight * closs + atom_confidence_loss_weight * aloss
                    + affinity_loss_weight * afloss)
            return loss, (closs, aloss, afloss, conf_pred, mut["batch_stats"])

        (loss, (closs, aloss, afloss, pred, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        ok = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        decay = jnp.minimum(cfg.ema_rate, (1 + state.step) / (10 + state.step))
        new_ema = jax.tree.map(lambda e, p: decay * e + (1 - decay) * p, state.ema_params, new_params)
        acc = _accuracy(pred, labels_d["y"], rmsd_prediction)
        new_state = TrainState(new_params, jax.tree.map(lambda a, b: jnp.where(ok, b, a), state.batch_stats, new_bs),
                               new_opt, new_ema, state.step + 1, state.lr_scale)
        return new_state, dict(loss=loss, confidence_loss=closs, atom_confidence_loss=aloss,
                               affinity_loss=afloss, accuracy=acc)

    return step


def make_confidence_eval_step(model, rmsd_prediction: bool = False, atom_confidence_loss_weight: float = 0.0,
                              confidence_loss_weight: float = 1.0, affinity_prediction: bool = False,
                              affinity_loss_weight: float = 1.0, parallel: int = 1):
    @jax.jit
    def step(state: TrainState, batch, labels):
        labels_d = _normalize_labels(labels)
        batch = _maybe_compact(model, batch)
        out = model.apply({"params": state.params, "batch_stats": state.batch_stats}, batch)
        conf_pred, afloss = (
            _affinity_terms(out, labels_d, parallel) if affinity_prediction
            else (out.confidence, jnp.float32(0.0))
        )
        loss = confidence_loss_weight * confidence_loss(conf_pred, labels_d["y"], rmsd_prediction)
        if atom_confidence_loss_weight > 0 and "atom_y" in labels_d:
            loss = loss + atom_confidence_loss_weight * atom_confidence_loss(
                out.atom_confidence, labels_d["atom_y"], batch.lig_mask
            )
        loss = loss + affinity_loss_weight * afloss
        return loss, conf_pred, afloss

    return step


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """ROC-AUC via the rank statistic (no sklearn dependency needed)."""
    pos = scores[labels > 0.5]
    neg = scores[labels <= 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([pos, neg]))
    ranks = np.empty(len(order))
    ranks[order] = np.arange(1, len(order) + 1)
    r_pos = ranks[: len(pos)].sum()
    return float((r_pos - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg)))


def trajectory_sweep(
    conf_model,
    conf_variables,
    score_model,
    score_variables,
    targets,
    model_cfg,
    key,
    inference_steps: int = 20,
    samples: int = 4,
):
    """Evaluate confidence along the reverse-diffusion trajectory: accuracy
    of 'pose within 2A' at every denoising step 0..T (reference
    confidence_train.py:451-486 test() sweep)."""
    import numpy as np

    from ..config import SamplerConfig
    from ..data.complex_graph import replicate_complex
    from ..sampler import sampling as sampling_mod

    sampler_cfg = SamplerConfig(inference_steps=inference_steps)
    per_step_scores = [[] for _ in range(inference_steps + 1)]
    per_step_rmsds = [[] for _ in range(inference_steps + 1)]
    for target in targets:
        key, k1, k2 = jax.random.split(key, 3)
        batch = replicate_complex(target.padded, samples)
        batch0 = sampling_mod.randomize_position(batch, k1, model_cfg.sigma.tr_sigma_max)
        final, traj = sampling_mod.sample(
            score_model, score_variables, batch0, k2, model_cfg, sampler_cfg, return_trajectory=True
        )
        L = len(target.hc.lig_f)
        positions = np.concatenate([np.asarray(batch0.lig_pos)[None], np.asarray(traj)], axis=0)
        for step in range(inference_steps + 1):
            lp = batch.lig_pos.at[:, :L].set(positions[step, :, :L])
            scores = sampling_mod.score_confidence(conf_model, conf_variables, batch, lig_pos=lp)
            r = np.sqrt(((positions[step, :, :L] - target.hc.orig_lig_pos[None]) ** 2).sum(-1).mean(-1))
            per_step_scores[step].extend(np.asarray(scores).tolist())
            per_step_rmsds[step].extend(r.tolist())
    out = []
    for step in range(inference_steps + 1):
        s = np.asarray(per_step_scores[step])
        r = np.asarray(per_step_rmsds[step])
        out.append(
            dict(step=step, accuracy=float(np.mean((s > 0) == (r < 2.0))), mean_rmsd=float(r.mean()),
                 mean_score=float(s.mean()))
        )
    return out


def train_confidence(
    model,
    variables,
    dataset,
    cache,
    cfg: TrainConfig,
    n_epochs: int,
    batches_per_epoch: int,
    key,
    val_dataset=None,
    val_cache=None,
    rmsd_prediction: bool = False,
    confidence_loss_weight: float = 1.0,
    atom_confidence_loss_weight: float = 0.0,
    affinity_prediction: bool = False,
    affinity_loss_weight: float = 1.0,
    parallel: int = 1,
    log: Callable[[str], None] = print,
):
    """Full confidence training loop; returns (state, history)."""
    state = init_train_state(variables, cfg)
    train_step = make_confidence_train_step(model, cfg, rmsd_prediction,
                                            confidence_loss_weight, atom_confidence_loss_weight,
                                            affinity_prediction, affinity_loss_weight, parallel)
    eval_step = make_confidence_eval_step(model, rmsd_prediction, atom_confidence_loss_weight,
                                          confidence_loss_weight, affinity_prediction,
                                          affinity_loss_weight, parallel)
    history = []
    best_acc = -np.inf
    best_state = state
    for epoch in range(n_epochs):
        meter = AverageMeter()
        for _ in range(batches_per_epoch):
            key, k1, k2 = jax.random.split(key, 3)
            batch, labels = dataset.sample_batch(cache, cfg.batch_size)
            state, metrics = train_step(state, batch, labels, k2)
            meter.add({k_: float(v) for k_, v in metrics.items()})
        entry = dict(epoch=epoch, train=meter.summary())

        if val_dataset is not None:
            all_y, all_scores, losses, aflosses, all_affs, all_t = [], [], [], [], [], []
            for _ in range(max(1, batches_per_epoch // 4)):
                batch, labels = val_dataset.sample_batch(val_cache, cfg.batch_size)
                loss, scores, afloss = eval_step(state, batch, labels)
                losses.append(float(loss))
                aflosses.append(float(afloss))
                if affinity_prediction:
                    all_affs.extend(np.asarray(labels["affinity"]).tolist())
                y = labels["y"] if isinstance(labels, dict) else labels
                s = np.asarray(scores)
                if y.ndim >= 2 and y.shape[-1] > 1:
                    # binned mode: binary view = "in the best bin", score =
                    # the best-bin logit (reference ranks by bin-0 prob)
                    y, s = y[..., 0], s[..., 0]
                all_y.append(y)
                all_scores.append(s)
                all_t.append(np.asarray(batch.t_tr))
            labels_, scores_ = np.concatenate(all_y), np.concatenate(all_scores)
            acc = float(np.mean((scores_ > 0) == (labels_ > 0.5)))
            entry["val"] = dict(loss=float(np.mean(losses)), accuracy=acc, roc_auc=roc_auc(labels_, scores_))
            if getattr(val_dataset, "trajectory_sampling", False):
                # per-diffusion-time accuracy buckets (reference
                # confidence_train.py:289-363 trajectory-training meters)
                t_ = np.concatenate(all_t)
                correct = (scores_ > 0) == (labels_ > 0.5)
                buckets = np.clip((t_ * 20).astype(int), 0, 20)
                entry["val"]["per_t_accuracy"] = [
                    float(correct[buckets == b].mean()) if (buckets == b).any() else None
                    for b in range(21)
                ]
            if affinity_prediction:
                # reference test_epoch reports affinity_rmse (:287, :356) and
                # the predict-the-mean baseline affinity_mean_mse (:389-391)
                entry["val"]["affinity_rmse"] = float(np.sqrt(np.mean(aflosses)))
                a = np.asarray(all_affs)
                entry["val"]["affinity_mean_mse"] = float(((a - a.mean()) ** 2).mean()) if len(a) else 0.0
            if acc > best_acc:
                best_acc, best_state = acc, state
        history.append(entry)
        log(f"confidence epoch {epoch}: {entry}")
    return (best_state if val_dataset is not None else state), history
