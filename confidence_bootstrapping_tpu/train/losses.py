"""Score-matching losses (reference utils/training.py:17-126).

Per-manifold MSE with the reference's normalizations: translation weighted
by sigma^2, rotation normalized by the IGSO(3) RMS score norm, torsion by
the wrapped-normal E[score^2]; masked means over valid torsion slots. Also
returns the 'base losses' (loss of the zero predictor) used for logging.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import so3, torus
from ..ops.schedules import SigmaParams, t_to_sigma
from .diffusion import ScoreTargets


class LossBreakdown(NamedTuple):
    loss: jnp.ndarray
    tr_loss: jnp.ndarray
    rot_loss: jnp.ndarray
    tor_loss: jnp.ndarray
    tr_base_loss: jnp.ndarray
    rot_base_loss: jnp.ndarray
    tor_base_loss: jnp.ndarray


def score_matching_loss(
    tr_pred,
    rot_pred,
    tor_pred,
    targets: ScoreTargets,
    batch,
    sigma: SigmaParams,
    tr_weight=1.0,
    rot_weight=1.0,
    tor_weight=1.0,
    no_torsion=False,
    apply_mean=True,
) -> LossBreakdown:
    tr_sigma, rot_sigma, tor_sigma = t_to_sigma(batch.t_tr, batch.t_rot, batch.t_tor, sigma)

    def _m(x):
        return jnp.mean(x) if apply_mean else jnp.mean(x, axis=1)

    tr_loss = _m((tr_pred - targets.tr_score) ** 2 * tr_sigma[:, None] ** 2)
    tr_base = _m(targets.tr_score**2 * tr_sigma[:, None] ** 2)

    rot_norm = so3.score_norm(rot_sigma)[:, None]
    rot_loss = _m(((rot_pred - targets.rot_score) / rot_norm) ** 2)
    rot_base = _m((targets.rot_score / rot_norm) ** 2)

    if no_torsion:
        z = jnp.zeros(()) if apply_mean else jnp.zeros(tr_loss.shape)
        tor_loss = tor_base = z
    else:
        tor_norm2 = torus.score_norm(targets.tor_sigma)[:, None]  # [B, 1]
        m = batch.tor_mask.astype(tr_pred.dtype)
        per_edge = (tor_pred - targets.tor_score) ** 2 / tor_norm2 * m
        per_edge_base = targets.tor_score**2 / tor_norm2 * m
        if apply_mean:
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            tor_loss = jnp.sum(per_edge) / cnt
            tor_base = jnp.sum(per_edge_base) / cnt
        else:
            cnt = jnp.sum(m, axis=1) + 1e-4
            tor_loss = jnp.sum(per_edge, axis=1) / cnt
            tor_base = jnp.sum(per_edge_base, axis=1) / cnt

    loss = tr_loss * tr_weight + rot_loss * rot_weight + tor_loss * tor_weight
    return LossBreakdown(loss, tr_loss, rot_loss, tor_loss, tr_base, rot_base, tor_base)


def sidechain_losses(sidechain_pred, rec_sidechain, rec_mask):
    """Side-chain chi (circular) + backbone-vector regression losses
    (reference utils/training.py:63-122). Returns (sidechain_loss,
    backbone_loss, sidechain_base, backbone_base) as masked means.

    rec_sidechain: [B, N, 10] = chi1-4 (normalized to [0,1), NaN where
    undefined) + flattened CA->N / CA->C unit vectors.
    """
    m = rec_mask.astype(sidechain_pred.dtype)
    chi = rec_sidechain[..., :4]
    chi_pred = sidechain_pred[..., :4]
    defined = jnp.isfinite(chi) & rec_mask[..., None]
    chi_s = jnp.where(defined, chi, 0.0)
    chi_p = jnp.where(defined, chi_pred, 0.0)
    diff = jnp.abs(chi_p - chi_s)
    diff = jnp.minimum(diff, 1.0 - diff)  # angles are circular, 360 deg = 1
    chi_base = jnp.sum(chi_s**2 * defined) / jnp.maximum(jnp.sum(defined), 1.0) + 1e-4
    sidechain_loss = jnp.sum(diff**2 * defined) / jnp.maximum(jnp.sum(defined), 1.0) / chi_base

    bb = rec_sidechain[..., 4:]
    bb_pred = sidechain_pred[..., 4:]
    bb_base = jnp.sum(bb**2 * m[..., None]) / jnp.maximum(jnp.sum(m) * 6, 1.0) + 1e-4
    backbone_loss = jnp.sum((bb_pred - bb) ** 2 * m[..., None]) / jnp.maximum(jnp.sum(m) * 6, 1.0) / bb_base
    return sidechain_loss, backbone_loss, chi_base, bb_base


def _bce_with_logits(logits, labels):
    logp = jnp.logaddexp(0.0, -logits)  # -log sigmoid(x)
    lognp = jnp.logaddexp(0.0, logits)  # -log (1 - sigmoid(x))
    return labels * logp + (1 - labels) * lognp


def confidence_loss(confidence_pred, labels, rmsd_prediction=False):
    """Pose-level confidence loss (reference confidence_train.py:239-248):
    MSE on RMSD when rmsd_prediction; multi-bin cross-entropy when the
    labels are one-hot over RMSD bins ([b, nbins], the list-cutoff mode);
    binary cross-entropy otherwise."""
    if rmsd_prediction:
        return jnp.mean((confidence_pred - labels) ** 2)
    if labels.ndim == confidence_pred.ndim and labels.ndim >= 2 and labels.shape[-1] > 1:
        logz = jax.scipy.special.logsumexp(confidence_pred, axis=-1, keepdims=True)
        return -jnp.mean(jnp.sum(labels * (confidence_pred - logz), axis=-1))
    return jnp.mean(_bce_with_logits(confidence_pred, labels))


def affinity_loss(affinity_pred, affinity_labels, valid=None):
    """Binding-affinity MSE (reference confidence_train.py:224-237): in the
    combined-head mode only poses whose pose label is positive (RMSD below
    the classification cutoff) contribute — `valid` is that binary mask;
    zero when no pose qualifies. In the parallel/legacy mode every group
    contributes (valid=None)."""
    se = (affinity_pred - affinity_labels) ** 2
    if valid is None:
        return jnp.mean(se)
    v = valid.astype(jnp.float32)
    return jnp.sum(se * v) / jnp.maximum(jnp.sum(v), 1.0)


def atom_confidence_loss(atom_pred, atom_labels, lig_mask):
    """Per-atom confidence loss over real ligand atoms (reference
    confidence_train.py:249-258): BCE for atom_pred [b, L] with binary
    labels, cross-entropy for atom_pred [b, L, nbins] with one-hot bins.
    Padded atoms are masked out of the mean."""
    m = lig_mask.astype(jnp.float32)
    if atom_pred.ndim == 3 and atom_pred.shape[-1] > 1:
        logz = jax.scipy.special.logsumexp(atom_pred, axis=-1, keepdims=True)
        per_atom = -jnp.sum(atom_labels * (atom_pred - logz), axis=-1)
    else:
        atom_pred = atom_pred[..., 0] if atom_pred.ndim == 3 else atom_pred
        per_atom = _bce_with_logits(atom_pred, atom_labels)
    return jnp.sum(per_atom * m) / jnp.maximum(jnp.sum(m), 1.0)
