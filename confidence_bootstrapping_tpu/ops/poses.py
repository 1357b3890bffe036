"""Pose update kernel: rigid + torsional conformer modification.

TPU-native equivalent of the reference's ``utils/diffusion_utils.py:35-78``
(``modify_conformer`` / ``modify_conformer_batch``): translate + rotate the
ligand about its centroid, apply torsion updates, then Kabsch-align the
flexible result back onto the rigid pose so torsion updates stay "orthogonal"
to the rigid degrees of freedom. Operates on fixed-shape padded batches and is
fully jittable (used inside the sampler's lax.scan and the training-time
noise transform).
"""

import jax.numpy as jnp

from .geometry import axis_angle_to_matrix, kabsch_align
from .torsion import apply_torsion_updates


def masked_mean(x, mask, axis, keepdims=False):
    """Mean of x over `axis` counting only entries where mask is True."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m[..., None] if x.ndim == m.ndim + 1 else x * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    if x.ndim == m.ndim + 1:
        den = den[..., None] if not keepdims else den
    return num / jnp.maximum(den, 1e-12)


def modify_conformer(pos, lig_mask, tr_update, rot_update, tor_updates, tor_src, tor_dst, mask_rotate, tor_mask):
    """Apply rigid + torsional pose updates to a padded ligand batch.

    Args:
      pos:        [B, L, 3] current ligand positions (padded).
      lig_mask:   [B, L] bool valid-atom mask.
      tr_update:  [B, 3] translation.
      rot_update: [B, 3] rotation vector (axis-angle) about the centroid.
      tor_updates: [B, R] torsion angle updates, or None to skip torsions.
      tor_src, tor_dst: [B, R] rotatable-edge endpoints.
      mask_rotate: [B, R, L] rotated-atom masks.
      tor_mask:   [B, R] valid torsion slots.

    Returns: new positions [B, L, 3] (padded entries undefined but finite).
    """
    m = lig_mask.astype(pos.dtype)[..., None]
    center = jnp.sum(pos * m, axis=1, keepdims=True) / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1e-12)
    rot_mat = axis_angle_to_matrix(rot_update)  # [B, 3, 3]
    rigid = jnp.einsum("bld,bed->ble", pos - center, rot_mat, precision='highest') + tr_update[:, None, :] + center

    if tor_updates is None or tor_updates.shape[-1] == 0:
        return rigid

    flexible = apply_torsion_updates(rigid, tor_src, tor_dst, mask_rotate, tor_updates, tor_mask)
    # Kabsch-align flexible onto rigid over valid atoms only.
    aligned = kabsch_align(flexible, rigid, lig_mask)
    has_tor = jnp.any(tor_mask, axis=-1)[:, None, None]
    return jnp.where(has_tor, aligned, rigid)
