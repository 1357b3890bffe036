"""Torsion-angle updates on padded ligand batches.

Device-side re-design of the reference's ``utils/torsion.py:48-90``
(``modify_conformer_torsion_angles[_batch]``): the sequential per-rotatable-
edge rotation loop becomes a ``lax.scan`` over a fixed number of padded
torsion slots, preserving the reference's application order (order matters
when rotated atom sets nest). Rotatable-bond *detection* (the networkx part,
reference lines 15-45) lives host-side in ``data/torsion_detect.py``.

Conventions (same as reference): for rotatable edge (u, v), the rotation
axis is pos[u] - pos[v] and the atoms flagged in ``mask_rotate`` (which must
contain v's side, not u) rotate about pos[v] by the update angle.
"""

import jax
import jax.numpy as jnp

from .geometry import axis_angle_to_matrix


def apply_torsion_updates(pos, tor_src, tor_dst, mask_rotate, updates, tor_mask):
    """Apply torsion-angle updates sequentially over padded torsion slots.

    Args:
      pos:         [B, L, 3] ligand positions.
      tor_src:     [B, R] int atom index u of each rotatable edge.
      tor_dst:     [B, R] int atom index v (the rotated-side anchor).
      mask_rotate: [B, R, L] bool, atoms that rotate for each edge.
      updates:     [B, R] rotation angles (radians).
      tor_mask:    [B, R] bool, valid torsion slots.

    Returns: new positions [B, L, 3].
    """
    B, L, _ = pos.shape
    R = updates.shape[-1]
    if R == 0:
        return pos

    def body(p, inputs):
        u, v, rot_atoms, angle, valid = inputs
        # u, v: [B]; rot_atoms: [B, L]; angle, valid: [B]
        pu = jnp.take_along_axis(p, u[:, None, None].astype(jnp.int32), axis=1)[:, 0]  # [B, 3]
        pv = jnp.take_along_axis(p, v[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        axis = pu - pv
        axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
        rot = axis_angle_to_matrix(axis * angle[:, None])  # [B, 3, 3]
        rotated = jnp.einsum("bld,bed->ble", p - pv[:, None, :], rot, precision='highest') + pv[:, None, :]
        sel = (rot_atoms & valid[:, None])[..., None]
        return jnp.where(sel, rotated, p), None

    xs = (
        jnp.moveaxis(tor_src, -1, 0),
        jnp.moveaxis(tor_dst, -1, 0),
        jnp.moveaxis(mask_rotate, 1, 0),
        jnp.moveaxis(updates, -1, 0),
        jnp.moveaxis(tor_mask, -1, 0),
    )
    new_pos, _ = jax.lax.scan(body, pos, xs)
    return new_pos


def _bdot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def get_torsion_angles(dihedral, pos):
    """Current torsion angles of dihedral tuples (c, a, b, d).

    dihedral: [R, 4] int (host-precomputed, see reference utils/torsion.py:121);
    pos: [B, L, 3]. Returns angles [B, R] in (-pi, pi).
    Mirrors the projection-based formula of the reference (lines 145-160).
    """
    c, a, b, d = dihedral[:, 0], dihedral[:, 1], dihedral[:, 2], dihedral[:, 3]
    pa, pb, pc, pd = pos[:, a], pos[:, b], pos[:, c], pos[:, d]
    ab = pb - pa
    c_proj = pa + _bdot(pc - pa, ab) / (_bdot(ab, ab) + 1e-12) * ab
    d_proj = pa + _bdot(pd - pa, ab) / (_bdot(ab, ab) + 1e-12) * ab
    d_shift = pd - d_proj + c_proj
    v1 = d_shift - c_proj
    v2 = pc - c_proj
    cos = _bdot(v1, v2) / (
        jnp.linalg.norm(v1, axis=-1, keepdims=True) * jnp.linalg.norm(v2, axis=-1, keepdims=True) + 1e-12
    )
    cos = jnp.clip(cos, -1 + 1e-5, 1 - 1e-5)
    angle = jnp.arccos(cos)
    sign = jnp.sign(_bdot(jnp.cross(v1, v2), ab))
    return (angle * sign)[..., 0]
