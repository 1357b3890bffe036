"""Rigid-body geometry: rotation representations and batched Kabsch alignment.

JAX re-implementation of the capabilities of the reference's
``utils/geometry.py`` (quaternion/axis-angle/matrix conversions at lines
7-206, Kabsch at 209-276). Everything is shape-polymorphic over leading batch
dims, jittable, and differentiable; the torch implementation's boolean-mask
branches for small angles become ``jnp.where`` selects.
"""

import jax.numpy as jnp


def quaternion_to_matrix(q):
    """Quaternion (real first, [..., 4]) -> rotation matrix [..., 3, 3]."""
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quaternion(v):
    """Rotation vector [..., 3] -> quaternion [..., 4] (real first)."""
    angles = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = 0.5 * angles
    small = jnp.abs(angles) < 1e-6
    # sin(x/2)/x ~= 1/2 - x^2/48 for small x
    sin_half_over = jnp.where(small, 0.5 - angles * angles / 48, jnp.sin(half) / jnp.where(small, 1.0, angles))
    return jnp.concatenate([jnp.cos(half), v * sin_half_over], axis=-1)


def axis_angle_to_matrix(v):
    """Rotation vector [..., 3] -> rotation matrix [..., 3, 3]."""
    return quaternion_to_matrix(axis_angle_to_quaternion(v))


def _sqrt_positive_part(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(m):
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (real first)."""
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [f[..., i] for i in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(quat_candidates, best[..., None, None], axis=-2).squeeze(-2)


def quaternion_to_axis_angle(q):
    """Quaternion [..., 4] -> rotation vector [..., 3]."""
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, q[..., :1])
    angles = 2 * half
    small = jnp.abs(angles) < 1e-6
    sin_half_over = jnp.where(small, 0.5 - angles * angles / 48, jnp.sin(half) / jnp.where(small, 1.0, angles))
    return q[..., 1:] / sin_half_over


def matrix_to_axis_angle(m):
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def rigid_transform_kabsch(A, B, mask=None):
    """Optimal rigid transform aligning point set A onto B (batched).

    A, B: [..., N, 3]; mask: optional [..., N] of valid points. Returns
    (R [..., 3, 3], t [..., 1, 3]) such that A @ R^T + t ~= B in least
    squares, with det(R) = +1 (reflection corrected), matching the
    reference's ``rigid_transform_Kabsch_3D_torch_batch``.
    """
    if mask is None:
        w = jnp.ones(A.shape[:-1], dtype=A.dtype)
    else:
        w = mask.astype(A.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True)[..., None] + 1e-12
    cA = jnp.sum(A * w[..., None], axis=-2, keepdims=True) / wsum
    cB = jnp.sum(B * w[..., None], axis=-2, keepdims=True) / wsum
    Am = (A - cA) * w[..., None]
    Bm = (B - cB) * w[..., None]
    # H = Am^T Bm : [..., 3, 3]
    H = jnp.einsum("...ni,...nj->...ij", Am, Bm, precision='highest')
    U, _, Vt = jnp.linalg.svd(H)
    R = jnp.einsum("...ji,...kj->...ik", Vt, U, precision='highest')  # Vt^T @ U^T
    det = jnp.linalg.det(R)
    # reflection fix: R = (Vt^T @ diag(1, 1, -1)) @ U^T when det(R) < 0
    d = jnp.asarray([1.0, 1.0, -1.0], dtype=A.dtype)
    Rm = jnp.einsum("...ji,j,...kj->...ik", Vt, d, U, precision='highest')
    R = jnp.where(det[..., None, None] < 0, Rm, R)
    t = cB - jnp.einsum("...ij,...kj->...ki", R, cA, precision='highest')
    return R, t


def kabsch_align(A, B, mask=None):
    """Return A rigidly aligned onto B: A @ R^T + t."""
    R, t = rigid_transform_kabsch(A, B, mask)
    return jnp.einsum("...ni,...ji->...nj", A, R, precision='highest') + t


def rigid_transform_independent(A, B, mask=None):
    """Centroid shift + Kabsch rotation vector between two point sets.

    Used by the SVGD particle kernels (reference ``utils/geometry.py:279``).
    Returns (t [..., 3], rotvec [..., 3]).
    """
    if mask is None:
        w = jnp.ones(A.shape[:-1], dtype=A.dtype)
    else:
        w = mask.astype(A.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-12
    cA = jnp.sum(A * w[..., None], axis=-2) / wsum
    cB = jnp.sum(B * w[..., None], axis=-2) / wsum
    R, _ = rigid_transform_kabsch(A, B, mask)
    return cB - cA, matrix_to_axis_angle(R)
