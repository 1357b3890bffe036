"""Device-side neighbor search: fixed-capacity padded neighbor lists.

TPU-native replacement for ``torch_cluster.radius/radius_graph/knn_graph``
(used per forward in the reference, ``models/score_model.py:502,568-573,655``):
distances are computed as dense masked matrices inside the jitted forward and
capped neighbor lists are selected with ``lax.top_k``. Exact whenever the
true neighbor count fits the capacity; overflow is detectable via
``count_overflow``.
"""

import jax
import jax.numpy as jnp

_BIG = 1e9


def pairwise_dist(a, b):
    """a: [..., M, 3], b: [..., N, 3] -> [..., M, N] Euclidean distances."""
    d2 = jnp.sum((a[..., :, None, :] - b[..., None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def radius_mask(a, b, cutoff, a_mask, b_mask, exclude_self=False):
    """Dense adjacency: True where |a_i - b_j| < cutoff and both valid.

    cutoff may be scalar or broadcastable to [..., 1, 1] (per-graph dynamic
    cutoffs, the reference's ``dynamic_max_cross``).
    """
    d = pairwise_dist(a, b)
    m = (d < cutoff) & a_mask[..., :, None] & b_mask[..., None, :]
    if exclude_self:
        eye = jnp.eye(a.shape[-2], b.shape[-2], dtype=bool)
        m = m & ~eye
    return m, d


def topk_neighbors(a, b, cutoff, a_mask, b_mask, k, exclude_self=False):
    """For each a_i: up to k nearest b_j within cutoff.

    Returns (idx [..., M, k], mask [..., M, k], dist [..., M, k]).
    Exact radius semantics when the true in-cutoff count <= k.
    """
    m, d = radius_mask(a, b, cutoff, a_mask, b_mask, exclude_self)
    d_masked = jnp.where(m, d, _BIG)
    neg, idx = jax.lax.top_k(-d_masked, k)  # nearest first
    dist = -neg
    mask = dist < _BIG / 2
    return idx, mask, dist


def count_overflow(a, b, cutoff, a_mask, b_mask, k, exclude_self=False):
    """Number of (i) rows whose true neighbor count exceeds capacity k."""
    m, _ = radius_mask(a, b, cutoff, a_mask, b_mask, exclude_self)
    return jnp.sum(jnp.sum(m, axis=-1) > k)


def gather_nodes(x, idx):
    """x: [B, N, D], idx: [B, ..., K] int -> [B, ..., K, D]."""
    B = x.shape[0]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(x, flat[..., None], axis=1)
    return out.reshape(idx.shape + (x.shape[-1],))


def scatter_mean_to_nodes(values, idx, mask, num_nodes):
    """Segment-sum messages onto nodes; returns (sums [B,N,D], counts [B,N]).

    values: [B, M, D] messages, idx: [B, M] destination node, mask: [B, M].
    """
    B, M, D = values.shape
    base = (jnp.arange(B) * num_nodes)[:, None]
    flat_idx = jnp.where(mask, idx, 0) + base  # masked entries scatter to slot 0 with zero value
    v = jnp.where(mask[..., None], values, 0.0).reshape(B * M, D)
    sums = jax.ops.segment_sum(v, flat_idx.reshape(-1), num_segments=B * num_nodes)
    cnts = jax.ops.segment_sum(mask.astype(values.dtype).reshape(-1), flat_idx.reshape(-1), num_segments=B * num_nodes)
    return sums.reshape(B, num_nodes, D), cnts.reshape(B, num_nodes)


def scatter_count_to_nodes(idx, mask, num_nodes):
    """Count-only companion of scatter_mean_to_nodes: [B, N] float counts.
    Used when the message sums themselves are produced in-kernel (the fused
    ligand-side kernels) and only the mean denominators remain host-side."""
    B, M = idx.shape
    base = (jnp.arange(B) * num_nodes)[:, None]
    flat_idx = jnp.where(mask, idx, 0) + base
    cnts = jax.ops.segment_sum(mask.astype(jnp.float32).reshape(-1), flat_idx.reshape(-1), num_segments=B * num_nodes)
    return cnts.reshape(B, num_nodes)
