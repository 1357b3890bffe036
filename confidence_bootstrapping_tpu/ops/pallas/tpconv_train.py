"""Differentiable fused TP-conv for TRAINING (``jax.custom_vjp``).

The reference trains through the very same fused e3nn tensor-product kernels
it infers with (reference ``models/tensor_layers.py:120-217`` — one code path
for train and eval), while rounds 1-3 of this rebuild only fused the
INFERENCE forward: every Pallas kernel was gated on ``deterministic`` and
training fell back to the ~5x-slower XLA broadcast-reduce TP. This module
restores train/infer kernel parity on TPU (VERDICT r3 item 1):

* **Forward**: the generalized Pallas kernels (``tpconv_g`` layout — any
  mul-1 sh irreps, fan-in <= 128). ``fused_tpconv_train`` wraps the
  edge-list kernel extended with an optional hidden-layer dropout mask;
  ``fused_tpconv_rec_train`` wraps the in-kernel-gather kNN kernel
  (``fused_tpconv_rec_g``), so training forwards never materialize the
  [B, N, K, D] sender tensor in HBM either.

* **Backward**: a hand-derived VJP. The weighted TP is bilinear in the
  per-edge contribution stack and the per-edge weights, so the cotangent
  decomposes into TP-shaped contractions against the SAME static matrices:

      d_z     = g @ R^T          (un-reduce the u-contraction)
      d_w     = sum_c d_z * cexp (per-edge TP-weight cotangent)
      d_cexp  = d_z * w
      d_cfull = d_cexp @ E^T     (un-broadcast)
      d_xa    = d_cfull @ G^T    (un-build the CG contributions)
      d_x[b]  = sum_c d_xa[c] * sh[c];  d_sh[c] = <d_xa[c], x>

  plus the standard 2-layer-MLP backward (relu/dropout masks re-derived from
  the saved inputs — one extra MLP1 matmul instead of storing activations).
  Everything lowers to large dense MXU matmuls; per-edge intermediates
  ([T, padded_numel]) are kept off HBM by scanning over edge chunks. The
  rec variant additionally scatters d_sender back to the node table and
  routes d_sh through ``jax.vjp`` of the spherical harmonics to d_pos.

Numerics: with ``use_bf16=False`` (CPU/interpret tests) all dots run at
``Precision.HIGHEST`` and gradients match ``jax.grad`` of the XLA reference
path to float32 tolerance; on TPU the same bf16-multiply/f32-accumulate
policy as the inference kernels applies to both passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..irreps import Irreps
from . import tpconv_g
from .tpconv_g import LANE, _expand_reduce, general_layout

# Edge-chunk length for the scanned backward: [CHUNK, total_padded_numel]
# intermediates stay ~32 MB f32 at the score-trunk layout (total_pad ~4k).
_CHUNK = 2048


@functools.lru_cache(maxsize=None)
def _bwd_layout(irin: str, irsh: str, irout: str):
    """Static backward constants: inverse weight map + f32 layout matrices."""
    spec, w_idx, w_scale, G, Dout = general_layout(irin, irsh, irout)
    inv = np.zeros(spec.weight_numel, dtype=np.int64)
    for c, j in enumerate(w_idx):
        if j >= 0:
            inv[j] = c
    Es, Rs = _expand_reduce(spec)
    E = np.concatenate(Es, axis=1)
    R = np.concatenate(Rs, axis=0)
    perm = np.asarray(spec.out_perm, dtype=np.int64)
    return spec, Dout, w_idx, w_scale, inv, perm, G, E, R


def _edge_bwd(irin: str, irsh: str, irout: str, use_bf16: bool,
              a2, x2, s2, g2, dm2, w1, b1, w2, b2, interpret: bool = False):
    """Shared per-edge backward core over flattened edges.

    a2 [T, Fe] edge features, x2 [T, Din] senders, s2 [T, Dsh] sh, g2
    [T, out_dim_kernel] cotangent in KERNEL column order with the edge mask
    already applied, dm2 None or [T, H'] dropout mask. Returns
    (d_a2, d_x2, d_s2, d_w1, d_b1, d_w2, d_b2) with weight grads mapped back
    to the canonical flat layout.

    Runs the Pallas backward kernel (tpconv_bwd.py) on TPU — the whole
    per-edge backward stays in VMEM — with the chunked-XLA scan as the
    fallback/reference path (CBT_PALLAS_BWD=0 forces it).
    """
    import os

    spec, Dout, w_idx, w_scale, inv, perm, G, E, R = _bwd_layout(irin, irsh, irout)
    cd = jnp.bfloat16 if use_bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if use_bf16 else jax.lax.Precision.HIGHEST
    has_dmask = dm2 is not None

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((a.ndim - 1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

    T, Fe = a2.shape
    Din, Dsh, H = spec.in_dim, spec.sh_dim, w1.shape[1]

    safe_idx = jnp.asarray(np.maximum(w_idx, 0))
    keepscale = jnp.asarray((w_idx >= 0).astype(np.float32) * w_scale)
    w2p = (w2[:, safe_idx] * keepscale[None, :]).astype(cd)
    b2p = b2[safe_idx] * keepscale
    Gj = jnp.asarray(G, dtype=cd)
    Ej = jnp.asarray(E, dtype=cd)
    Rj = jnp.asarray(R, dtype=cd)
    w1cd = w1.astype(cd)

    env = os.environ.get("CBT_PALLAS_BWD", "auto")
    if env != "0" and (interpret or jax.default_backend() == "tpu"):
        from . import tpconv_bwd

        d_a2, d_x2, d_s2, dw1, db1, dw2p, db2p = tpconv_bwd.edge_bwd_pallas(
            spec, a2, x2, s2, g2, dm2, w1, b1, w2p, b2p, Gj, Ej, Rj,
            use_bf16=use_bf16, interpret=interpret,
        )
        inv_j = jnp.asarray(inv)
        scale_j = jnp.asarray(w_scale)
        return (d_a2, d_x2, d_s2, dw1, db1,
                (dw2p * scale_j[None, :])[:, inv_j], (db2p * scale_j)[inv_j])

    chunk = T if T <= 2 * _CHUNK else _CHUNK
    padT = (-T) % chunk
    if padT:
        pz = lambda a: jnp.pad(a, ((0, padT), (0, 0)))
        a2, x2, s2, g2 = pz(a2), pz(x2), pz(s2), pz(g2)
        if dm2 is not None:
            dm2 = pz(dm2)
    nchunk = (T + padT) // chunk

    def chunk_bwd(carry, xs):
        dw1a, db1a, dw2pa, db2pa = carry
        if has_dmask:
            a_c, x_c, s_c, g_c, dm_c = xs
        else:
            a_c, x_c, s_c, g_c = xs
            dm_c = None
        Tc = a_c.shape[0]
        # recompute fwd activations for this chunk (cheaper than saving)
        hpre = dot(a_c, w1cd) + b1
        relu = (hpre > 0).astype(jnp.float32)
        h = jnp.maximum(hpre, 0.0)
        if dm_c is not None:
            h = h * dm_c
        xa = jnp.concatenate([x_c * s_c[:, b : b + 1] for b in range(Dsh)], axis=1)
        cfull = dot(xa, Gj)

        col = 0
        e_ofs = 0
        dh = jnp.zeros((Tc, H), jnp.float32)
        d_cp_parts = []
        for (_, d3, mul, fan, w_ofs, numel_pad, stripe0) in spec.groups:
            w_g = dot(h, w2p[:, w_ofs : w_ofs + numel_pad]) + b2p[w_ofs : w_ofs + numel_pad]
            gg = g_c[:, col : col + d3 * mul].reshape(Tc, d3, mul).transpose(1, 0, 2).reshape(d3 * Tc, mul)
            if mul < LANE:
                gg = jnp.pad(gg, ((0, 0), (0, LANE - mul)))
            d_z = dot(gg, Rj[e_ofs : e_ofs + numel_pad, :].T)  # [d3*Tc, n]
            cp = jnp.concatenate(
                [cfull[:, (stripe0 + c) * LANE : (stripe0 + c + 1) * LANE] for c in range(d3)], axis=0
            )
            cexp = dot(cp, Ej[:, e_ofs : e_ofs + numel_pad])
            d_w = jnp.sum((d_z * cexp).reshape(d3, Tc, numel_pad), axis=0)
            wz = jnp.concatenate([w_g] * d3, axis=0) if d3 > 1 else w_g
            d_cexp = d_z * wz
            d_cp = dot(d_cexp, Ej[:, e_ofs : e_ofs + numel_pad].T)  # [d3*Tc, 128]
            d_cp_parts.append(d_cp.reshape(d3, Tc, LANE).transpose(1, 0, 2).reshape(Tc, d3 * LANE))
            dh = dh + dot(d_w, w2p[:, w_ofs : w_ofs + numel_pad].T)
            dw2pa = dw2pa.at[:, w_ofs : w_ofs + numel_pad].add(dot(h.T, d_w))
            db2pa = db2pa.at[w_ofs : w_ofs + numel_pad].add(jnp.sum(d_w, axis=0))
            col += d3 * mul
            e_ofs += numel_pad

        d_cfull = jnp.concatenate(d_cp_parts, axis=1)  # [Tc, S*128]
        d_xa = dot(d_cfull, Gj.T).reshape(Tc, Dsh, Din)
        d_x = jnp.sum(d_xa * s_c[:, :, None], axis=1)
        d_sh = jnp.sum(d_xa * x_c[:, None, :], axis=2)
        if dm_c is not None:
            dh = dh * dm_c
        dh = dh * relu
        d_attr = dot(dh, w1cd.T)
        dw1a = dw1a + dot(a_c.T, dh)
        db1a = db1a + jnp.sum(dh, axis=0)
        return (dw1a, db1a, dw2pa, db2pa), (d_attr, d_x, d_sh)

    carry0 = (
        jnp.zeros((Fe, H), jnp.float32),
        jnp.zeros((H,), jnp.float32),
        jnp.zeros((H, spec.total_pad), jnp.float32),
        jnp.zeros((spec.total_pad,), jnp.float32),
    )
    if nchunk == 1:
        xs = (a2, x2, s2, g2) + ((dm2,) if has_dmask else ())
        (dw1, db1, dw2p, db2p), (d_attr2, d_x2, d_sh2) = chunk_bwd(carry0, xs)
    else:
        rs = lambda a: a.reshape(nchunk, chunk, a.shape[-1])
        xs = (rs(a2), rs(x2), rs(s2), rs(g2)) + ((rs(dm2),) if has_dmask else ())
        (dw1, db1, dw2p, db2p), (d_attr2, d_x2, d_sh2) = jax.lax.scan(chunk_bwd, carry0, xs)
        d_attr2 = d_attr2.reshape(-1, Fe)
        d_x2 = d_x2.reshape(-1, Din)
        d_sh2 = d_sh2.reshape(-1, Dsh)

    inv_j = jnp.asarray(inv)
    scale_j = jnp.asarray(w_scale)
    d_w2 = (dw2p * scale_j[None, :])[:, inv_j]
    d_b2 = (db2p * scale_j)[inv_j]
    return d_attr2[:T], d_x2[:T], d_sh2[:T], dw1, db1, d_w2, d_b2


def _kernel_cotangent(g, mask, perm, out_dim, sum_k):
    """Canonical cotangent [M(,K),Dout] -> per-edge kernel-order [M,K,outk],
    zeroed on masked edges."""
    M, K = mask.shape
    gk = g[..., jnp.asarray(perm)]
    ge = jnp.broadcast_to(gk[:, None, :], (M, K, out_dim)) if sum_k else gk
    return ge * mask[..., None]


@functools.lru_cache(maxsize=None)
def _make_op(irin: str, irsh: str, irout: str, sum_k: bool, has_dmask: bool, use_bf16: bool, interpret: bool):
    spec, Dout, w_idx, w_scale, inv, perm, G, E, R = _bwd_layout(irin, irsh, irout)

    def fwd_fn(edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2):
        return tpconv_g._call_g(
            edge_attr, sender, sh, mask, w1, b1, w2, b2, irin, irsh, irout,
            None, interpret, sum_k, use_bf16=use_bf16,
            dmask=dmask if has_dmask else None,
        )

    @jax.custom_vjp
    def op(edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2):
        return fwd_fn(edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2)

    def op_fwd(edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2):
        out = fwd_fn(edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2)
        return out, (edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2)

    def op_bwd(res, g):
        edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2 = res
        M, K, Fe = edge_attr.shape
        T = M * K
        ge = _kernel_cotangent(g, mask, perm, spec.out_dim, sum_k)
        d_a2, d_x2, d_s2, d_w1, d_b1, d_w2, d_b2 = _edge_bwd(
            irin, irsh, irout, use_bf16,
            edge_attr.reshape(T, Fe), sender.reshape(T, spec.in_dim),
            sh.reshape(T, spec.sh_dim), ge.reshape(T, spec.out_dim),
            dmask.reshape(T, dmask.shape[-1]) if has_dmask else None,
            w1, b1, w2, b2, interpret=interpret,
        )
        c = lambda a, ref: a.astype(ref.dtype)
        return (
            c(d_a2.reshape(M, K, Fe), edge_attr),
            c(d_x2.reshape(M, K, spec.in_dim), sender),
            c(d_s2.reshape(M, K, spec.sh_dim), sh),
            jnp.zeros_like(mask),
            jnp.zeros_like(dmask),
            c(d_w1, w1), c(d_b1, b1), c(d_w2, w2), c(d_b2, b2),
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_tpconv_train(
    edge_attr, sender, sh, mask, w1, b1, w2, b2,
    irreps_in: str, irreps_sh: str, irreps_out: str,
    *, dmask=None, sum_k: bool = True, use_bf16: bool = True, interpret: bool = False,
):
    """Differentiable fused (edge MLP -> dropout -> weighted TP -> mask ->
    optional K-sum).

    edge_attr [M, K, Fe], sender [M, K, Din], sh [M, K, Dsh], mask [M, K]
    (float or bool), dmask None or [M, K, H'] (H' in {1, H}; values
    {0, 1/keep}). Returns [M, Dout] (sum_k) or [M, K, Dout] canonical
    irreps layout, float32. Gradients flow to edge_attr/sender/sh and the
    MLP parameters; mask and dmask get zero cotangents.
    """
    irin, irsh, irout = str(Irreps(irreps_in)), str(Irreps(irreps_sh)), str(Irreps(irreps_out))
    op = _make_op(irin, irsh, irout, bool(sum_k), dmask is not None, bool(use_bf16), bool(interpret))
    maskf = mask.astype(jnp.float32)
    if dmask is None:
        dmask = jnp.zeros((1, 1, 1), jnp.float32)  # dummy; never read
    return op(edge_attr, sender, sh, maskf, dmask, w1, b1, w2, b2)


# --------------------------------------------------------------------------
# in-kernel-gather kNN variant: training forward without the [B, N, K, D]
# sender materialization (wraps tpconv_g.fused_tpconv_rec_g)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_rec_op(irin: str, irsh: str, irout: str, ns: int, has_dmask: bool, use_bf16: bool, interpret: bool):
    spec, Dout, w_idx, w_scale, inv, perm, G, E, R = _bwd_layout(irin, irsh, irout)
    lmax = {1: 0, 4: 1, 9: 2}[spec.sh_dim]

    def fwd_fn(node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2):
        return tpconv_g.fused_tpconv_rec_g(
            node_attr, pos, nbr, edge_emb, sig, mask, w1, b1, w2, b2,
            irin, irsh, irout, ns, interpret=interpret, use_bf16=use_bf16,
            dmask=dmask if has_dmask else None,
        )

    @jax.custom_vjp
    def op(node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2):
        return fwd_fn(node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2)

    def op_fwd(node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2):
        out = fwd_fn(node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2)
        return out, (node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2)

    def op_bwd(res, g):
        from ..graph_builders import gather_nodes
        from ..irreps import spherical_harmonics

        node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2 = res
        B, N, Din = node_attr.shape
        K = nbr.shape[2]
        Fe = edge_emb.shape[-1]
        T = B * N * K

        # rebuild the per-edge tensors the fused forward never materialized
        sender = gather_nodes(node_attr, nbr)  # [B, N, K, Din]
        spos = gather_nodes(pos, nbr)
        vec = spos - pos[:, :, None, :]
        sh_fn = lambda v: spherical_harmonics(lmax, v)
        sh, sh_vjp = jax.vjp(sh_fn, vec)
        recv_scal = jnp.broadcast_to(node_attr[:, :, None, :ns], (B, N, K, ns))
        eattr = jnp.concatenate(
            [edge_emb + sig[:, None, None, :], recv_scal, sender[..., :ns]], axis=-1)

        ge = _kernel_cotangent(g.reshape(B * N, g.shape[-1]),
                               mask.reshape(B * N, K).astype(jnp.float32),
                               perm, spec.out_dim, True).reshape(T, spec.out_dim)
        d_a2, d_x2, d_s2, d_w1, d_b1, d_w2, d_b2 = _edge_bwd(
            irin, irsh, irout, use_bf16,
            eattr.reshape(T, Fe + 2 * ns), sender.reshape(T, Din),
            sh.reshape(T, spec.sh_dim), ge,
            dmask.reshape(T, dmask.shape[-1]) if has_dmask else None,
            w1, b1, w2, b2, interpret=interpret,
        )
        d_eattr = d_a2.reshape(B, N, K, Fe + 2 * ns)
        d_sender = d_x2.reshape(B, N, K, Din)
        d_sh = d_s2.reshape(B, N, K, spec.sh_dim)

        d_edge_emb = d_eattr[..., :Fe]
        d_sig = jnp.sum(d_edge_emb, axis=(1, 2))
        d_recv_scal = jnp.sum(d_eattr[..., Fe : Fe + ns], axis=2)  # [B, N, ns]
        d_sender = d_sender.at[..., :ns].add(d_eattr[..., Fe + ns :])

        # scatter d_sender back to the node table (per batch)
        def scat(nb, ds):
            return jnp.zeros((N, Din), ds.dtype).at[nb.reshape(-1)].add(ds.reshape(-1, Din))

        d_node = jax.vmap(scat)(nbr, d_sender)
        d_node = d_node.at[..., :ns].add(d_recv_scal)

        # positions: through the spherical harmonics only
        (d_vec,) = sh_vjp(d_sh.astype(sh.dtype))

        def scat3(nb, dv):
            return jnp.zeros((N, 3), dv.dtype).at[nb.reshape(-1)].add(dv.reshape(-1, 3))

        d_pos = jax.vmap(scat3)(nbr, d_vec) - jnp.sum(d_vec, axis=2)

        c = lambda a, ref: a.astype(ref.dtype)
        return (
            c(d_node, node_attr), c(d_pos, pos), jnp.zeros_like(nbr),
            c(d_edge_emb, edge_emb), c(d_sig, sig), jnp.zeros_like(mask),
            jnp.zeros_like(dmask),
            c(d_w1, w1), c(d_b1, b1), c(d_w2, w2), c(d_b2, b2),
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_tpconv_rec_train(
    node_attr, pos, nbr, edge_emb, sig, mask, w1, b1, w2, b2,
    irreps_in: str, irreps_sh: str, irreps_out: str, ns: int,
    *, dmask=None, use_bf16: bool = True, interpret: bool = False,
):
    """Differentiable in-kernel-gather kNN conv (senders == receivers, the
    receptor/atom trunk groups): message sums [B, N, Dout]. Forward is the
    fused gather kernel (no [B, N, K, D] sender in HBM); backward rebuilds
    the per-edge tensors in XLA, runs the shared chunked TP backward, and
    scatter-adds to the node table. Gradients flow to node_attr, pos (via
    the sh jacobian), edge_emb, sig and the MLP params; nbr/mask/dmask get
    zeros. dmask: optional [B, N, K, H'] hidden dropout mask ({0, 1/keep}).
    """
    irin, irsh, irout = str(Irreps(irreps_in)), str(Irreps(irreps_sh)), str(Irreps(irreps_out))
    op = _make_rec_op(irin, irsh, irout, int(ns), dmask is not None, bool(use_bf16), bool(interpret))
    if dmask is None:
        dmask = jnp.zeros((1, 1, 1, 1), jnp.float32)  # dummy; never read
    return op(node_attr, pos, nbr, edge_emb, sig, mask.astype(jnp.float32), dmask, w1, b1, w2, b2)
