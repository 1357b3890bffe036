"""Differentiable fused TP-conv for TRAINING (``jax.custom_vjp``).

The reference trains through the very same fused e3nn tensor-product kernels
it infers with (reference ``models/tensor_layers.py:120-217`` — one code path
for train and eval), while rounds 1-3 of this rebuild only fused the
INFERENCE forward: every Pallas kernel was gated on ``deterministic`` and
training fell back to the ~5x-slower XLA broadcast-reduce TP. This module
restores train/infer kernel parity on TPU (VERDICT r3 item 1):

* **Forward**: the generalized Pallas kernel (``tpconv_g`` layout — any
  mul-1 sh irreps, fan-in <= 128) extended with an optional hidden-layer
  dropout mask input, so training forwards are bit-identical in structure to
  inference forwards (same G/E/R static matrices, same bf16 policy).

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
  ([T, padded_numel]) are kept off HBM by scanning over edge chunks.

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


@functools.lru_cache(maxsize=None)
def _make_op(irin: str, irsh: str, irout: str, sum_k: bool, has_dmask: bool, use_bf16: bool, interpret: bool):
    spec, Dout, w_idx, w_scale, inv, perm, G, E, R = _bwd_layout(irin, irsh, irout)
    cd = jnp.bfloat16 if use_bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if use_bf16 else jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((a.ndim - 1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

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
        Din, Dsh, H = spec.in_dim, spec.sh_dim, w1.shape[1]
        T = M * K

        safe_idx = jnp.asarray(np.maximum(w_idx, 0))
        keepscale = jnp.asarray((w_idx >= 0).astype(np.float32) * w_scale)
        w2p = (w2[:, safe_idx] * keepscale[None, :]).astype(cd)
        b2p = b2[safe_idx] * keepscale
        Gj = jnp.asarray(G, dtype=cd)
        Ej = jnp.asarray(E, dtype=cd)
        Rj = jnp.asarray(R, dtype=cd)
        w1cd = w1.astype(cd)

        # per-edge cotangent, kernel column order, zeroed on masked edges
        gk = g[..., jnp.asarray(perm)]
        ge = jnp.broadcast_to(gk[:, None, :], (M, K, spec.out_dim)) if sum_k else gk
        ge = ge * mask[..., None]

        a2 = edge_attr.reshape(T, Fe)
        x2 = sender.reshape(T, Din)
        s2 = sh.reshape(T, Dsh)
        g2 = ge.reshape(T, spec.out_dim)
        dm2 = dmask.reshape(T, dmask.shape[-1]) if has_dmask else None

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

        total_pad = spec.total_pad
        carry0 = (
            jnp.zeros((Fe, H), jnp.float32),
            jnp.zeros((H,), jnp.float32),
            jnp.zeros((H, total_pad), jnp.float32),
            jnp.zeros((total_pad,), jnp.float32),
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

        c = lambda a, ref: a.astype(ref.dtype)
        return (
            c(d_attr2[:T].reshape(M, K, Fe), edge_attr),
            c(d_x2[:T].reshape(M, K, Din), sender),
            c(d_sh2[:T].reshape(M, K, Dsh), sh),
            jnp.zeros_like(mask),
            jnp.zeros_like(dmask),
            c(dw1, w1), c(db1, b1), c(d_w2, w2), c(d_b2, b2),
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
