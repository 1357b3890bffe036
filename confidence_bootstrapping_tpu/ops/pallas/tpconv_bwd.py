"""Pallas BACKWARD kernel for the fused TP-conv training ops.

The hand-derived VJP of the fused (edge MLP -> dropout -> weighted TP) op
is itself TP-shaped (tpconv_train.py module docstring): every stage is a
dense matmul against the same static layout matrices (G, E, R, padded w2)
plus per-edge elementwise work. The chunked-XLA backward materializes the
[T, padded_numel] intermediates (d_z, cexp, d_w) in HBM between matmuls —
exactly the traffic the forward kernel avoids. This kernel keeps the whole
per-edge backward in VMEM, tiled over edges, and accumulates the parameter
gradients across the (sequential) grid in VMEM-resident output blocks:

  per tile of T edges:
    h       = relu(attr @ W1 + b1) [* dmask]       (forward recompute)
    cfull   = [x*sh_0 | ... | x*sh_C] @ G
    per output group g:
      w_g    = h @ W2p_g + b2p_g
      d_z    = pad(g_msg_g) @ R_g^T
      cexp   = stack_c(cfull stripes) @ E_g
      d_w    = sum_c d_z * cexp
      d_cp   = (d_z * stack_c(w_g)) @ E_g^T     -> d_cfull stripes
      dh    += d_w @ W2p_g^T
      dW2p_g += h^T @ d_w;  db2p_g += sum_T d_w     (grid accumulators)
    d_xa    = d_cfull @ G^T
    d_x[b]  = sum_c d_xa[c] * sh[c];  d_sh[c] = <d_xa[c], x>
    dh     *= dmask * (hpre > 0)
    d_attr  = dh @ W1^T
    dW1    += attr^T @ dh;  db1 += sum_T dh         (grid accumulators)

Same bf16-multiply/f32-accumulate policy as the forward kernels; interpret
mode with use_bf16=False runs at Precision.HIGHEST for the CPU parity
tests. Numerical contract and argument layout match
``tpconv_train._edge_bwd_xla`` exactly (pinned by tests/test_tpconv_train).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpconv_g import LANE


def _kernel_bwd(attr_ref, x_ref, sh_ref, g_ref, dm_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, gmat_ref, e_ref, r_ref,
                qrep_ref, qsum_ref,
                da_ref, dx_ref, dsh_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, spec, cdtype, has_dm):
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else jax.lax.Precision.DEFAULT
    T = attr_ref.shape[0]
    Fe = attr_ref.shape[1]
    Din, Dsh = spec.in_dim, spec.sh_dim
    H = w1_ref.shape[1]
    first = pl.program_id(0) == 0

    def dot(a, b):
        return jnp.dot(a.astype(cdtype), b.astype(cdtype),
                       preferred_element_type=jnp.float32, precision=prec)

    attr = attr_ref[:]
    x = x_ref[:]
    sh = sh_ref[:]

    hpre = dot(attr, w1_ref[:]) + b1_ref[:]
    relu = (hpre > 0).astype(jnp.float32)
    h = jnp.maximum(hpre, 0.0)
    if has_dm:
        dm = dm_ref[:].astype(jnp.float32)
        h = h * dm
    xa = jnp.concatenate([x.astype(jnp.float32) * sh[:, b : b + 1].astype(jnp.float32)
                          for b in range(Dsh)], axis=1)
    cfull = dot(xa, gmat_ref[:])

    dh = jnp.zeros((T, H), jnp.float32)
    d_cp_parts = []
    col = 0
    e_ofs = 0
    out_dim = g_ref.shape[1]
    for gi, (_, d3, mul, fan, w_ofs, numel_pad, stripe0) in enumerate(spec.groups):
        w_g = dot(h, w2_ref[:, w_ofs : w_ofs + numel_pad]) + b2_ref[w_ofs : w_ofs + numel_pad]
        # Per-component loop: Mosaic rejects dim-0 concatenation of lane
        # slices whose column offsets differ ("result/input offset mismatch
        # on non-concat dimension"), so instead of row-stacking the d3
        # components into one [d3*T, .] matmul, each component's mul-wide
        # block of g is extracted at lane offset 0 via an exact f32 matmul
        # against an iota-built 0/1 selector, and d_w accumulates over c.
        rows = jax.lax.broadcasted_iota(jnp.int32, (out_dim, LANE), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (out_dim, LANE), 1)
        d_w = jnp.zeros((T, numel_pad), jnp.float32)
        for c in range(d3):
            sel = jnp.logical_and(rows == lanes + (col + c * mul),
                                  lanes < mul).astype(jnp.float32)
            gg_c = jnp.dot(g_ref[:], sel, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # [T, LANE]
            d_z_c = dot(gg_c, r_ref[e_ofs : e_ofs + numel_pad, :].T)  # [T, n]
            cp_c = cfull[:, (stripe0 + c) * LANE : (stripe0 + c + 1) * LANE]
            cexp_c = dot(cp_c, e_ref[:, e_ofs : e_ofs + numel_pad])
            d_w = d_w + d_z_c * cexp_c
            d_cp_parts.append(dot(d_z_c * w_g, e_ref[:, e_ofs : e_ofs + numel_pad].T))
        dh = dh + dot(d_w, w2_ref[:, w_ofs : w_ofs + numel_pad].T)

        dw2_part = dot(h.T, d_w)  # [H, n]
        db2_part = jnp.sum(d_w, axis=0)

        @pl.when(first)
        def _():
            dw2_ref[:, w_ofs : w_ofs + numel_pad] = dw2_part
            db2_ref[0, w_ofs : w_ofs + numel_pad] = db2_part

        @pl.when(jnp.logical_not(first))
        def _():
            dw2_ref[:, w_ofs : w_ofs + numel_pad] += dw2_part
            db2_ref[0, w_ofs : w_ofs + numel_pad] += db2_part

        col += d3 * mul
        e_ofs += numel_pad

    d_cfull = jnp.concatenate(d_cp_parts, axis=1)  # [T, S*128]
    # Mosaic cannot shape-cast the lane dim ([T, Dsh*Din] -> [T, Dsh, Din]),
    # so the per-b reductions are expressed as exact f32 matmuls against the
    # static 0/1 selectors built in edge_bwd_pallas:
    #   dx  = (d_xa * (sh @ Qrep)) @ Qsum       Qrep[b, b*Din+i] = 1
    #   dsh = (d_xa * (x  @ Qsum^T)) @ Qrep^T   Qsum[b*Din+i, i] = 1
    d_xa = dot(d_cfull, gmat_ref[:].T)  # [T, Dsh*Din]
    dot32 = lambda a, b: jnp.dot(a.astype(jnp.float32), b, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    dx_ref[:] = dot32(d_xa * dot32(sh, qrep_ref[:]), qsum_ref[:])
    dsh_ref[:] = dot32(d_xa * dot32(x, qsum_ref[:].T), qrep_ref[:].T)
    if has_dm:
        dh = dh * dm
    dh = dh * relu
    da_ref[:] = dot(dh, w1_ref[:].T)
    dw1_part = dot(attr.T, dh)
    db1_part = jnp.sum(dh, axis=0)

    @pl.when(first)
    def _():
        dw1_ref[:] = dw1_part
        db1_ref[0, :] = db1_part

    @pl.when(jnp.logical_not(first))
    def _():
        dw1_ref[:] += dw1_part
        db1_ref[0, :] += db1_part


def edge_bwd_pallas(spec, a2, x2, s2, g2, dm2, w1, b1, w2p, b2p, Gj, Ej, Rj,
                    use_bf16: bool = True, interpret: bool = False, tile_t: int | None = None):
    """Per-edge backward over flattened edges (same contract as the XLA
    core in tpconv_train): a2 [T, Fe], x2 [T, Din], s2 [T, Dsh], g2
    [T, out_dim_kernel] (mask-applied, kernel order), dm2 None or [T, H'].
    w2p/b2p already in the PADDED layout; Gj/Ej/Rj the layout matrices.
    Returns (d_a2, d_x2, d_s2, dw1, db1, dw2p, db2p) — weight grads in the
    padded domain, f32.
    """
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    T, Fe = a2.shape
    Din, Dsh, H = spec.in_dim, spec.sh_dim, w1.shape[1]
    total_pad = spec.total_pad
    has_dm = dm2 is not None

    if tile_t is None:
        # keep the [tile, padded_numel] intermediates within VMEM budget
        tile_t = 256 if total_pad > 2048 else 512
    pad = (-T) % tile_t
    if pad:
        pz = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        a2, x2, s2, g2 = pz(a2), pz(x2), pz(s2), pz(g2)
        if dm2 is not None:
            dm2 = pz(dm2)
    Tp = T + pad
    if dm2 is None:
        dm2 = jnp.zeros((Tp, 1), cdtype)  # dummy ref (never read)

    # static 0/1 selectors for the lane-blocked d_xa reductions (see kernel)
    qrep = np.zeros((Dsh, Dsh * Din), np.float32)
    for b in range(Dsh):
        qrep[b, b * Din : (b + 1) * Din] = 1.0
    qsum = np.tile(np.eye(Din, dtype=np.float32), (Dsh, 1))

    kernel = functools.partial(_kernel_bwd, spec=spec, cdtype=cdtype, has_dm=has_dm)
    tiled = lambda w: pl.BlockSpec((tile_t, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(Tp // tile_t,),
        in_specs=[
            tiled(Fe), tiled(Din), tiled(Dsh), tiled(spec.out_dim), tiled(dm2.shape[1]),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            tiled(Fe), tiled(Din), tiled(Dsh),
            acc((Fe, H)), acc((1, H)), acc((H, total_pad)), acc((1, total_pad)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Fe), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Din), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Dsh), jnp.float32),
            jax.ShapeDtypeStruct((Fe, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, total_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, total_pad), jnp.float32),
        ],
        interpret=interpret,
    )(
        a2.astype(cdtype), x2.astype(cdtype), s2.astype(cdtype),
        g2.astype(jnp.float32), dm2.astype(cdtype),
        w1.astype(cdtype), b1, w2p.astype(cdtype), b2p,
        Gj.astype(cdtype), Ej.astype(cdtype), Rj.astype(cdtype),
        jnp.asarray(qrep), jnp.asarray(qsum),
    )
    d_a2, d_x2, d_s2, dw1, db1, dw2p, db2p = outs
    return d_a2[:T], d_x2[:T], d_s2[:T], dw1, db1[0], dw2p, db2p[0]
