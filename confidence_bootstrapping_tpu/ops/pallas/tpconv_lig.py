"""Merged ligand-side TP-conv kernels (round-2 roadmap item 1).

Per trunk layer the ligand side of the score model runs four edge groups
through many small dispatches + XLA glue (PERF_NOTES: ~7 ms/step):

* dense ligand pairs  (lig <- lig, all-to-all, [B, L, L] masked)
* bond edges          (lig <- lig along covalent bonds, scatter to src)
* cross               (lig <- rec, capped kNN list)        [already fused]
* reversed cross      (rec <- lig, same edge list, scatter to rec nodes)

This module collapses them into TWO pallas calls per layer:

``fused_tpconv_pb``   — pairs + bonds share one weight group (the reference
    uses one edge MLP for the whole ligand radius+bond graph,
    models/score_model.py:529-546); both sub-groups ride ONE row-concatenated
    MXU pipeline.  Senders/receivers come straight from the per-batch ligand
    table in VMEM (a broadcast for the dense pairs, a one-hot matmul gather
    for the bonds), the bond aggregation is a transposed one-hot matmul
    scatter — no [B, L, L, D] sender tensor and no XLA scatter ever exist.

``fused_tpconv_cross_rev`` — the lig<-rec cross group and the rec<-lig
    reversed group share their edge list (and the in-kernel one-hot gather
    from the receptor table): one kernel computes both directions and
    scatters the reversed messages onto the receptor nodes with the
    transposed gather matrix.  Replaces fused_tpconv_cross + msgs_nbr +
    the XLA segment-sum scatter.

The weighted-TP core (static CG matrix G, expand E, reduce R) and the
numeric layout are v3's (tpconv_v3.py); the in-kernel gather conventions
(positions as exact bf16 hi+lo table columns, f32 index compares) are
v4's (tpconv_rec.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpconv import FAN_PAD, LadderSpec, _from_component_major, ladder_spec
from .tpconv_v3 import (
    contribution_matrix_canonical,
    expand_reduce_matrices,
    umajor_layout,
)

SQRT3 = float(np.sqrt(3.0))


def _prep_static(spec: LadderSpec, w2s, b2s, cdtype):
    """Shared static preprocessing: per-group padded w2/b2 (as LISTS — a
    stacked [G, ...] ref indexed in-kernel lowers to an unsupported Mosaic
    gather), the canonical G and the concatenated E/R constants."""
    idx, scale, padded_numel, ofs_pads, numels_pad = umajor_layout(spec)
    safe_idx = jnp.asarray(np.maximum(idx, 0))
    keep_scale = jnp.asarray((idx >= 0).astype(np.float32) * scale)
    w2p = [(w2[:, safe_idx] * keep_scale[None, :]).astype(cdtype) for w2 in w2s]
    b2p = [(b2[safe_idx] * keep_scale).astype(jnp.float32) for b2 in b2s]

    G, stripe_of = contribution_matrix_canonical(spec)
    Gj = jnp.asarray(G, dtype=cdtype)
    Es, Rs = expand_reduce_matrices(spec)
    e_ofs, r_ofs, acc = [], [], 0
    for g in range(4):
        e_ofs.append(acc)
        r_ofs.append(acc)
        if Es[g] is not None:
            acc += Es[g].shape[1]
    Ej = jnp.asarray(np.concatenate([E for E in Es if E is not None], axis=1), dtype=cdtype)
    Rj = jnp.asarray(np.concatenate([R for R in Rs if R is not None], axis=0), dtype=cdtype)
    return w2p, b2p, Gj, Ej, Rj, stripe_of, tuple(ofs_pads), tuple(numels_pad), tuple(e_ofs), tuple(r_ofs)


def _node_table(attr, pos, cdtype):
    hi = pos.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (pos - hi).astype(jnp.bfloat16)
    return jnp.concatenate([attr.astype(cdtype), hi.astype(cdtype), lo.astype(cdtype)], axis=-1)


def _make_pipeline(spec, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs, cdtype, prec):
    """Returns pipeline(h, xa, w2, b2, rows) -> list of [rows, mul] parts in
    component-major column order (the shared G/E/R weighted-TP core)."""

    def pipeline(h, xa, w2, b2, rows, g_ref, e_ref, r_ref):
        cfull = jnp.dot(xa, g_ref[:], preferred_element_type=jnp.float32, precision=prec).astype(cdtype)
        parts = []
        for g, ncomp in ((0, 1), (1, 3), (2, 3), (3, 1)):
            mul = spec.out_muls[g]
            if mul == 0:
                continue
            n = numels_pad[g]
            w_g = jnp.dot(h, w2[:, ofs_pads[g] : ofs_pads[g] + n], preferred_element_type=jnp.float32, precision=prec)
            w_g = (w_g + b2[ofs_pads[g] : ofs_pads[g] + n]).astype(cdtype)
            E = e_ref[:, e_ofs[g] : e_ofs[g] + n]
            R = r_ref[r_ofs[g] : r_ofs[g] + n, :]
            cps = []
            for ci in range(ncomp):
                s = int(stripe_of[g, ci])
                cps.append(cfull[:, s * FAN_PAD : (s + 1) * FAN_PAD])
            cp = jnp.concatenate(cps, axis=0) if ncomp > 1 else cps[0]
            cexp = jnp.dot(cp, E, preferred_element_type=jnp.float32, precision=prec).astype(cdtype)
            wz = jnp.concatenate([w_g] * ncomp, axis=0) if ncomp > 1 else w_g
            z = (wz * cexp).astype(cdtype)
            outg = jnp.dot(z, R, preferred_element_type=jnp.float32, precision=prec)
            for ci in range(ncomp):
                parts.append((outg[ci * rows : (ci + 1) * rows, :mul], mul))
        return parts

    return pipeline


# --------------------------------------------------------------------- #
# pairs + bonds (the ligand<-ligand group)
# --------------------------------------------------------------------- #


def _kernel_pb(pair_emb_ref, pair_mask_ref, bsrc_ref, bdst_ref, bond_emb_ref, bond_mask_ref,
               lig_ref, w1e_ref, w1r_ref, w1s_ref, b1_ref, w2_ref, b2_ref, g_ref, e_ref, r_ref,
               out_ref, *, spec: LadderSpec, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs,
               ns: int, tile_l: int, cdtype):
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else jax.lax.Precision.DEFAULT
    L = lig_ref.shape[1]
    E = bsrc_ref.shape[1]
    T1 = tile_l * L
    T = T1 + E
    l_idx = pl.program_id(1)

    pmask = pair_mask_ref[0].reshape(T1, 1)
    # bonds whose receiver (src) falls in this receiver tile
    bsrc = bsrc_ref[0]  # [E, 1] f32
    lo = (l_idx * tile_l).astype(jnp.float32)
    in_tile = (bsrc >= lo) & (bsrc < lo + float(tile_l))
    bmask = bond_mask_ref[0] * in_tile.astype(jnp.float32)  # [E, 1]
    tile_valid = (jnp.sum(pmask) + jnp.sum(bmask)) > 0.0

    @pl.when(jnp.logical_not(tile_valid))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid)
    def _():
        lig_tab = lig_ref[0]  # [L, Dl+6]
        Dl = lig_tab.shape[1] - 6
        ligf = lig_tab[:, :Dl]
        lpos = lig_tab[:, Dl : Dl + 3].astype(jnp.float32) + lig_tab[:, Dl + 3 :].astype(jnp.float32)  # [L, 3]
        rposf = lig_ref[0, pl.ds(l_idx * tile_l, tile_l), :].astype(jnp.float32)
        rpos = rposf[:, Dl : Dl + 3] + rposf[:, Dl + 3 :]  # [tile_l, 3]

        # ---- dense pairs: receiver tile x all senders, no gathers at all
        vec_p = (jnp.broadcast_to(lpos[None, :, :], (tile_l, L, 3))
                 - jnp.broadcast_to(rpos[:, None, :], (tile_l, L, 3))).reshape(T1, 3)
        srow_p = jnp.broadcast_to(ligf[None, :, :], (tile_l, L, Dl)).reshape(T1, Dl)

        # ---- bonds: receiver = src, sender = dst, gathered via one-hot
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (E, L), 1).astype(jnp.float32)
        oh_src = (iota_l == bsrc).astype(cdtype)  # [E, L]
        oh_dst = (iota_l == bdst_ref[0]).astype(cdtype)
        srcf = jnp.dot(oh_src, lig_tab, preferred_element_type=jnp.float32, precision=prec)  # [E, Dl+6]
        dstf = jnp.dot(oh_dst, lig_tab, preferred_element_type=jnp.float32, precision=prec)
        spos_b = dstf[:, Dl : Dl + 3] + dstf[:, Dl + 3 :]
        rpos_b = srcf[:, Dl : Dl + 3] + srcf[:, Dl + 3 :]
        vec_b = spos_b - rpos_b
        srow_b = dstf[:, :Dl].astype(cdtype)

        vec = jnp.concatenate([vec_p, vec_b], axis=0)  # [T, 3]
        d2 = jnp.maximum(jnp.sum(vec * vec, axis=1, keepdims=True), 1e-12)
        sh1 = (vec * jax.lax.rsqrt(d2) * SQRT3).astype(cdtype)
        srow = jnp.concatenate([srow_p, srow_b], axis=0)  # [T, Dl]

        # ---- edge MLP hidden layer: emb/receiver/sender row-blocks
        # (receiver term from the Ref-sliced receiver tile — Mosaic has no
        # dynamic_slice on values, PERF_NOTES pitfall)
        hs_all = jnp.dot(ligf[:, :ns], w1s_ref[:], preferred_element_type=jnp.float32, precision=prec)  # [L, H]
        hr_tile = jnp.dot(rposf[:, :ns].astype(cdtype), w1r_ref[:], preferred_element_type=jnp.float32, precision=prec)
        H = hs_all.shape[-1]
        h_p = jnp.dot(pair_emb_ref[0].reshape(T1, ns).astype(cdtype), w1e_ref[:],
                      preferred_element_type=jnp.float32, precision=prec)
        h_p = h_p + jnp.broadcast_to(hr_tile[:, None, :], (tile_l, L, H)).reshape(T1, H)
        h_p = h_p + jnp.broadcast_to(hs_all[None, :, :], (tile_l, L, H)).reshape(T1, H)
        h_b = jnp.dot(bond_emb_ref[0].astype(cdtype), w1e_ref[:], preferred_element_type=jnp.float32, precision=prec)
        h_b = h_b + jnp.dot(srcf[:, :ns].astype(cdtype), w1r_ref[:], preferred_element_type=jnp.float32, precision=prec)
        h_b = h_b + jnp.dot(srow_b[:, :ns], w1s_ref[:], preferred_element_type=jnp.float32, precision=prec)
        h = jnp.maximum(jnp.concatenate([h_p, h_b], axis=0) + b1_ref[:], 0.0).astype(cdtype)

        xa = jnp.concatenate([srow, srow * sh1[:, 0:1], srow * sh1[:, 1:2], srow * sh1[:, 2:3]], axis=1)
        pipeline = _make_pipeline(spec, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs, cdtype, prec)
        parts = pipeline(h, xa, w2_ref[:], b2_ref[:], T, g_ref, e_ref, r_ref)

        outs = []
        # tile-local receiver one-hot built directly (no value slicing)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (E, tile_l), 1).astype(jnp.float32) + lo
        oh_src_t = (iota_t == bsrc).astype(jnp.float32)  # [E, tile_l]
        for part, mul in parts:
            p_pair = jnp.sum((part[:T1] * pmask).reshape(tile_l, L, mul), axis=1)
            p_bond = jax.lax.dot_general(
                oh_src_t, part[T1:] * bmask,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=prec,
            )
            outs.append(p_pair + p_bond)
        out_ref[0] = jnp.concatenate(outs, axis=1)


def fused_tpconv_pb(
    lig_attr,  # [B, L, Dl] canonical irreps layout
    lig_pos,  # [B, L, 3] float32
    pair_emb,  # [B, L, L, ns] embedded dense-pair edge features (sigma incl.)
    pair_mask,  # [B, L, L] bool (self-pairs already excluded)
    bond_src,  # [B, E] int32 receiver atom of each bond edge
    bond_dst,  # [B, E] int32 sender atom
    bond_emb,  # [B, E, ns]
    bond_mask,  # [B, E] bool
    w1, b1, w2, b2,  # the ligand group's edge MLP; w1 rows = [ns | ns | ns]
    irreps_in: str,
    irreps_out: str,
    ns: int,
    interpret: bool = False,
    use_bf16: bool = True,
):
    """Summed ligand<-ligand messages [B, L, Dout]: dense pairs + bond edges
    through one row-concatenated MXU pipeline per receiver tile. Semantics
    match the XLA path in score_model._lig_conv (pair conv_nbr + bond
    messages + scatter_mean numerators). Masked edges contribute zero."""
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    spec = ladder_spec(irreps_in, irreps_out)
    assert spec is not None
    B, L, Dl = lig_attr.shape
    E = bond_src.shape[1]
    assert w1.shape[0] == 3 * ns

    (w2p, b2p, Gj, Ej, Rj, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs) = _prep_static(
        spec, [w2], [b2], cdtype
    )
    lig_tab = _node_table(lig_attr, lig_pos, cdtype)

    # receiver tile: keep tile_l*L + E near the validated ~768-row budget.
    # Mosaic requires the output block's sublane dim (tile_l) to be a
    # multiple of 8 or the full L, so candidates are L itself plus the
    # multiples of 8 that divide L (a plain halving loop picked 12 at
    # L=48, which Mosaic rejects: not %8 and != L).
    cands = [L] + [t for t in range(L - L % 8, 7, -8) if L % t == 0]
    tile_l = next((t for t in cands if t * L + E <= 768), cands[-1])
    assert L % tile_l == 0 and (tile_l == L or tile_l % 8 == 0), (L, tile_l)

    w1e = w1[:ns].astype(cdtype)
    w1r = w1[ns : 2 * ns].astype(cdtype)
    w1s = w1[2 * ns :].astype(cdtype)

    kernel = functools.partial(
        _kernel_pb, spec=spec, stripe_of=stripe_of, ofs_pads=ofs_pads,
        numels_pad=numels_pad, e_ofs=e_ofs, r_ofs=r_ofs,
        ns=ns, tile_l=tile_l, cdtype=cdtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, L // tile_l),
        in_specs=[
            pl.BlockSpec((1, tile_l, L, ns), lambda b, l: (b, l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_l, L, 1), lambda b, l: (b, l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, 1), lambda b, l: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, 1), lambda b, l: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, ns), lambda b, l: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, 1), lambda b, l: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dl + 6), lambda b, l: (b, 0, 0), memory_space=pltpu.VMEM),
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
        out_specs=pl.BlockSpec((1, tile_l, spec.out_dim), lambda b, l: (b, l, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, spec.out_dim), jnp.float32),
        interpret=interpret,
    )(
        pair_emb.astype(cdtype), pair_mask.astype(jnp.float32)[..., None],
        bond_src.astype(jnp.float32)[..., None], bond_dst.astype(jnp.float32)[..., None],
        bond_emb.astype(cdtype), bond_mask.astype(jnp.float32)[..., None],
        lig_tab, w1e, w1r, w1s, b1, w2p[0], b2p[0], Gj, Ej, Rj,
    )
    return _from_component_major(out, spec.out_muls)


# --------------------------------------------------------------------- #
# cross + reversed cross (lig <- rec and rec <- lig on the same edge list)
# --------------------------------------------------------------------- #


def _kernel_cross_rev(idx_ref, emb_ref, mask_ref, recv_ref, src_ref,
                      w1e_f, w1r_f, w1s_f, b1_f, w2_f, b2_f, g_ref, e_ref, r_ref,
                      *rest, spec: LadderSpec, stripe_of, ofs_pads, numels_pad,
                      e_ofs, r_ofs, ns: int, cdtype, with_rev: bool):
    # rev-group weights ride as six extra refs (a stacked [2, ...] ref
    # indexed in-kernel lowers to an unsupported Mosaic gather)
    if with_rev:
        (w1e_r, w1r_r, w1s_r, b1_r, w2_r, b2_r, out_ref, out_rec_ref) = rest
    else:
        (out_ref,) = rest
        out_rec_ref = None
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else jax.lax.Precision.DEFAULT
    N = src_ref.shape[1]
    L = recv_ref.shape[1]
    K = idx_ref.shape[2]
    T = L * K

    mask = mask_ref[0].reshape(T, 1)
    tile_valid = jnp.sum(mask) > 0.0

    @pl.when(jnp.logical_not(tile_valid))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        if with_rev:
            out_rec_ref[:] = jnp.zeros_like(out_rec_ref)

    @pl.when(tile_valid)
    def _():
        src_tab = src_ref[0]  # [N, Dr+6]
        Dr = src_tab.shape[1] - 6
        recvf = recv_ref[0].astype(jnp.float32)  # [L, Dl+6]
        Dl = recvf.shape[1] - 6

        idx = idx_ref[0].reshape(T, 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1).astype(jnp.float32)
        onehot = (iota == idx).astype(cdtype)  # [T, N] — shared by gather AND the reverse scatter

        gath = jnp.dot(onehot, src_tab, preferred_element_type=jnp.float32, precision=prec)
        sender = gath[:, :Dr].astype(cdtype)
        spos = gath[:, Dr : Dr + 3] + gath[:, Dr + 3 :]
        rpos_l = recvf[:, Dl : Dl + 3] + recvf[:, Dl + 3 :]
        vec = spos - jnp.broadcast_to(rpos_l[:, None, :], (L, K, 3)).reshape(T, 3)
        d2 = jnp.maximum(jnp.sum(vec * vec, axis=1, keepdims=True), 1e-12)
        sh1 = (vec * jax.lax.rsqrt(d2) * SQRT3).astype(cdtype)

        emb = emb_ref[0].reshape(T, emb_ref.shape[-1]).astype(cdtype)
        pipeline = _make_pipeline(spec, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs, cdtype, prec)

        # ---- forward direction: lig <- rec
        h = jnp.dot(emb, w1e_f[:], preferred_element_type=jnp.float32, precision=prec)
        hr = jnp.dot(recvf[:, :ns].astype(cdtype), w1r_f[:], preferred_element_type=jnp.float32, precision=prec)
        h = h + jnp.broadcast_to(hr[:, None, :], (L, K, hr.shape[-1])).reshape(T, hr.shape[-1])
        h = h + jnp.dot(sender[:, :ns], w1s_f[:], preferred_element_type=jnp.float32, precision=prec)
        h = jnp.maximum(h + b1_f[:], 0.0).astype(cdtype)
        xa = jnp.concatenate([sender, sender * sh1[:, 0:1], sender * sh1[:, 1:2], sender * sh1[:, 2:3]], axis=1)
        parts = pipeline(h, xa, w2_f[:], b2_f[:], T, g_ref, e_ref, r_ref)
        out_ref[0] = jnp.concatenate(
            [jnp.sum((part * mask).reshape(L, K, mul), axis=1) for part, mul in parts], axis=1
        )

        if with_rev:
            # ---- reversed direction: rec <- lig (weight group 1); the
            # receiver is the gathered rec node, the sender the lig atom,
            # sh flips sign (l=1 is odd), the scatter is onehot^T.
            # Row-repeat of the lig features via a one-hot matmul — the
            # broadcast-of-a-slice form lowers to an unsupported Mosaic
            # gather; the matmul copies bf16 table values exactly. The
            # repeat matrix comes from a lane-preserving 3D iota compare
            # (a (L,K)->(T,1) iota reshape is an unsupported shape cast).
            rep = (
                jax.lax.broadcasted_iota(jnp.int32, (L, K, L), 2)
                == jax.lax.broadcasted_iota(jnp.int32, (L, K, L), 0)
            ).astype(cdtype).reshape(T, L)  # [T, L], one 1.0 per row
            lrow = jnp.dot(rep, recv_ref[0][:, :Dl], preferred_element_type=jnp.float32,
                           precision=prec).astype(cdtype)
            h2 = jnp.dot(emb, w1e_r[:], preferred_element_type=jnp.float32, precision=prec)
            h2 = h2 + jnp.dot(sender[:, :ns], w1r_r[:], preferred_element_type=jnp.float32, precision=prec)
            hs = jnp.dot(recvf[:, :ns].astype(cdtype), w1s_r[:], preferred_element_type=jnp.float32, precision=prec)
            h2 = h2 + jnp.broadcast_to(hs[:, None, :], (L, K, hs.shape[-1])).reshape(T, hs.shape[-1])
            h2 = jnp.maximum(h2 + b1_r[:], 0.0).astype(cdtype)
            nsh = -sh1
            xa2 = jnp.concatenate([lrow, lrow * nsh[:, 0:1], lrow * nsh[:, 1:2], lrow * nsh[:, 2:3]], axis=1)
            parts2 = pipeline(h2, xa2, w2_r[:], b2_r[:], T, g_ref, e_ref, r_ref)
            outs = []
            for part, mul in parts2:
                outs.append(
                    jax.lax.dot_general(
                        onehot.astype(jnp.float32), part * mask,
                        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=prec,
                    )
                )
            out_rec_ref[0] = jnp.concatenate(outs, axis=1)


def fused_tpconv_cross_rev(
    recv_attr,  # [B, L, Dl] ligand receivers (canonical irreps layout)
    recv_pos,  # [B, L, 3]
    src_attr,  # [B, N, Dr] receptor table
    src_pos,  # [B, N, 3]
    idx,  # [B, L, K] int32 receptor indices
    edge_emb,  # [B, L, K, ns] embedded cross-edge features (sigma included)
    mask,  # [B, L, K] bool
    w1_f, b1_f, w2_f, b2_f,  # forward (lig<-rec) edge MLP
    w1_r, b1_r, w2_r, b2_r,  # reversed (rec<-lig) edge MLP; None to skip
    irreps_in: str,
    irreps_out: str,
    ns: int,
    interpret: bool = False,
    use_bf16: bool = True,
):
    """(lig_sum [B, L, Dout], rec_sum [B, N, Dout] or None): both directions
    of the capped cross edge list in one kernel, sharing the one-hot gather.
    Semantics match fused_tpconv_cross plus msgs_nbr + scatter-sum of the
    reversed messages (score_model.py trunk, reference
    models/score_model.py:564-587 cross conv + the rec<-lig group)."""
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    spec = ladder_spec(irreps_in, irreps_out)
    assert spec is not None
    B, L, Dl = recv_attr.shape
    N = src_attr.shape[1]
    K = idx.shape[2]
    with_rev = w1_r is not None
    assert w1_f.shape[0] == 3 * ns

    w2s = [w2_f, w2_r] if with_rev else [w2_f]
    b2s = [b2_f, b2_r] if with_rev else [b2_f]
    (w2p, b2p, Gj, Ej, Rj, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs) = _prep_static(
        spec, w2s, b2s, cdtype
    )
    def split_w1(w1, b1):
        return (
            w1[:ns].astype(cdtype), w1[ns : 2 * ns].astype(cdtype),
            w1[2 * ns :].astype(cdtype), b1.astype(jnp.float32),
        )

    fwd_w = split_w1(w1_f, b1_f) + (w2p[0], b2p[0])
    rev_w = (split_w1(w1_r, b1_r) + (w2p[1], b2p[1])) if with_rev else ()

    src_tab = _node_table(src_attr, src_pos, cdtype)
    recv_tab = _node_table(recv_attr, recv_pos, cdtype)

    kernel = functools.partial(
        _kernel_cross_rev, spec=spec, stripe_of=stripe_of, ofs_pads=ofs_pads,
        numels_pad=numels_pad, e_ofs=e_ofs, r_ofs=r_ofs,
        ns=ns, cdtype=cdtype, with_rev=with_rev,
    )
    out_shapes = [jax.ShapeDtypeStruct((B, L, spec.out_dim), jnp.float32)]
    out_specs = [pl.BlockSpec((1, L, spec.out_dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    if with_rev:
        out_shapes.append(jax.ShapeDtypeStruct((B, N, spec.out_dim), jnp.float32))
        out_specs.append(pl.BlockSpec((1, N, spec.out_dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM))

    n_weight_refs = 9 + len(rev_w)  # fwd 6 + G/E/R 3 + rev 6 (if any)
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, K, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, K, edge_emb.shape[-1]), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, K, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dl + 6), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, src_tab.shape[-1]), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_weight_refs,
        out_specs=out_specs if with_rev else out_specs[0],
        out_shape=out_shapes if with_rev else out_shapes[0],
        # both directions' intermediates live on the VMEM stack at once;
        # at bench shapes (L=24, K=48, N=512) that needs ~18.3 MB scoped
        # VMEM — above Mosaic's 16 MB default, well under the 64 MB cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(
        idx.astype(jnp.float32)[..., None], edge_emb.astype(cdtype), mask.astype(jnp.float32)[..., None],
        recv_tab, src_tab,
        *fwd_w, Gj, Ej, Rj, *rev_w,
    )
    if with_rev:
        lig_out, rec_out = outs
        return (
            _from_component_major(lig_out, spec.out_muls),
            _from_component_major(rec_out, spec.out_muls),
        )
    return _from_component_major(outs, spec.out_muls), None
