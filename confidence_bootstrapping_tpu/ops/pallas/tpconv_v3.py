"""Fused TP-conv kernel, v3: all stages on the MXU, no stripe padding.

v1/v2 stored per-edge TP weights as one-channel-per-128-lane stripes so the
u-contraction could be a VPU lane reduction; measured cost at bench shapes
(393k rec edges): ~9 ms for the 3.9x-padded weight matmul + ~14 ms for the
VPU multiply+lane-reduce — both scale with the padding.

v3 keeps the weights in the CANONICAL u-major layout (col = u*mul + v,
padded per group to a 128 multiple — 1920 vs 6400 columns for the score
trunk), and restructures the weighted contraction as three MXU matmuls
with static 0/1 matrices:

  c      = [x, x*sh_x, x*sh_y, x*sh_z] @ G     (CG contributions, v2)
  cexp   = c @ E        E[u, u*mul+v] = 1      (broadcast u over channels)
  z      = w * cexp                            (the only per-edge VPU stage)
  out    = z @ R        R[u*mul+v, v] = 1      (u-contraction)

The three components of l=1 output groups are row-stacked into single
[3T, .] matmuls. Everything else (grid, whole-tile skip, K-sum scratch,
bf16 casts hoisted to the host) matches v2. Same API/semantics as
tpconv.fused_tpconv_nbr / fused_tpconv_msgs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpconv import (
    FAN_PAD,
    LadderSpec,
    _from_component_major,
    _path_constants,
    _to_component_major,
    ladder_spec,
)


def _cm_offsets(muls):
    """Column offsets of the component-major blocks: x0e, x1o[c], x1e[c], x0o."""
    i0e, i1o, i1e, i0o = muls
    ofs = {"0e": 0}
    ofs["1o"] = [i0e + c * i1o for c in range(3)]
    ofs["1e"] = [i0e + 3 * i1o + c * i1e for c in range(3)]
    ofs["0o"] = i0e + 3 * i1o + 3 * i1e
    return ofs


@functools.lru_cache(maxsize=None)
def contribution_matrix(spec: LadderSpec):
    """Static matrix G s.t. ``[x, x*sh_x, x*sh_y, x*sh_z] @ G`` equals the
    per-edge TP contribution stacks of v1's ``_tp_contributions``, laid out
    as one 128-lane stripe per (output group, l-component):

        stripe order: 0e | 1o_x 1o_y 1o_z | 1e_x 1e_y 1e_z | 0o
        lanes within a stripe: the group's fan-in contributions in v1 order.

    Returns (G [4*in_dim, n_stripes*128] float32, stripe index per
    (group, component) or -1 when the group is absent).
    """
    k = _path_constants()
    i0e, i1o, i1e, i0o = spec.in_muls
    cm = _cm_offsets(spec.in_muls)
    D = spec.in_dim

    stripes = []  # (group, component) in layout order
    stripe_of = -np.ones((4, 3), dtype=np.int64)
    for g, ncomp in ((0, 1), (1, 3), (2, 3), (3, 1)):
        if spec.out_muls[g] == 0:
            continue
        for c in range(ncomp):
            stripe_of[g, c] = len(stripes)
            stripes.append((g, c))
    S = len(stripes)
    G = np.zeros((4 * D, S * FAN_PAD), dtype=np.float32)

    def put(b, col_in, stripe, lane, val):
        # b: 0 = constant term, 1..3 = sh l=1 component multiplier
        G[b * D + col_in, stripe * FAN_PAD + lane] += val

    s110, s111 = k["s_110"], k["s_111"]
    s011, s101, s000 = k["s_011"], k["s_101"], k["s_000"]

    for g, c in stripes:
        s = stripe_of[g, c]
        lane = 0
        if g == 0:  # -> 0e: [x0e * s000, dot(x1o, sh; s110)]
            for u in range(i0e):
                put(0, cm["0e"] + u, s, lane + u, float(s000))
            lane += i0e
            for m in range(i1o):
                for a in range(3):
                    for b in range(3):
                        if abs(s110[a, b]) > 1e-12:
                            put(1 + b, cm["1o"][a] + m, s, lane + m, float(s110[a, b]))
            lane += i1o
        elif g == 1:  # -> 1o_c: [x0e*sh (s011), x1o_c pass (s101), cross(x1e, sh)_c]
            for u in range(i0e):
                for b in range(3):
                    if abs(s011[b, c]) > 1e-12:
                        put(1 + b, cm["0e"] + u, s, lane + u, float(s011[b, c]))
            lane += i0e
            for m in range(i1o):
                for a in range(3):
                    if abs(s101[a, c]) > 1e-12:
                        put(0, cm["1o"][a] + m, s, lane + m, float(s101[a, c]))
            lane += i1o
            for m in range(i1e):
                for a in range(3):
                    for b in range(3):
                        if abs(s111[a, b, c]) > 1e-12:
                            put(1 + b, cm["1e"][a] + m, s, lane + m, float(s111[a, b, c]))
            lane += i1e
        elif g == 2:  # -> 1e_c: [cross(x1o, sh)_c, x1e_c pass, x0o*sh]
            for m in range(i1o):
                for a in range(3):
                    for b in range(3):
                        if abs(s111[a, b, c]) > 1e-12:
                            put(1 + b, cm["1o"][a] + m, s, lane + m, float(s111[a, b, c]))
            lane += i1o
            for m in range(i1e):
                for a in range(3):
                    if abs(s101[a, c]) > 1e-12:
                        put(0, cm["1e"][a] + m, s, lane + m, float(s101[a, c]))
            lane += i1e
            for u in range(i0o):
                for b in range(3):
                    if abs(s011[b, c]) > 1e-12:
                        put(1 + b, cm["0o"] + u, s, lane + u, float(s011[b, c]))
            lane += i0o
        else:  # -> 0o: [dot(x1e, sh; s110), x0o * s000]
            for m in range(i1e):
                for a in range(3):
                    for b in range(3):
                        if abs(s110[a, b]) > 1e-12:
                            put(1 + b, cm["1e"][a] + m, s, lane + m, float(s110[a, b]))
            lane += i1e
            for u in range(i0o):
                put(0, cm["0o"] + u, s, lane + u, float(s000))
            lane += i0o
        assert lane == spec.fans[g], (g, lane, spec.fans[g])

    return G, stripe_of


@functools.lru_cache(maxsize=None)
def _canonical_row_perm(spec: LadderSpec):
    """Permutation folding the canonical->component-major relayout of the
    sender features into G's rows, so the kernel consumes the canonical
    irreps layout directly (saves a [M, K, in_dim] copy per call)."""
    import numpy as _np

    i0e, i1o, i1e, i0o = spec.in_muls
    # index k of component-major layout reads canonical column sigma(k)
    sigma = list(range(i0e))
    ofs = i0e
    for c in range(3):
        sigma += [ofs + m * 3 + c for m in range(i1o)]
    ofs += 3 * i1o
    for c in range(3):
        sigma += [ofs + m * 3 + c for m in range(i1e)]
    ofs += 3 * i1e
    sigma += list(range(ofs, ofs + i0o))
    return _np.asarray(sigma, dtype=_np.int64)


def contribution_matrix_canonical(spec: LadderSpec):
    """contribution_matrix with rows permuted for canonical-layout input."""
    G, stripe_of = contribution_matrix(spec)
    sigma = _canonical_row_perm(spec)
    D = spec.in_dim
    G2 = np.zeros_like(G)
    for b in range(4):
        G2[b * D + sigma, :] = G[b * D : (b + 1) * D, :]
    return G2, stripe_of


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


@functools.lru_cache(maxsize=None)
def umajor_layout(spec: LadderSpec):
    """Per-group canonical (u-major) weight layout padded to 128 columns.

    Returns (col index into canonical w2 or -1, scale, total padded numel,
    per-group padded offsets, per-group padded numels).
    """
    ofs_pad, numels_pad = [], []
    total = 0
    for fan, mul in zip(spec.fans, spec.out_muls):
        n = _pad128(fan * mul) if mul else 0
        ofs_pad.append(total)
        numels_pad.append(n)
        total += n
    idx = -np.ones(max(total, 1), dtype=np.int64)
    scale = np.zeros(max(total, 1), dtype=np.float32)
    ofs = 0
    for g, (fan, mul) in enumerate(zip(spec.fans, spec.out_muls)):
        for u in range(fan):
            for v in range(mul):
                col = ofs_pad[g] + u * mul + v
                idx[col] = ofs + u * mul + v
                scale[col] = 1.0 / np.sqrt(fan)
        ofs += fan * mul
    return idx, scale, total, tuple(ofs_pad), tuple(numels_pad)


@functools.lru_cache(maxsize=None)
def expand_reduce_matrices(spec: LadderSpec):
    """Static E (contribution broadcast) and R (u-contraction) per group.

    E_g: [FAN_PAD, numel_g_pad] with E[u, u*mul+v] = 1 (c stripes carry the
    fan entries in lanes 0..fan-1).
    R_g: [numel_g_pad, mul_pad128] with R[u*mul+v, v] = 1.
    Concatenated over active groups along axis 1 (E) for a single constant,
    with slicing offsets returned separately per group.
    """
    Es, Rs = [], []
    for g, (fan, mul) in enumerate(zip(spec.fans, spec.out_muls)):
        if mul == 0:
            Es.append(None)
            Rs.append(None)
            continue
        n = _pad128(fan * mul)
        E = np.zeros((FAN_PAD, n), dtype=np.float32)
        R = np.zeros((n, _pad128(mul)), dtype=np.float32)
        for u in range(fan):
            for v in range(mul):
                E[u, u * mul + v] = 1.0
                R[u * mul + v, v] = 1.0
        Es.append(E)
        Rs.append(R)
    return Es, Rs


def _kernel_v3(attr_ref, xin_ref, sh_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, e_ref, r_ref, out_ref, msg_ref, *, spec: LadderSpec, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs, cdtype, sum_k=True, debug_stage=0):
    TM = out_ref.shape[0] if sum_k else attr_ref.shape[0]
    K = attr_ref.shape[1]
    T = TM * K
    j = pl.program_id(1)
    attr = attr_ref[:].reshape(T, attr_ref.shape[-1])  # bf16
    xin = xin_ref[:].reshape(T, spec.in_dim)  # bf16, canonical irreps layout
    sh = sh_ref[:].reshape(T, 4)  # bf16
    mask = mask_ref[:].reshape(T, 1)
    b2 = b2_ref[:]

    tile_valid = jnp.sum(mask) > 0.0

    @pl.when(jnp.logical_not(tile_valid) & ((j == 0) if sum_k else (j == j)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid)
    def _():
        # --- edge MLP hidden layer (MXU)
        h = jnp.maximum(jnp.dot(attr, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0)
        h = h.astype(cdtype)

        if debug_stage == 1:  # MLP matmuls only
            acc = 0.0
            for g in range(4):
                if spec.out_muls[g] == 0:
                    continue
                w_g = jnp.dot(h, w2_ref[:, ofs_pads[g] : ofs_pads[g] + numels_pad[g]], preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(w_g, axis=1, keepdims=True)
            out_ref[:] = jnp.sum((acc * mask).reshape(TM, K, 1), axis=1) * jnp.ones((1, spec.out_dim))
            return

        # --- CG contributions: one MXU matmul (v2)
        xa = jnp.concatenate([xin, xin * sh[:, 1:2], xin * sh[:, 2:3], xin * sh[:, 3:4]], axis=1)
        cfull = jnp.dot(xa, g_ref[:], preferred_element_type=jnp.float32)  # [T, S*128]
        cfull = cfull.astype(cdtype)

        # --- per group: unpadded weight matmul + MXU expand/contract
        col = 0
        for g, ncomp in ((0, 1), (1, 3), (2, 3), (3, 1)):
            mul = spec.out_muls[g]
            if mul == 0:
                continue
            n = numels_pad[g]
            w_g = jnp.dot(h, w2_ref[:, ofs_pads[g] : ofs_pads[g] + n], preferred_element_type=jnp.float32)
            w_g = (w_g + b2[ofs_pads[g] : ofs_pads[g] + n]).astype(cdtype)  # [T, n]
            E = e_ref[:, e_ofs[g] : e_ofs[g] + n]  # [128, n] bf16
            R = r_ref[r_ofs[g] : r_ofs[g] + n, :]  # [n, 128] bf16
            # row-stack the l=1 components for one wide matmul chain
            cps = []
            for ci in range(ncomp):
                s = int(stripe_of[g, ci])
                cps.append(cfull[:, s * FAN_PAD : (s + 1) * FAN_PAD])
            cp = jnp.concatenate(cps, axis=0) if ncomp > 1 else cps[0]  # [ncomp*T, 128]
            cexp = jnp.dot(cp, E, preferred_element_type=jnp.float32).astype(cdtype)  # [ncomp*T, n]
            wz = jnp.concatenate([w_g] * ncomp, axis=0) if ncomp > 1 else w_g
            z = (wz * cexp).astype(cdtype)
            outg = jnp.dot(z, R, preferred_element_type=jnp.float32)  # [ncomp*T, 128]
            if debug_stage == 3:  # skip narrow msg writes: scalar sink
                msg_ref[:, 0:1] = jnp.sum(outg, axis=1, keepdims=True)[:T] * mask
                col += ncomp * mul
                continue
            for ci in range(ncomp):
                part = outg[ci * T : (ci + 1) * T, :mul] * mask
                msg_ref[:, col : col + mul] = part
                col += mul

        if sum_k:
            partial = jnp.sum(msg_ref[:].reshape(TM, K, spec.out_dim), axis=1)
            out_ref[:] = jnp.where(j == 0, partial, out_ref[:] + partial)
        else:
            out_ref[:] = msg_ref[:].reshape(TM, K, spec.out_dim)


def _output_perm_cm(spec: LadderSpec):
    """v3 emits msg columns in component-major group order already
    (identical to v1's layout with pack=1), so the canonical conversion is
    just _from_component_major."""
    return None


def _prep_v3(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_out, tile_m, cdtype):
    spec = ladder_spec(irreps_in, irreps_out)
    assert spec is not None, "fused kernel requires lmax=1 ladder irreps"
    M, K, Fe = edge_attr.shape
    tile_k = K
    for cand in (24, 16, 12, 8):
        if K > 24 and K % cand == 0:
            tile_k = cand
            break
    if tile_m is None:
        # target ~768 edge slots per program: v3's per-program fixed costs
        # amortize well and its intermediates are small enough for VMEM
        # (tile_m*tile_k = 1536 fails Mosaic compile at bench shapes; 768 ok)
        tile_m = max(8, min((768 // max(tile_k, 1)) // 8 * 8, 256))

    idx, scale, padded_numel, ofs_pads, numels_pad = umajor_layout(spec)
    safe_idx = jnp.asarray(np.maximum(idx, 0))
    keep = jnp.asarray((idx >= 0).astype(np.float32))
    scale_j = jnp.asarray(scale)
    w2p = (w2[:, safe_idx] * (keep * scale_j)[None, :]).astype(cdtype)
    b2p = b2[safe_idx] * (keep * scale_j)

    G, stripe_of = contribution_matrix_canonical(spec)
    Gj = jnp.asarray(G, dtype=cdtype)
    Es, Rs = expand_reduce_matrices(spec)
    e_ofs, r_ofs = [], []
    acc = 0
    for g in range(4):
        e_ofs.append(acc)
        r_ofs.append(acc)
        if Es[g] is not None:
            acc += Es[g].shape[1]
    Ej = jnp.asarray(np.concatenate([E for E in Es if E is not None], axis=1), dtype=cdtype)
    Rj = jnp.asarray(np.concatenate([R for R in Rs if R is not None], axis=0), dtype=cdtype)


    pad = (-M) % tile_m
    if pad:
        z = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        edge_attr, sender, sh = z(edge_attr), z(sender), z(sh)
        mask = jnp.pad(mask, [(0, pad), (0, 0)])
    Mp = M + pad
    return (
        spec, Mp, tile_m, tile_k, Fe,
        edge_attr.astype(cdtype), sender.astype(cdtype), sh.astype(cdtype),
        mask.astype(jnp.float32)[..., None],
        w1.astype(cdtype), b1, w2p, b2p, Gj, Ej, Rj,
        stripe_of, tuple(ofs_pads), tuple(numels_pad), tuple(e_ofs), tuple(r_ofs),
    )


def _call(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_out, tile_m, interpret, sum_k, use_bf16=True, debug_stage=0):
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    M, K = edge_attr.shape[:2]
    (spec, Mp, tile_m, tile_k, Fe, edge_attr, sender_cm, sh, maskf,
     w1, b1, w2p, b2p, Gj, Ej, Rj, stripe_of, ofs_pads, numels_pad, e_ofs, r_ofs) = _prep_v3(
        edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_out, tile_m, cdtype)

    kernel = functools.partial(
        _kernel_v3, spec=spec, stripe_of=stripe_of, ofs_pads=ofs_pads, numels_pad=numels_pad,
        e_ofs=e_ofs, r_ofs=r_ofs, cdtype=cdtype, sum_k=sum_k, debug_stage=debug_stage,
    )
    if sum_k:
        out_spec = pl.BlockSpec((tile_m, spec.out_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Mp, spec.out_dim), jnp.float32)
    else:
        out_spec = pl.BlockSpec((tile_m, tile_k, spec.out_dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Mp, K, spec.out_dim), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // tile_m, K // tile_k),
        in_specs=[
            pl.BlockSpec((tile_m, tile_k, Fe), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k, spec.in_dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k, 4), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile_m * tile_k, spec.out_dim), jnp.float32)],
        interpret=interpret,
    )(edge_attr, sender_cm, sh, maskf, w1, b1, w2p, b2p, Gj, Ej, Rj)

    out = out[:M]
    return _from_component_major(out, spec.out_muls)


def fused_tpconv_nbr(
    edge_attr, sender, sh, mask, w1, b1, w2, b2,
    irreps_in: str, irreps_out: str,
    tile_m: Optional[int] = None, interpret: bool = False, use_bf16: bool = True, debug_stage: int = 0, **_ignored,
):
    """Fused (edge MLP -> weighted TP -> K-sum), v3 (all-MXU). Same contract
    as tpconv.fused_tpconv_nbr."""
    return _call(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_out, tile_m, interpret, sum_k=True, use_bf16=use_bf16, debug_stage=debug_stage)


def fused_tpconv_msgs(
    edge_attr, sender, sh, mask, w1, b1, w2, b2,
    irreps_in: str, irreps_out: str,
    tile_m: Optional[int] = None, interpret: bool = False, use_bf16: bool = True, **_ignored,
):
    """Per-edge messages [M, K, Dout] (no K reduction), v3."""
    return _call(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_out, tile_m, interpret, sum_k=False, use_bf16=use_bf16)
