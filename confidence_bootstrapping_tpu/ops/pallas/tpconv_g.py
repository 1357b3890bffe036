"""Generalized fused TP-conv kernel (any sh_lmax, derived from the TP paths).

tpconv_v3/tpconv_rec are specialized to sh = 0e+1o (the pretrained score
model). The pretrained confidence architecture (all-atom, sh_lmax=2 —
utils/utils.py:274 defaults sh_lmax to 2 when the manifest omits it) needs
the same treatment: every TP contribution lane is linear in the products
``x * sh_c`` over ALL sh components, so the whole layout — fan-in counts,
the canonical u-major weight index map, the contribution matrix G and the
expand/reduce matrices E/R — derives mechanically from
``WeightedTensorProduct``'s path metadata (ops/irreps.py:302-333). That
guarantees numerical agreement with the XLA path by construction, for any
(irreps_in, irreps_sh, irreps_out) with mul-1 sh.

Kernel structure is v3's (all stages MXU): xa = [x*sh_0 | ... | x*sh_C-1]
@ G emits one 128-lane contribution stripe per (output group, component);
per group the canonical-layout weight matmul, the one-hot expand E, the
per-edge multiply, and the one-hot reduce R produce the messages.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..irreps import Irreps, WeightedTensorProduct, clebsch_gordan

LANE = 128


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


class GeneralSpec(NamedTuple):
    in_dim: int
    sh_dim: int
    out_dim: int
    weight_numel: int
    n_stripes: int
    # per active group: (out_index, d3, mul_out, fan, w_ofs_pad, numel_pad, stripe0)
    groups: Tuple[Tuple[int, int, int, int, int, int, int], ...]
    out_perm: Tuple[int, ...]  # kernel msg column -> canonical output column
    total_pad: int


@functools.lru_cache(maxsize=None)
def general_layout(irreps_in: str, irreps_sh: str, irreps_out: str):
    """Derive (spec, w_idx, w_scale, G) from the TP path structure."""
    tp = WeightedTensorProduct(irreps_in, irreps_sh, irreps_out)
    ir_in, ir_sh, ir_out = tp.irreps_in, tp.irreps_sh, tp.irreps_out
    Din, Dsh, Dout = ir_in.dim, ir_sh.dim, ir_out.dim
    in_slices, sh_slices, out_slices = ir_in.slices(), ir_sh.slices(), ir_out.slices()

    groups = []
    stripe = 0
    total = 0
    w_ofs = 0
    idx_cols = []
    scale_cols = []
    out_perm = []
    msg_col = 0
    n_stripes = sum((2 * ir_out[g.out_index][1].l + 1) for g in tp.groups)
    G = np.zeros((Dsh * Din, n_stripes * LANE), dtype=np.float32)

    for g in tp.groups:
        mul_out, iro = ir_out[g.out_index]
        d3 = iro.dim
        fan = g.fan_in
        if fan > LANE:
            raise ValueError(f"fan-in {fan} exceeds one lane group; use the XLA path")
        numel = fan * mul_out
        numel_pad = _pad128(numel)
        # weight columns (canonical flat layout is group-major, u-major)
        idx = -np.ones(numel_pad, dtype=np.int64)
        scale = np.zeros(numel_pad, dtype=np.float32)
        for u in range(fan):
            for v in range(mul_out):
                idx[u * mul_out + v] = w_ofs + u * mul_out + v
                scale[u * mul_out + v] = 1.0 / np.sqrt(fan)
        idx_cols.append(idx)
        scale_cols.append(scale)

        # contribution matrix rows: lane u = (path offset + channel m)
        for c in range(d3):
            lane_ofs = 0
            for ii, si in g.paths:
                mul_in, iri = ir_in[ii]
                mul_sh, irs = ir_sh[si]
                if mul_sh != 1:
                    # the contribution matrix G assumes mul-1 sh irreps
                    # (spherical harmonics); a mul>1 sh entry would build a
                    # silently wrong G — raise so TPConv._fused_mode's
                    # except clause routes this layer to the XLA path.
                    raise ValueError(
                        f"general_layout requires mul-1 sh irreps, got mul={mul_sh} "
                        f"for {irs}; use the XLA path"
                    )
                cg = clebsch_gordan(iri.l, irs.l, iro.l) * np.sqrt(d3)
                for m in range(mul_in):
                    for a in range(iri.dim):
                        row_x = in_slices[ii].start + m * iri.dim + a
                        for b in range(irs.dim):
                            val = float(cg[a, b, c])
                            if abs(val) < 1e-12:
                                continue
                            row = (sh_slices[si].start + b) * Din + row_x
                            G[row, (stripe + c) * LANE + lane_ofs + m] += val
                lane_ofs += mul_in
            assert lane_ofs == fan

        # kernel msg columns: (group, c)-major; canonical: block + v*d3 + c
        for c in range(d3):
            for v in range(mul_out):
                out_perm.append(out_slices[g.out_index].start + v * d3 + c)
        groups.append((g.out_index, d3, mul_out, fan, total, numel_pad, stripe))
        stripe += d3
        total += numel_pad
        w_ofs += numel
        msg_col += d3 * mul_out

    spec = GeneralSpec(
        in_dim=Din, sh_dim=Dsh, out_dim=msg_col, weight_numel=tp.weight_numel,
        n_stripes=n_stripes, groups=tuple(groups), out_perm=tuple(out_perm), total_pad=total,
    )
    w_idx = np.concatenate(idx_cols) if idx_cols else np.zeros(0, np.int64)
    w_scale = np.concatenate(scale_cols) if scale_cols else np.zeros(0, np.float32)
    return spec, w_idx, w_scale, G, Dout


@functools.lru_cache(maxsize=None)
def _expand_reduce(spec: GeneralSpec):
    Es, Rs = [], []
    for (_, d3, mul, fan, _, numel_pad, _) in spec.groups:
        E = np.zeros((LANE, numel_pad), dtype=np.float32)
        R = np.zeros((numel_pad, LANE), dtype=np.float32)
        for u in range(fan):
            for v in range(mul):
                E[u, u * mul + v] = 1.0
                R[u * mul + v, v] = 1.0
        Es.append(E)
        Rs.append(R)
    return Es, Rs


def _kernel_g(attr_ref, xin_ref, sh_ref, mask_ref, *refs, spec: GeneralSpec, cdtype, sum_k=True, has_dm=False):
    if has_dm:
        # training variant: a hidden-layer dropout mask rides along as an
        # extra input (values {0, 1/keep}; width H or 1), applied after relu
        dm_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, e_ref, r_ref, out_ref, msg_ref = refs
    else:
        dm_ref = None
        w1_ref, b1_ref, w2_ref, b2_ref, g_ref, e_ref, r_ref, out_ref, msg_ref = refs
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else jax.lax.Precision.DEFAULT
    TM = out_ref.shape[0] if sum_k else attr_ref.shape[0]
    K = attr_ref.shape[1]
    T = TM * K
    j = pl.program_id(1)
    attr = attr_ref[:].reshape(T, attr_ref.shape[-1])
    xin = xin_ref[:].reshape(T, spec.in_dim)
    sh = sh_ref[:].reshape(T, spec.sh_dim)
    mask = mask_ref[:].reshape(T, 1)
    b2 = b2_ref[:]

    tile_valid = jnp.sum(mask) > 0.0

    @pl.when(jnp.logical_not(tile_valid) & ((j == 0) if sum_k else (j == j)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid)
    def _():
        h = jnp.maximum(jnp.dot(attr, w1_ref[:], preferred_element_type=jnp.float32, precision=prec) + b1_ref[:], 0.0)
        if dm_ref is not None:
            h = h * dm_ref[:].reshape(T, dm_ref.shape[-1]).astype(jnp.float32)
        h = h.astype(cdtype)

        xa = jnp.concatenate([xin * sh[:, c : c + 1] for c in range(spec.sh_dim)], axis=1)
        cfull = jnp.dot(xa, g_ref[:], preferred_element_type=jnp.float32, precision=prec).astype(cdtype)

        col = 0
        e_ofs = 0
        for (_, d3, mul, fan, w_ofs_pad, numel_pad, stripe0) in spec.groups:
            w_g = jnp.dot(h, w2_ref[:, w_ofs_pad : w_ofs_pad + numel_pad], preferred_element_type=jnp.float32, precision=prec)
            w_g = (w_g + b2[w_ofs_pad : w_ofs_pad + numel_pad]).astype(cdtype)
            E = e_ref[:, e_ofs : e_ofs + numel_pad]
            R = r_ref[e_ofs : e_ofs + numel_pad, :]
            e_ofs += numel_pad
            cps = [cfull[:, (stripe0 + c) * LANE : (stripe0 + c + 1) * LANE] for c in range(d3)]
            cp = jnp.concatenate(cps, axis=0) if d3 > 1 else cps[0]
            cexp = jnp.dot(cp, E, preferred_element_type=jnp.float32, precision=prec).astype(cdtype)
            wz = jnp.concatenate([w_g] * d3, axis=0) if d3 > 1 else w_g
            z = (wz * cexp).astype(cdtype)
            outg = jnp.dot(z, R, preferred_element_type=jnp.float32, precision=prec)
            for c in range(d3):
                part = outg[c * T : (c + 1) * T, :mul] * mask
                msg_ref[:, col : col + mul] = part
                col += mul

        if sum_k:
            partial = jnp.sum(msg_ref[:].reshape(TM, K, spec.out_dim), axis=1)
            out_ref[:] = jnp.where(j == 0, partial, out_ref[:] + partial)
        else:
            out_ref[:] = msg_ref[:].reshape(TM, K, spec.out_dim)


def _prep_g(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_sh, irreps_out, tile_m, cdtype):
    spec, w_idx, w_scale, G, Dout = general_layout(str(Irreps(irreps_in)), str(Irreps(irreps_sh)), str(Irreps(irreps_out)))
    M, K, Fe = edge_attr.shape
    tile_k = K
    for cand in (24, 16, 12, 8):
        if K > 24 and K % cand == 0:
            tile_k = cand
            break
    if tile_m is None:
        tile_m = max(8, min((512 // max(tile_k, 1)) // 8 * 8, 256))

    safe_idx = jnp.asarray(np.maximum(w_idx, 0))
    keep = jnp.asarray((w_idx >= 0).astype(np.float32))
    scale_j = jnp.asarray(w_scale)
    w2p = (w2[:, safe_idx] * (keep * scale_j)[None, :]).astype(cdtype)
    b2p = b2[safe_idx] * (keep * scale_j)

    Gj = jnp.asarray(G, dtype=cdtype)
    Es, Rs = _expand_reduce(spec)
    Ej = jnp.asarray(np.concatenate(Es, axis=1), dtype=cdtype)
    Rj = jnp.asarray(np.concatenate(Rs, axis=0), dtype=cdtype)

    pad = (-M) % tile_m
    if pad:
        z = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        edge_attr, sender, sh = z(edge_attr), z(sender), z(sh)
        mask = jnp.pad(mask, [(0, pad), (0, 0)])
    Mp = M + pad
    return (
        spec, Dout, Mp, tile_m, tile_k, Fe,
        edge_attr.astype(cdtype), sender.astype(cdtype), sh.astype(cdtype),
        mask.astype(jnp.float32)[..., None], w1.astype(cdtype), b1, w2p, b2p, Gj, Ej, Rj,
    )


def _scatter_canonical(out, spec: GeneralSpec, Dout):
    """Kernel msg columns -> canonical output layout (zeros for output
    irreps with no admissible path)."""
    full = jnp.zeros(out.shape[:-1] + (Dout,), out.dtype)
    perm = np.asarray(spec.out_perm, dtype=np.int64)
    return full.at[..., perm].set(out)


def _call_g(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_sh, irreps_out, tile_m, interpret, sum_k, use_bf16=True, dmask=None):
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    M, K = edge_attr.shape[:2]
    (spec, Dout, Mp, tile_m, tile_k, Fe, edge_attr, sender, sh, maskf,
     w1, b1, w2p, b2p, Gj, Ej, Rj) = _prep_g(
        edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_sh, irreps_out, tile_m, cdtype)
    if dmask is not None and Mp > M:
        dmask = jnp.pad(dmask, [(0, Mp - M), (0, 0), (0, 0)])

    kernel = functools.partial(_kernel_g, spec=spec, cdtype=cdtype, sum_k=sum_k, has_dm=dmask is not None)
    if sum_k:
        out_spec = pl.BlockSpec((tile_m, spec.out_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Mp, spec.out_dim), jnp.float32)
    else:
        out_spec = pl.BlockSpec((tile_m, tile_k, spec.out_dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Mp, K, spec.out_dim), jnp.float32)

    dm_specs, dm_args = [], []
    if dmask is not None:
        dm_specs = [pl.BlockSpec((tile_m, tile_k, dmask.shape[-1]), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)]
        dm_args = [dmask.astype(cdtype)]
    out = pl.pallas_call(
        kernel,
        grid=(Mp // tile_m, K // tile_k),
        in_specs=[
            pl.BlockSpec((tile_m, tile_k, Fe), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k, spec.in_dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k, spec.sh_dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ] + dm_specs + [
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
    )(edge_attr, sender, sh, maskf, *dm_args, w1, b1, w2p, b2p, Gj, Ej, Rj)

    out = out[:M]
    return _scatter_canonical(out, spec, Dout)


def fused_tpconv_nbr_g(
    edge_attr, sender, sh, mask, w1, b1, w2, b2,
    irreps_in: str, irreps_sh: str, irreps_out: str,
    tile_m: Optional[int] = None, interpret: bool = False, use_bf16: bool = True, **_ignored,
):
    """Fused (edge MLP -> weighted TP -> K-sum) for ANY mul-1 sh irreps.
    Message sums [M, Dout] in the canonical irreps layout."""
    return _call_g(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_sh, irreps_out, tile_m, interpret, sum_k=True, use_bf16=use_bf16)


def fused_tpconv_msgs_g(
    edge_attr, sender, sh, mask, w1, b1, w2, b2,
    irreps_in: str, irreps_sh: str, irreps_out: str,
    tile_m: Optional[int] = None, interpret: bool = False, use_bf16: bool = True, **_ignored,
):
    """Per-edge messages [M, K, Dout] (no K reduction), generalized."""
    return _call_g(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_sh, irreps_out, tile_m, interpret, sum_k=False, use_bf16=use_bf16)


# ---------------------------------------------------------------------- #
# generalized IN-KERNEL GATHER variants (v4-style, any mul-1 sh, lmax<=2)
# — the all-atom confidence model's kNN groups (round-2 roadmap item 4).
# The [B, A, K, D] sender materialization + take_along_axis gathers that
# v4 killed for the lmax=1 score model dominate the lmax=2 all-atom
# forward; these kernels give the same treatment to the general layout.
# ---------------------------------------------------------------------- #

SQRT3 = float(np.sqrt(3.0))


def _sh_in_kernel(vec, sh_dim, cdtype):
    """Component-normalized sh columns (lmax 0..2) of vec [T, 3] in-register,
    matching ops/irreps.spherical_harmonics (normalize=True)."""
    from ..irreps import _sh_norms

    d2 = jnp.maximum(jnp.sum(vec * vec, axis=1, keepdims=True), 1e-12)
    u = vec * jax.lax.rsqrt(d2)  # [T, 3]
    cols = [jnp.ones_like(u[:, :1])]
    if sh_dim >= 4:
        cols.append(SQRT3 * u)
    if sh_dim >= 9:
        n = _sh_norms(2)
        ux, uy, uz = u[:, 0:1], u[:, 1:2], u[:, 2:3]
        cols.append(
            jnp.concatenate(
                [
                    n[0] * ux * uy,
                    n[1] * uy * uz,
                    n[2] * (2 * uz * uz - ux * ux - uy * uy),
                    n[3] * uz * ux,
                    n[4] * (ux * ux - uy * uy),
                ],
                axis=1,
            )
        )
    return jnp.concatenate(cols, axis=1).astype(cdtype)  # [T, sh_dim]


def _pipeline_g(h, xa, mask, w2_ref, b2, g_ref, e_ref, r_ref, T, spec, cdtype, prec):
    """Shared weighted-TP core -> [T, spec.out_dim] masked kernel-order msgs."""
    cfull = jnp.dot(xa, g_ref[:], preferred_element_type=jnp.float32, precision=prec).astype(cdtype)
    cols = []
    e_ofs = 0
    for (_, d3, mul, fan, w_ofs_pad, numel_pad, stripe0) in spec.groups:
        w_g = jnp.dot(h, w2_ref[:, w_ofs_pad : w_ofs_pad + numel_pad], preferred_element_type=jnp.float32, precision=prec)
        w_g = (w_g + b2[w_ofs_pad : w_ofs_pad + numel_pad]).astype(cdtype)
        E = e_ref[:, e_ofs : e_ofs + numel_pad]
        R = r_ref[e_ofs : e_ofs + numel_pad, :]
        e_ofs += numel_pad
        cps = [cfull[:, (stripe0 + c) * LANE : (stripe0 + c + 1) * LANE] for c in range(d3)]
        cp = jnp.concatenate(cps, axis=0) if d3 > 1 else cps[0]
        cexp = jnp.dot(cp, E, preferred_element_type=jnp.float32, precision=prec).astype(cdtype)
        wz = jnp.concatenate([w_g] * d3, axis=0) if d3 > 1 else w_g
        z = (wz * cexp).astype(cdtype)
        outg = jnp.dot(z, R, preferred_element_type=jnp.float32, precision=prec)
        for c in range(d3):
            cols.append(outg[c * T : (c + 1) * T, :mul] * mask)
    return jnp.concatenate(cols, axis=1)  # [T, out_dim] kernel column order


def _kernel_rec_g(nbr_ref, emb_ref, mask_ref, node_ref, sig_ref,
                  w1e_ref, w1r_ref, w1s_ref, b1_ref, w2_ref, b2_ref, g_ref, e_ref, r_ref,
                  out_ref, *, spec: GeneralSpec, ns: int, tile_n: int, cdtype, hetero: bool, recv_ref=None,
                  dm_ref=None):
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else jax.lax.Precision.DEFAULT
    N = node_ref.shape[1]
    K = nbr_ref.shape[2]
    T = tile_n * K
    n_idx = pl.program_id(1)

    mask = mask_ref[0].reshape(T, 1)
    tile_valid = jnp.sum(mask) > 0.0

    @pl.when(jnp.logical_not(tile_valid))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid)
    def _():
        node_tab = node_ref[0]  # [N, Din+6] (sender table)
        Din = node_tab.shape[1] - 6
        idx = nbr_ref[0].reshape(T, 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1).astype(jnp.float32)
        onehot = (iota == idx).astype(cdtype)

        gath = jnp.dot(onehot, node_tab, preferred_element_type=jnp.float32, precision=prec)
        sender = gath[:, :Din].astype(cdtype)
        spos = gath[:, Din : Din + 3] + gath[:, Din + 3 :]
        rtab = node_ref if recv_ref is None else recv_ref
        recvf = rtab[0, pl.ds(n_idx * tile_n, tile_n), :].astype(jnp.float32)
        Dr = recvf.shape[1] - 6
        rpos = recvf[:, Dr : Dr + 3] + recvf[:, Dr + 3 :]
        vec = spos - jnp.broadcast_to(rpos[:, None, :], (tile_n, K, 3)).reshape(T, 3)
        sh = _sh_in_kernel(vec, spec.sh_dim, cdtype)

        emb = emb_ref[0].reshape(T, emb_ref.shape[-1]).astype(jnp.float32) + sig_ref[0]
        h = jnp.dot(emb.astype(cdtype), w1e_ref[:], preferred_element_type=jnp.float32, precision=prec)
        hr = jnp.dot(recvf[:, :ns].astype(cdtype), w1r_ref[:], preferred_element_type=jnp.float32, precision=prec)
        h = h + jnp.broadcast_to(hr[:, None, :], (tile_n, K, hr.shape[-1])).reshape(T, hr.shape[-1])
        h = h + jnp.dot(sender[:, :ns], w1s_ref[:], preferred_element_type=jnp.float32, precision=prec)
        h = jnp.maximum(h + b1_ref[:], 0.0)
        if dm_ref is not None:
            # training: hidden-layer dropout mask ({0, 1/keep}) rides along
            h = h * dm_ref[0].reshape(T, dm_ref.shape[-1]).astype(jnp.float32)
        h = h.astype(cdtype)

        xa = jnp.concatenate([sender * sh[:, c : c + 1] for c in range(spec.sh_dim)], axis=1)
        msgs = _pipeline_g(h, xa, mask, w2_ref, b2_ref[:], g_ref, e_ref, r_ref, T, spec, cdtype, prec)
        out_ref[0] = jnp.sum(msgs.reshape(tile_n, K, spec.out_dim), axis=1)


def _prep_gather_g(irreps_in, irreps_sh, irreps_out, w2, b2, cdtype):
    spec, w_idx, w_scale, G, Dout = general_layout(
        str(Irreps(irreps_in)), str(Irreps(irreps_sh)), str(Irreps(irreps_out))
    )
    if spec.sh_dim not in (1, 4, 9):
        raise ValueError(f"in-kernel sh supports lmax<=2, got sh_dim={spec.sh_dim}")
    safe_idx = jnp.asarray(np.maximum(w_idx, 0))
    keep = jnp.asarray((w_idx >= 0).astype(np.float32))
    w2p = (w2[:, safe_idx] * (keep * jnp.asarray(w_scale))[None, :]).astype(cdtype)
    b2p = b2[safe_idx] * (keep * jnp.asarray(w_scale))
    Gj = jnp.asarray(G, dtype=cdtype)
    Es, Rs = _expand_reduce(spec)
    Ej = jnp.asarray(np.concatenate(Es, axis=1), dtype=cdtype)
    Rj = jnp.asarray(np.concatenate(Rs, axis=0), dtype=cdtype)
    return spec, Dout, w2p, b2p, Gj, Ej, Rj


def _table_g(attr, pos, cdtype):
    hi = pos.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (pos - hi).astype(jnp.bfloat16)
    return jnp.concatenate([attr.astype(cdtype), hi.astype(cdtype), lo.astype(cdtype)], axis=-1)


def fused_tpconv_rec_g(
    node_attr,  # [B, N, Din] canonical irreps layout (senders AND receivers)
    pos,  # [B, N, 3] float32
    nbr,  # [B, N, K] int32
    edge_emb,  # [B, N, K, Fe] cached edge embeddings
    sig,  # [B, Fe] per-step sigma embedding added in-kernel (zeros to skip)
    mask,  # [B, N, K] bool
    w1, b1, w2, b2,  # edge MLP; w1 rows = [Fe | ns (receiver) | ns (sender)]
    irreps_in: str,
    irreps_sh: str,
    irreps_out: str,
    ns: int,
    tile_n: int | None = None,
    interpret: bool = False,
    use_bf16: bool = True,
    dmask=None,
):
    """Generalized v4: message sums [B, N, Dout] for a kNN node group with
    the neighbor gather, spherical harmonics (lmax<=2), edge-attr concat and
    sigma add all in-kernel. Semantics match gather + conv_nbr on the
    general path (fused_tpconv_nbr_g). dmask: optional [B, N, K, H'] hidden
    dropout mask (training path, tpconv_train.fused_tpconv_rec_train)."""
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    B, N, Din = node_attr.shape
    K = nbr.shape[2]
    Fe = edge_emb.shape[-1]
    assert w1.shape[0] == Fe + 2 * ns
    spec, Dout, w2p, b2p, Gj, Ej, Rj = _prep_gather_g(irreps_in, irreps_sh, irreps_out, w2, b2, cdtype)

    if tile_n is None:
        # keep the [T, N] one-hot near ~1M elements (T = tile_n * K)
        target_t = min(512, max(64, (1 << 20) // max(N, 1)))
        tile_n = max(8, (target_t // max(K, 1)) // 8 * 8)
        while tile_n > 8 and N % tile_n:
            tile_n -= 8
        if N % tile_n:
            tile_n = 8
    assert N % tile_n == 0, (N, tile_n)

    node_tab = _table_g(node_attr, pos, cdtype)
    w1e = w1[:Fe].astype(cdtype)
    w1r = w1[Fe : Fe + ns].astype(cdtype)
    w1s = w1[Fe + ns :].astype(cdtype)

    base = functools.partial(
        _kernel_rec_g, spec=spec, ns=ns, tile_n=tile_n, cdtype=cdtype, hetero=False,
    )
    dm_specs, dm_args = [], []
    if dmask is None:
        kernel = base
    else:
        Hd = dmask.shape[-1]
        dm_specs = [pl.BlockSpec((1, tile_n, K, Hd), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM)]
        dm_args = [dmask.astype(cdtype)]

        def kernel(nbr_r, emb_r, mask_r, node_r, sig_r, w1e_r, w1r_r, w1s_r, b1_r,
                   w2_r, b2_r, g_r, e_r, r_r, dm_r, out_r):
            base(nbr_r, emb_r, mask_r, node_r, sig_r, w1e_r, w1r_r, w1s_r, b1_r,
                 w2_r, b2_r, g_r, e_r, r_r, out_r, dm_ref=dm_r)

    out = pl.pallas_call(
        kernel,
        grid=(B, N // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, K, 1), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K, Fe), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K, 1), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Din + 6), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Fe), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + dm_specs,
        out_specs=pl.BlockSpec((1, tile_n, spec.out_dim), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, spec.out_dim), jnp.float32),
        interpret=interpret,
    )(
        nbr.astype(jnp.float32)[..., None], edge_emb.astype(cdtype), mask.astype(jnp.float32)[..., None],
        node_tab, sig.astype(jnp.float32)[:, None, :],
        w1e, w1r, w1s, b1, w2p, b2p, Gj, Ej, Rj, *dm_args,
    )
    return _scatter_canonical(out, spec, Dout)


def fused_tpconv_cross_g(
    recv_attr,  # [B, L, Dl] receivers
    recv_pos,  # [B, L, 3]
    src_attr,  # [B, N, Dr] sender table
    src_pos,  # [B, N, 3]
    idx,  # [B, L, K] int32 sender indices
    edge_emb,  # [B, L, K, Fe] (sigma already included)
    mask,  # [B, L, K] bool
    w1, b1, w2, b2,
    irreps_in: str,
    irreps_sh: str,
    irreps_out: str,
    ns: int,
    interpret: bool = False,
    use_bf16: bool = True,
):
    """Generalized hetero-receiver gather variant (e.g. lig <- atom at
    lmax=2): message sums [B, L, Dout]. One grid program per batch element
    (L is small for ligand receivers)."""
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    B, L, Dl = recv_attr.shape
    N = src_attr.shape[1]
    K = idx.shape[2]
    Fe = edge_emb.shape[-1]
    assert w1.shape[0] == Fe + 2 * ns
    spec, Dout, w2p, b2p, Gj, Ej, Rj = _prep_gather_g(irreps_in, irreps_sh, irreps_out, w2, b2, cdtype)

    src_tab = _table_g(src_attr, src_pos, cdtype)
    recv_tab = _table_g(recv_attr, recv_pos, cdtype)
    w1e = w1[:Fe].astype(cdtype)
    w1r = w1[Fe : Fe + ns].astype(cdtype)
    w1s = w1[Fe + ns :].astype(cdtype)
    zsig = jnp.zeros((B, 1, Fe), jnp.float32)

    kernel = functools.partial(
        _kernel_rec_g, spec=spec, ns=ns, tile_n=L, cdtype=cdtype, hetero=True,
    )

    def _kern(nbr_ref, emb_ref, mask_ref, src_ref, sig_ref, recv_ref,
              w1e_ref, w1r_ref, w1s_ref, b1_ref, w2_ref, b2_ref, g_ref, e_ref, r_ref, out_ref):
        _kernel_rec_g(
            nbr_ref, emb_ref, mask_ref, src_ref, sig_ref,
            w1e_ref, w1r_ref, w1s_ref, b1_ref, w2_ref, b2_ref, g_ref, e_ref, r_ref, out_ref,
            spec=spec, ns=ns, tile_n=L, cdtype=cdtype, hetero=True, recv_ref=recv_ref,
        )

    out = pl.pallas_call(
        _kern,
        grid=(B, 1),
        in_specs=[
            pl.BlockSpec((1, L, K, 1), lambda b, n: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, K, Fe), lambda b, n: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, K, 1), lambda b, n: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, src_tab.shape[-1]), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Fe), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dl + 6), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
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
        out_specs=pl.BlockSpec((1, L, spec.out_dim), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, spec.out_dim), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.float32)[..., None], edge_emb.astype(cdtype), mask.astype(jnp.float32)[..., None],
        src_tab, zsig, recv_tab,
        w1e, w1r, w1s, b1, w2p, b2p, Gj, Ej, Rj,
    )
    return _scatter_canonical(out, spec, Dout)
