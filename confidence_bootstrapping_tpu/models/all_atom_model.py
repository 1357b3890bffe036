"""All-atom SE(3)-equivariant model (the pretrained confidence architecture).

TPU re-design of the reference's ``models/all_atom_score_model.py``: adds an
``atom`` node type (every receptor heavy atom) to the coarse-grained graph:

  * embedding phase: receptor residues and atoms convolve jointly over 4 edge
    groups [rec-rec kNN, rec<-atom (per-residue membership), atom-atom kNN,
    atom<-rec] (reference lines 274-361) — t-independent, cacheable;
  * main trunk: 9 edge groups [lig, lig<-rec, lig<-atom, rec, rec<-lig,
    rec<-atom, atom, atom<-lig, atom<-rec]; the last layer restricts to the
    3 ligand-updating groups (lines 396-429);
  * heads identical to the CG model; the pretrained confidence model runs
    this with ns=24, sh_lmax=2, confidence_mode, crop_beyond=20.

Fixed-shape containers: atom-atom edges are host-precomputed [A, KA]
neighbor lists; atom->residue membership edges are [A] residue indices;
lig<-atom cross edges are capped nearest-K lists recomputed per forward.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import ScoreModelConfig
from ..data.complex_graph import ComplexBatch
from ..data.vocab import LIG_FEATURE_DIMS, REC_ATOM_FEATURE_DIMS, REC_RESIDUE_FEATURE_DIMS
from ..ops import so3, torus
from ..ops.graph_builders import gather_nodes, pairwise_dist, radius_mask, scatter_mean_to_nodes, topk_neighbors
from ..ops.irreps import FullTensorProduct, spherical_harmonics, spherical_harmonics_irreps
from ..ops.schedules import get_timestep_embedding, t_to_sigma
from .layers import AtomEncoder, FCBlock, GaussianSmearing, TPConv
from .score_model import ConfidenceHead, FinalNormMLP, RecCache, ScoreOutput, TorFinalMLP, get_irrep_seq


class AtomRecCache(NamedTuple):
    rec_attr: Any  # [B, N, D]
    atom_attr: Any  # [B, A, D]
    rec_edge_emb: Any  # [B, N, KR, ns]
    rec_edge_sh: Any
    atom_edge_emb: Any  # [B, A, KA, ns]
    atom_edge_sh: Any
    ar_edge_emb: Any  # [B, A, ns] (atom -> its residue)
    ar_edge_sh: Any  # [B, A, sh]


def _select_pack(keep, order_key, cap):
    """Pack up to ``cap`` kept rows to the front, preserving original order.

    keep [B, N] bool, order_key [B, N] (smaller = keep first on cap
    overflow). Returns (sel [B, cap] original indices ascending, valid
    [B, cap], inv [B, N] new position of each old index, selected [B, N]
    bool marking rows that actually made it)."""
    import jax

    B, N = keep.shape
    k = min(cap, N)
    _, idx = jax.lax.top_k(jnp.where(keep, -order_key, -jnp.inf), k)
    valid_by_rank = jnp.take_along_axis(keep, idx, axis=1)
    idx_sorted = jnp.sort(jnp.where(valid_by_rank, idx, N), axis=1)
    valid = idx_sorted < N
    sel = jnp.minimum(idx_sorted, N - 1).astype(jnp.int32)
    b_idx = jnp.arange(B)[:, None]
    scatter_to = jnp.where(valid, sel, N)
    inv = jnp.zeros((B, N), jnp.int32).at[b_idx, scatter_to].set(
        jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None], sel.shape), mode="drop"
    )
    selected = jnp.zeros((B, N), bool).at[b_idx, scatter_to].set(True, mode="drop")
    return sel, valid, inv, selected


def compact_crop(batch: ComplexBatch, cache: Optional[AtomRecCache], crop_dist: float,
                 n_res: int, n_atoms: int):
    """Crop + compact the receptor view of a batch for the trunk.

    The reference applies ``crop_beyond`` by SUBGRAPHING the complex before
    the confidence forward (``utils/utils.py:395-420``,
    ``confidence/dataset.py:376-377``): residues whose Calpha is farther than
    ``crop_dist`` from every ligand atom are deleted together with their
    atoms, and the original neighbor lists are restricted to surviving nodes
    (NOT recomputed). This function reproduces that per pose with fixed
    shapes: kept residues/atoms are packed to the front of (n_res, n_atoms)
    buckets, neighbor indices are remapped, and edges whose sender was
    cropped are masked. On cap overflow the nearest (by residue-to-ligand
    distance) survive — report via the returned stats and raise the caps if
    ``res_overflow``/``atom_overflow`` are nonzero.

    Returns (compacted batch, compacted cache or None, stats dict).
    """
    import jax

    B, N = batch.rec_mask.shape
    b_idx = jnp.arange(B)[:, None]
    d = jnp.min(
        jnp.where(batch.lig_mask[:, :, None], pairwise_dist(batch.lig_pos, batch.rec_pos), jnp.inf), axis=1
    )  # [B, N] residue -> nearest ligand atom
    keep_res = batch.rec_mask & (d < crop_dist)
    sel_r, val_r, inv_r, selected_r = _select_pack(keep_res, d, n_res)

    g_r = lambda a: a[b_idx, sel_r] if a is not None else None
    new_nbr = inv_r[b_idx[..., None], g_r(batch.rec_nbr)]
    new_nbr_mask = g_r(batch.rec_nbr_mask) & selected_r[b_idx[..., None], g_r(batch.rec_nbr)]

    rep = dict(
        rec_f=g_r(batch.rec_f), rec_lm=g_r(batch.rec_lm), rec_pos=g_r(batch.rec_pos),
        rec_mask=val_r, rec_nbr=new_nbr, rec_nbr_mask=new_nbr_mask,
        rec_sidechain=g_r(batch.rec_sidechain),
    )
    stats = dict(
        kept_res=jnp.sum(keep_res, 1), res_overflow=jnp.maximum(jnp.sum(keep_res, 1) - sel_r.shape[1], 0),
    )
    cache_rep = {}
    if cache is not None:
        cache_rep.update(rec_attr=g_r(cache.rec_attr), rec_edge_emb=g_r(cache.rec_edge_emb),
                         rec_edge_sh=g_r(cache.rec_edge_sh))

    if batch.atom_f is not None and batch.atom_f.size:
        keep_atom = batch.atom_mask & selected_r[b_idx, batch.atom_res]
        d_atom = d[b_idx, batch.atom_res]
        sel_a, val_a, inv_a, selected_a = _select_pack(keep_atom, d_atom, n_atoms)
        g_a = lambda a: a[b_idx, sel_a] if a is not None else None
        new_anbr = inv_a[b_idx[..., None], g_a(batch.atom_nbr)]
        new_anbr_mask = g_a(batch.atom_nbr_mask) & selected_a[b_idx[..., None], g_a(batch.atom_nbr)]
        rep.update(
            atom_f=g_a(batch.atom_f), atom_pos=g_a(batch.atom_pos), atom_mask=val_a,
            atom_nbr=new_anbr, atom_nbr_mask=new_anbr_mask, atom_res=inv_r[b_idx, g_a(batch.atom_res)],
        )
        stats.update(kept_atoms=jnp.sum(keep_atom, 1),
                     atom_overflow=jnp.maximum(jnp.sum(keep_atom, 1) - sel_a.shape[1], 0))
        if cache is not None:
            cache_rep.update(atom_attr=g_a(cache.atom_attr), atom_edge_emb=g_a(cache.atom_edge_emb),
                             atom_edge_sh=g_a(cache.atom_edge_sh), ar_edge_emb=g_a(cache.ar_edge_emb),
                             ar_edge_sh=g_a(cache.ar_edge_sh))

    new_cache = cache._replace(**cache_rep) if cache is not None else None
    return batch.replace(**rep), new_cache, stats


class AllAtomScoreModel(nn.Module):
    cfg: ScoreModelConfig

    def setup(self):
        c = self.cfg
        ns, nv = c.ns, c.nv
        sh_irreps = spherical_harmonics_irreps(c.sh_lmax)
        sh = str(sh_irreps)
        self.timestep_emb = get_timestep_embedding(c.embedding_type, c.sigma_embed_dim, c.embedding_scale)

        self.lig_node_embedding = AtomEncoder(ns, LIG_FEATURE_DIMS, n_scalar=c.sigma_embed_dim)
        self.lig_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.rec_node_embedding = AtomEncoder(ns, REC_RESIDUE_FEATURE_DIMS, n_scalar=c.lm_embedding_dim)
        self.rec_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.rec_sigma_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.atom_node_embedding = AtomEncoder(ns, REC_ATOM_FEATURE_DIMS, n_scalar=0)
        self.atom_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.lr_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.ar_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.la_edge_embedding = FCBlock(ns, ns, 2, c.dropout)

        self.lig_distance_expansion = GaussianSmearing(0.0, c.lig_max_radius, c.distance_embed_dim)
        self.rec_distance_expansion = GaussianSmearing(0.0, c.rec_max_radius, c.distance_embed_dim)
        self.cross_distance_expansion = GaussianSmearing(0.0, c.cross_max_distance, c.cross_distance_embed_dim)

        seq = get_irrep_seq(ns, nv, c.use_second_order_repr, c.reduce_pseudoscalars)

        def conv(i, groups, residual=True):
            return TPConv(
                in_irreps=seq[min(i, 3)],
                sh_irreps=sh,
                out_irreps=seq[min(i + 1, 3)],
                n_edge_features=3 * ns,
                hidden_features=3 * ns,
                num_groups=groups,
                dropout=c.dropout,
                batch_norm=c.batch_norm,
                residual=residual,
                tp_weights_layers=c.tp_weights_layers,
            )

        P, C = c.num_prot_emb_layers, c.num_conv_layers
        if not c.embed_also_ligand and P > 0:
            raise NotImplementedError("embed_also_ligand=False requires num_prot_emb_layers=0 (width mismatch)")
        self.rec_emb_layers = [conv(i, 4 if c.differentiate_convolutions else 1) for i in range(P)]
        self.lig_emb_layers = [conv(i, 1) for i in range(P)] if c.embed_also_ligand else []
        self.conv_layers = [
            conv(i, (3 if i == P + C - 1 else 9) if c.differentiate_convolutions else 1) for i in range(P, P + C)
        ]
        final_irreps = seq[min(P + C, 3)]

        if c.confidence_mode:
            if c.atom_confidence:
                self.atom_confidence_predictor = ConfidenceHead(
                    ns, c.atom_num_confidence_outputs + ns, c.confidence_dropout, not c.confidence_no_batchnorm
                )
            self.confidence_predictor = ConfidenceHead(
                ns, c.num_confidence_outputs, c.confidence_dropout, not c.confidence_no_batchnorm
            )
        else:
            self.center_distance_expansion = GaussianSmearing(0.0, c.center_max_distance, c.distance_embed_dim)
            self.center_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
            self.final_conv = TPConv(
                in_irreps=final_irreps, sh_irreps=sh,
                out_irreps="2x1o + 2x1e" if not c.odd_parity else "1x1o + 1x1e",
                n_edge_features=2 * ns, num_groups=1, dropout=c.dropout,
                batch_norm=c.batch_norm, residual=False,
            )
            self.tr_final_layer = FinalNormMLP(ns, c.dropout)
            self.rot_final_layer = FinalNormMLP(ns, c.dropout)
            if not c.no_torsion:
                self.final_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
                ftp = FullTensorProduct(sh, "1x2e")
                self.final_tp_tor = ftp
                self.tor_bond_conv = TPConv(
                    in_irreps=final_irreps, sh_irreps=str(ftp.irreps_out),
                    out_irreps=f"{ns}x0o + {ns}x0e" if not c.odd_parity else f"{ns}x0o",
                    n_edge_features=3 * ns, num_groups=1, dropout=c.dropout,
                    batch_norm=c.batch_norm, residual=False,
                )
                self.tor_final_layer = TorFinalMLP(ns, c.dropout)

    # ------------------------------------------------------------------ #

    def embed_receptor(self, batch: ComplexBatch, deterministic: bool = True, use_running_average: bool = True):
        """Joint residue+atom embedding phase (t-independent, cacheable)."""
        c = self.cfg
        ns = c.ns
        det, ura = deterministic, use_running_average

        rec_attr = self.rec_node_embedding(batch.rec_f[..., None], batch.rec_lm)
        atom_attr = self.atom_node_embedding(batch.atom_f)

        # rec kNN edges
        r_nbr_pos = gather_nodes(batch.rec_pos, batch.rec_nbr)
        r_vec = r_nbr_pos - batch.rec_pos[:, :, None, :]
        rec_edge_emb = self.rec_edge_embedding(
            self.rec_distance_expansion(jnp.linalg.norm(r_vec, axis=-1)), deterministic=det
        )
        rec_edge_sh = spherical_harmonics(c.sh_lmax, r_vec)

        # atom kNN edges
        a_nbr_pos = gather_nodes(batch.atom_pos, batch.atom_nbr)
        a_vec = a_nbr_pos - batch.atom_pos[:, :, None, :]
        atom_edge_emb = self.atom_edge_embedding(
            self.lig_distance_expansion(jnp.linalg.norm(a_vec, axis=-1)), deterministic=det
        )
        atom_edge_sh = spherical_harmonics(c.sh_lmax, a_vec)

        # atom -> its residue membership edges ([B, A])
        res_pos = jnp.take_along_axis(batch.rec_pos, batch.atom_res[..., None], axis=1)
        ar_vec = res_pos - batch.atom_pos  # atom -> residue
        ar_edge_emb = self.ar_edge_embedding(
            self.rec_distance_expansion(jnp.linalg.norm(ar_vec, axis=-1)), deterministic=det
        )
        ar_edge_sh = spherical_harmonics(c.sh_lmax, ar_vec)
        ar_edge_sh_rev = spherical_harmonics(c.sh_lmax, -ar_vec)

        N = batch.rec_pos.shape[1]
        A = batch.atom_pos.shape[1]

        for layer in self.rec_emb_layers:
            g = (0, 1, 2, 3) if c.differentiate_convolutions else (0, 0, 0, 0)
            rec_scal, atom_scal = rec_attr[..., :ns], atom_attr[..., :ns]

            # group 0: rec <- rec (fused in-kernel gather when sh_lmax=1)
            zero_sig = jnp.zeros((rec_attr.shape[0], ns), rec_attr.dtype)
            rec_sum, rec_cnt = layer.conv_rec(
                g[0], rec_attr, batch.rec_pos, batch.rec_nbr, rec_edge_emb, zero_sig,
                batch.rec_nbr_mask, sh_lmax=c.sh_lmax, deterministic=det,
            )

            # group 1: rec <- atom (reversed membership edges)
            res_scal = jnp.take_along_axis(rec_scal, batch.atom_res[..., None], axis=1)
            ea1 = jnp.concatenate([ar_edge_emb, res_scal, atom_scal], axis=-1)
            m1 = layer.messages(g[1], atom_attr, ar_edge_sh, ea1, batch.atom_mask, deterministic=det)
            s1, c1 = scatter_mean_to_nodes(m1, batch.atom_res, batch.atom_mask, N)
            rec_sum, rec_cnt = rec_sum + s1, rec_cnt + c1

            # group 2: atom <- atom (fused in-kernel gather when sh_lmax=1)
            atom_sum, atom_cnt = layer.conv_rec(
                g[2], atom_attr, batch.atom_pos, batch.atom_nbr, atom_edge_emb, zero_sig,
                batch.atom_nbr_mask, sh_lmax=c.sh_lmax, deterministic=det,
            )

            # group 3: atom <- rec (its residue)
            res_attr = jnp.take_along_axis(rec_attr, batch.atom_res[..., None], axis=1)
            ea3 = jnp.concatenate([ar_edge_emb, atom_scal, res_scal], axis=-1)
            m3 = layer.messages(g[3], res_attr, ar_edge_sh_rev, ea3, batch.atom_mask, deterministic=det)
            atom_sum = atom_sum + m3
            atom_cnt = atom_cnt + batch.atom_mask.astype(atom_cnt.dtype)

            rec_attr = layer.finalize(rec_attr, rec_sum, rec_cnt, batch.rec_mask, ura)
            atom_attr = layer.finalize(atom_attr, atom_sum, atom_cnt, batch.atom_mask, ura)

        return AtomRecCache(rec_attr, atom_attr, rec_edge_emb, rec_edge_sh, atom_edge_emb, atom_edge_sh, ar_edge_emb, ar_edge_sh)

    # ------------------------------------------------------------------ #

    def _lig_graph(self, batch, sigma_emb, deterministic):
        c = self.cfg
        pos = batch.lig_pos
        pair_mask, pair_d = radius_mask(pos, pos, c.lig_max_radius, batch.lig_mask, batch.lig_mask, exclude_self=True)
        pair_vec = pos[:, None, :, :] - pos[:, :, None, :]
        pair_sh = spherical_harmonics(c.sh_lmax, pair_vec)
        se = jnp.broadcast_to(sigma_emb[:, None, None, :], pair_d.shape + (sigma_emb.shape[-1],))
        zeros_bond = jnp.zeros(pair_d.shape + (c.in_lig_edge_features,))
        pair_emb = self.lig_edge_embedding(
            jnp.concatenate([zeros_bond, se, self.lig_distance_expansion(pair_d)], axis=-1), deterministic=deterministic
        )
        src, dst = batch.lig_edge_src, batch.lig_edge_dst
        p_src = jnp.take_along_axis(pos, src[..., None], axis=1)
        p_dst = jnp.take_along_axis(pos, dst[..., None], axis=1)
        bvec = p_dst - p_src
        bd = jnp.linalg.norm(bvec, axis=-1)
        bond_sh = spherical_harmonics(c.sh_lmax, bvec)
        se_b = jnp.broadcast_to(sigma_emb[:, None, :], bd.shape + (sigma_emb.shape[-1],))
        bond_emb = self.lig_edge_embedding(
            jnp.concatenate([batch.lig_edge_attr, se_b, self.lig_distance_expansion(bd)], axis=-1),
            deterministic=deterministic,
        )
        return dict(pair_mask=pair_mask, pair_sh=pair_sh, pair_emb=pair_emb, bond_sh=bond_sh, bond_emb=bond_emb)

    def _lig_conv(self, layer, group, lig_attr, g, batch, deterministic):
        ns = self.cfg.ns
        scal = lig_attr[..., :ns]
        L = scal.shape[1]
        pe = g["pair_emb"]
        eattr = jnp.concatenate(
            [
                pe,
                jnp.broadcast_to(scal[:, :, None, :], pe.shape[:-1] + (ns,)),
                jnp.broadcast_to(scal[:, None, :, :], pe.shape[:-1] + (ns,)),
            ],
            axis=-1,
        )
        msg_pair = layer.messages(group, lig_attr[:, None, :, :], g["pair_sh"], eattr, g["pair_mask"], deterministic=deterministic)
        sum_pair = jnp.sum(msg_pair, axis=2)
        cnt_pair = jnp.sum(g["pair_mask"], axis=2).astype(sum_pair.dtype)
        src, dst = batch.lig_edge_src, batch.lig_edge_dst
        sc_src = jnp.take_along_axis(scal, src[..., None], axis=1)
        sc_dst = jnp.take_along_axis(scal, dst[..., None], axis=1)
        sender = jnp.take_along_axis(lig_attr, dst[..., None], axis=1)
        eattr_b = jnp.concatenate([g["bond_emb"], sc_src, sc_dst], axis=-1)
        msg_b = layer.messages(group, sender, g["bond_sh"], eattr_b, batch.lig_edge_mask, deterministic=deterministic)
        sum_b, cnt_b = scatter_mean_to_nodes(msg_b, src, batch.lig_edge_mask, L)
        return sum_pair + sum_b, cnt_pair + cnt_b

    # ------------------------------------------------------------------ #

    def __call__(
        self,
        batch: ComplexBatch,
        rec_cache: Optional[AtomRecCache] = None,
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> ScoreOutput:
        c = self.cfg
        ns, nv = c.ns, c.nv
        B, L, _ = batch.lig_pos.shape
        N = batch.rec_pos.shape[1]
        A = batch.atom_pos.shape[1]
        det, ura = deterministic, use_running_average

        if not c.confidence_mode:
            tr_sigma, rot_sigma, tor_sigma = t_to_sigma(batch.t_tr, batch.t_rot, batch.t_tor, c.sigma)
        else:
            tr_sigma, rot_sigma, tor_sigma = batch.t_tr, batch.t_rot, batch.t_tor

        sigma_emb = self.timestep_emb(batch.t_tr)

        if rec_cache is None:
            rec_cache = self.embed_receptor(batch, det, ura)
        rec_sig = self.rec_sigma_embedding(sigma_emb, deterministic=det)
        rec_attr = rec_cache.rec_attr.at[..., :ns].add(rec_sig[:, None, :])
        atom_attr = rec_cache.atom_attr.at[..., :ns].add(rec_sig[:, None, :])
        ar_edge_emb = rec_cache.ar_edge_emb + rec_sig[:, None, :]
        ar_edge_sh = rec_cache.ar_edge_sh
        ar_edge_sh_rev = spherical_harmonics(
            c.sh_lmax, batch.atom_pos - jnp.take_along_axis(batch.rec_pos, batch.atom_res[..., None], axis=1)
        )

        # crop mask (fixed cutoff for the confidence model, reference :386-391)
        rec_mask_eff = batch.rec_mask
        atom_mask_eff = batch.atom_mask
        if c.crop_beyond is not None:
            d_lr = jnp.min(
                jnp.where(batch.lig_mask[:, :, None], pairwise_dist(batch.lig_pos, batch.rec_pos), 1e9), axis=1
            )
            cut = c.crop_beyond if c.confidence_mode else (tr_sigma * 3 + c.crop_beyond)[:, None]
            rec_mask_eff = batch.rec_mask & (d_lr < cut)
            res_kept = jnp.take_along_axis(rec_mask_eff, batch.atom_res, axis=1)
            atom_mask_eff = batch.atom_mask & res_kept

        # ligand embedding
        lig_attr = self.lig_node_embedding(
            batch.lig_f, jnp.broadcast_to(sigma_emb[:, None, :], (B, L, sigma_emb.shape[-1]))
        )
        g = self._lig_graph(batch, sigma_emb, det)
        for layer in self.lig_emb_layers:
            s, n = self._lig_conv(layer, 0, lig_attr, g, batch, det)
            lig_attr = layer.finalize(lig_attr, s, n, batch.lig_mask, ura)

        # cross neighbor lists
        cutoff = (tr_sigma * 3 + 20)[:, None, None] if c.dynamic_max_cross else c.cross_max_distance
        KC = c.effective_cross_cap(N)
        lr_idx, lr_mask, lr_d = topk_neighbors(batch.lig_pos, batch.rec_pos, cutoff, batch.lig_mask, rec_mask_eff, KC)
        lr_pos = gather_nodes(batch.rec_pos, lr_idx)
        lr_vec = lr_pos - batch.lig_pos[:, :, None, :]
        lr_sh = spherical_harmonics(c.sh_lmax, lr_vec)
        lr_sh_rev = spherical_harmonics(c.sh_lmax, -lr_vec)
        se_c = jnp.broadcast_to(sigma_emb[:, None, None, :], lr_d.shape + (sigma_emb.shape[-1],))
        lr_emb = self.lr_edge_embedding(
            jnp.concatenate([se_c, self.cross_distance_expansion(lr_d)], axis=-1), deterministic=det
        )

        KCA = min(A, c.atom_cross_cap)
        la_idx, la_mask, la_d = topk_neighbors(
            batch.lig_pos, batch.atom_pos, c.lig_max_radius, batch.lig_mask, atom_mask_eff, KCA
        )
        la_pos = gather_nodes(batch.atom_pos, la_idx)
        la_vec = la_pos - batch.lig_pos[:, :, None, :]
        la_sh = spherical_harmonics(c.sh_lmax, la_vec)
        la_sh_rev = spherical_harmonics(c.sh_lmax, -la_vec)
        se_a = jnp.broadcast_to(sigma_emb[:, None, None, :], la_d.shape + (sigma_emb.shape[-1],))
        la_emb = self.la_edge_embedding(
            jnp.concatenate([se_a, self.lig_distance_expansion(la_d)], axis=-1), deterministic=det
        )

        n_layers = len(self.conv_layers)
        for li, layer in enumerate(self.conv_layers):
            last = li == n_layers - 1
            lig_scal, rec_scal, atom_scal = lig_attr[..., :ns], rec_attr[..., :ns], atom_attr[..., :ns]
            if c.differentiate_convolutions:
                G = dict(lig=0, lr=1, la=2, rec=3, rl=4, ra=5, atom=6, al=7, ar=8)
            else:
                G = dict(lig=0, lr=0, la=0, rec=0, rl=0, ra=0, atom=0, al=0, ar=0)

            # ---- ligand receives
            lig_sum, lig_cnt = self._lig_conv(layer, G["lig"], lig_attr, g, batch, det)

            # lig <- rec and lig <- atom cross groups through conv_cross so
            # the fused gather kernels (ladder1 or the generalized lmax=2
            # variant) apply; the XLA fallback is semantically identical to
            # the explicit gather + messages composition.
            s_, c_ = layer.conv_cross(
                G["lr"], lig_attr, batch.lig_pos, rec_attr, batch.rec_pos,
                lr_idx, lr_emb, lr_mask, sh_lmax=c.sh_lmax, deterministic=det, ns=ns,
            )
            lig_sum = lig_sum + s_
            lig_cnt = lig_cnt + c_
            s_, c_ = layer.conv_cross(
                G["la"], lig_attr, batch.lig_pos, atom_attr, batch.atom_pos,
                la_idx, la_emb, la_mask, sh_lmax=c.sh_lmax, deterministic=det, ns=ns,
            )
            lig_sum = lig_sum + s_
            lig_cnt = lig_cnt + c_

            if not last:
                lr_sender = gather_nodes(rec_attr, lr_idx)
                la_sender = gather_nodes(atom_attr, la_idx)
                # ---- receptor receives (fused in-kernel gather when sh_lmax=1)
                rec_sum, rec_cnt = layer.conv_rec(
                    G["rec"], rec_attr, batch.rec_pos, batch.rec_nbr,
                    rec_cache.rec_edge_emb, rec_sig, batch.rec_nbr_mask,
                    sh_lmax=c.sh_lmax, deterministic=det,
                )

                # rec <- lig (reversed lr)
                ea = jnp.concatenate(
                    [lr_emb, lr_sender[..., :ns], jnp.broadcast_to(lig_scal[:, :, None, :], lr_emb.shape[:-1] + (ns,))], axis=-1
                )
                lig_bc = jnp.broadcast_to(lig_attr[:, :, None, :], lr_emb.shape[:-1] + (lig_attr.shape[-1],))
                m_rl = layer.messages(G["rl"], lig_bc, lr_sh_rev, ea, lr_mask, deterministic=det)
                D = m_rl.shape[-1]
                s_, c_ = scatter_mean_to_nodes(m_rl.reshape(B, -1, D), lr_idx.reshape(B, -1), lr_mask.reshape(B, -1), N)
                rec_sum, rec_cnt = rec_sum + s_, rec_cnt + c_

                # rec <- atom (reversed ar membership)
                res_scal = jnp.take_along_axis(rec_scal, batch.atom_res[..., None], axis=1)
                ea = jnp.concatenate([ar_edge_emb, res_scal, atom_scal], axis=-1)
                m_ra = layer.messages(G["ra"], atom_attr, ar_edge_sh, ea, atom_mask_eff, deterministic=det)
                s_, c_ = scatter_mean_to_nodes(m_ra, batch.atom_res, atom_mask_eff, N)
                rec_sum, rec_cnt = rec_sum + s_, rec_cnt + c_

                # ---- atoms receive (fused in-kernel gather when sh_lmax=1)
                atom_sum, atom_cnt = layer.conv_rec(
                    G["atom"], atom_attr, batch.atom_pos, batch.atom_nbr,
                    rec_cache.atom_edge_emb, rec_sig, batch.atom_nbr_mask,
                    sh_lmax=c.sh_lmax, deterministic=det,
                )

                # atom <- lig (reversed la)
                ea = jnp.concatenate(
                    [la_emb, la_sender[..., :ns], jnp.broadcast_to(lig_scal[:, :, None, :], la_emb.shape[:-1] + (ns,))], axis=-1
                )
                lig_bc = jnp.broadcast_to(lig_attr[:, :, None, :], la_emb.shape[:-1] + (lig_attr.shape[-1],))
                m_al = layer.messages(G["al"], lig_bc, la_sh_rev, ea, la_mask, deterministic=det)
                D = m_al.shape[-1]
                s_, c_ = scatter_mean_to_nodes(m_al.reshape(B, -1, D), la_idx.reshape(B, -1), la_mask.reshape(B, -1), A)
                atom_sum, atom_cnt = atom_sum + s_, atom_cnt + c_

                # atom <- rec (its residue)
                res_attr = jnp.take_along_axis(rec_attr, batch.atom_res[..., None], axis=1)
                ea = jnp.concatenate([ar_edge_emb, atom_scal, res_scal], axis=-1)
                m_ar = layer.messages(G["ar"], res_attr, ar_edge_sh_rev, ea, atom_mask_eff, deterministic=det)
                atom_sum = atom_sum + m_ar
                atom_cnt = atom_cnt + atom_mask_eff.astype(atom_cnt.dtype)

                new_lig = layer.finalize(lig_attr, lig_sum, lig_cnt, batch.lig_mask, ura)
                new_rec = layer.finalize(rec_attr, rec_sum, rec_cnt, batch.rec_mask, ura)
                new_atom = layer.finalize(atom_attr, atom_sum, atom_cnt, batch.atom_mask, ura)
                lig_attr, rec_attr, atom_attr = new_lig, new_rec, new_atom
            else:
                lig_attr = layer.finalize(lig_attr, lig_sum, lig_cnt, batch.lig_mask, ura)

        # ---- heads (identical to the CG model)
        if c.confidence_mode:
            scal = jnp.concatenate(
                [lig_attr[..., :ns], lig_attr[..., -(nv if c.reduce_pseudoscalars else ns):]], axis=-1
            ) if c.num_conv_layers + c.num_prot_emb_layers >= 3 else lig_attr[..., :ns]
            atom_conf = None
            if c.atom_confidence:
                out = self.atom_confidence_predictor(scal, batch.lig_mask, det, ura)
                atom_conf = out[..., : c.atom_num_confidence_outputs]
                scal = out[..., c.atom_num_confidence_outputs :]
            m = batch.lig_mask.astype(scal.dtype)[..., None]
            pooled = jnp.sum(scal * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
            conf = self.confidence_predictor(pooled, None, det, ura)
            if c.num_confidence_outputs == 1:
                conf = conf[..., 0]
            return ScoreOutput(None, None, None, confidence=conf, atom_confidence=atom_conf)

        m = batch.lig_mask.astype(lig_attr.dtype)[..., None]
        center = jnp.sum(batch.lig_pos * m, axis=1, keepdims=True) / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        cvec = batch.lig_pos - center
        cd = jnp.linalg.norm(cvec, axis=-1)
        csh = spherical_harmonics(c.sh_lmax, cvec)
        se_l = jnp.broadcast_to(sigma_emb[:, None, :], cd.shape + (sigma_emb.shape[-1],))
        cattr = self.center_edge_embedding(
            jnp.concatenate([self.center_distance_expansion(cd), se_l], axis=-1), deterministic=det
        )
        cattr = jnp.concatenate([cattr, lig_attr[..., :ns]], axis=-1)
        msg_c = self.final_conv.messages(0, lig_attr, csh, cattr, batch.lig_mask, deterministic=det)
        cnt_c = jnp.sum(batch.lig_mask, axis=1).astype(msg_c.dtype)
        global_pred = self.final_conv.finalize(
            jnp.zeros((B, 12 if not c.odd_parity else 6)), jnp.sum(msg_c, axis=1), cnt_c, jnp.ones((B,), dtype=bool), ura
        )
        if c.odd_parity:
            tr_pred, rot_pred = global_pred[:, :3], global_pred[:, 3:6]
        else:
            tr_pred = global_pred[:, :3] + global_pred[:, 6:9]
            rot_pred = global_pred[:, 3:6] + global_pred[:, 9:12]
        tr_norm = jnp.linalg.norm(tr_pred, axis=1, keepdims=True)
        tr_pred = tr_pred / (tr_norm + 1e-12) * self.tr_final_layer(tr_norm, sigma_emb, det)
        rot_norm = jnp.linalg.norm(rot_pred, axis=1, keepdims=True)
        rot_pred = rot_pred / (rot_norm + 1e-12) * self.rot_final_layer(rot_norm, sigma_emb, det)
        if c.scale_by_sigma:
            tr_pred = tr_pred / tr_sigma[:, None]
            rot_pred = rot_pred * so3.score_norm(rot_sigma)[:, None]

        if c.no_torsion:
            return ScoreOutput(tr_pred, rot_pred, jnp.zeros((B, batch.tor_src.shape[1])))

        R = batch.tor_src.shape[1]
        pu = jnp.take_along_axis(batch.lig_pos, batch.tor_src[..., None], axis=1)
        pv = jnp.take_along_axis(batch.lig_pos, batch.tor_dst[..., None], axis=1)
        bond_pos = (pu + pv) / 2
        bond_vec = pv - pu
        tb_mask, tb_d = radius_mask(bond_pos, batch.lig_pos, c.lig_max_radius, batch.tor_mask, batch.lig_mask)
        tb_vec = batch.lig_pos[:, None, :, :] - bond_pos[:, :, None, :]
        tb_sh0 = spherical_harmonics(c.sh_lmax, tb_vec)
        bond_sh2 = spherical_harmonics(2, bond_vec)[..., 4:]
        tb_sh = self.final_tp_tor(tb_sh0, jnp.broadcast_to(bond_sh2[:, :, None, :], tb_sh0.shape[:-1] + (5,)))
        tb_emb = self.final_edge_embedding(self.lig_distance_expansion(tb_d), deterministic=det)
        tor_bond_attr = jnp.take_along_axis(lig_attr, batch.tor_src[..., None], axis=1) + jnp.take_along_axis(
            lig_attr, batch.tor_dst[..., None], axis=1
        )
        eattr_t = jnp.concatenate(
            [
                tb_emb,
                jnp.broadcast_to(lig_attr[:, None, :, : self.cfg.ns], tb_emb.shape[:-1] + (ns,)),
                jnp.broadcast_to(tor_bond_attr[:, :, None, :ns], tb_emb.shape[:-1] + (ns,)),
            ],
            axis=-1,
        )
        sender_t = jnp.broadcast_to(lig_attr[:, None, :, :], tb_emb.shape[:-1] + (lig_attr.shape[-1],))
        msg_t = self.tor_bond_conv.messages(0, sender_t, tb_sh, eattr_t, tb_mask, deterministic=det)
        cnt_t = jnp.sum(tb_mask, axis=2).astype(msg_t.dtype)
        tor_feat = self.tor_bond_conv.finalize(
            jnp.zeros((B, R, msg_t.shape[-1])), jnp.sum(msg_t, axis=2), cnt_t, batch.tor_mask, ura
        )
        tor_pred = self.tor_final_layer(tor_feat, det)[..., 0]
        if c.scale_by_sigma:
            tor_pred = tor_pred * jnp.sqrt(torus.score_norm(tor_sigma))[:, None]
        tor_pred = jnp.where(batch.tor_mask, tor_pred, 0.0)
        return ScoreOutput(tr_pred, rot_pred, tor_pred)
