"""Legacy (pre-protein-embedding) score model — the reference's
``models/old_score_model.py`` architecture, selected by
``inference.py --old_score_model`` for the originally-published DiffDock
checkpoints.

Architectural differences from the modern model (models/score_model.py):

* no receptor/ligand embedding phase — the trunk convs start directly from
  the node embeddings (reference old_score_model.py:309-398);
* one SEPARATE TensorProductConvLayer per edge group per depth
  (lig/rec/lig->rec/rec->lig lists, :220-243), each with its own batch
  norm and residual=False; the residual is applied manually as
  ``pad(node) + sum(updates)`` (:389-398);
* sh_lmax defaults to 2 (:121);
* optional smooth edge weights 0.5*(cos(d*pi/cutoff)+1) (:462-468);
* separate_noise_schedule concatenates per-noise-type timestep embeddings
  (:470-476);
* OldAtomEncoder adds the scalar linear instead of folding scalars through
  a joint Dense (:16-52);
* confidence head pools ``[scal | last-ns scal]`` and runs the 3-layer MLP
  (:249-260, 404-407).

The containers, masking and capped neighbor lists are the same TPU-first
fixed-shape design as the modern model; the receptor graph uses the
featurizer's kNN lists (the reference builds a 30 A radius graph in
preprocessing — our kNN is the static-shape equivalent, SURVEY §7.3-2).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import ScoreModelConfig
from ..data.complex_graph import ComplexBatch
from ..data.vocab import LIG_FEATURE_DIMS, REC_RESIDUE_FEATURE_DIMS
from ..ops import so3, torus
from ..ops.graph_builders import gather_nodes, pairwise_dist, radius_mask, scatter_mean_to_nodes, topk_neighbors
from ..ops.irreps import FullTensorProduct, Irreps, spherical_harmonics, spherical_harmonics_irreps
from ..ops.schedules import get_timestep_embedding, t_to_sigma
from .layers import FCBlock, GaussianSmearing, TPConv, pad_residual
from .score_model import ConfidenceHead, FinalNormMLP, ScoreOutput, TorFinalMLP, get_irrep_seq


class OldAtomEncoder(nn.Module):
    """Reference OldAtomEncoder (old_score_model.py:16-52): categorical
    embeddings summed, the scalar block ADDED through its own linear, and
    an optional LM-embedding merge layer."""

    emb_dim: int
    feature_dims: Tuple[int, ...]
    n_scalar: int = 0
    lm_dim: int = 0

    @nn.compact
    def __call__(self, x_cat, x_scalar=None, x_lm=None):
        emb = 0.0
        for i, vocab in enumerate(self.feature_dims):
            table = nn.Embed(vocab, self.emb_dim, embedding_init=nn.initializers.xavier_uniform())
            emb = emb + table(jnp.clip(x_cat[..., i], 0, vocab - 1))
        if self.n_scalar > 0:
            emb = emb + nn.Dense(self.emb_dim)(x_scalar)
        if self.lm_dim > 0:
            emb = nn.Dense(self.emb_dim)(jnp.concatenate([emb, x_lm], axis=-1))
        return emb


class NewAtomEncoderLM(nn.Module):
    """The reference's non-old AtomEncoder with an LM merge layer: joint
    Dense over [emb | scalars], then Dense([out | lm]) when lm is given."""

    emb_dim: int
    feature_dims: Tuple[int, ...]
    n_scalar: int = 0
    lm_dim: int = 0

    @nn.compact
    def __call__(self, x_cat, x_scalar=None, x_lm=None):
        emb = 0.0
        for i, vocab in enumerate(self.feature_dims):
            table = nn.Embed(vocab, self.emb_dim, embedding_init=nn.initializers.xavier_uniform())
            emb = emb + table(jnp.clip(x_cat[..., i], 0, vocab - 1))
        if self.n_scalar > 0:
            emb = nn.Dense(self.emb_dim)(jnp.concatenate([emb, x_scalar], axis=-1))
        if self.lm_dim > 0:
            emb = nn.Dense(self.emb_dim)(jnp.concatenate([emb, x_lm], axis=-1))
        return emb


def _smooth_weight(d, cutoff, enabled: bool):
    if not enabled:
        return None
    x = jnp.clip(d * np.pi / cutoff, a_max=np.pi)
    return 0.5 * (jnp.cos(x) + 1.0)


class OldTensorProductScoreModel(nn.Module):
    cfg: ScoreModelConfig

    def setup(self):
        c = self.cfg
        ns, nv = c.ns, c.nv
        self.sigma_dim = c.sigma_embed_dim * (3 if c.separate_noise_schedule else 1)
        sh = str(spherical_harmonics_irreps(c.sh_lmax))
        self.timestep_emb = get_timestep_embedding(c.embedding_type, c.sigma_embed_dim, c.embedding_scale)

        enc = OldAtomEncoder if c.use_old_atom_encoder else NewAtomEncoderLM
        self.lig_node_embedding = enc(ns, LIG_FEATURE_DIMS, n_scalar=self.sigma_dim)
        self.rec_node_embedding = enc(
            ns, REC_RESIDUE_FEATURE_DIMS, n_scalar=self.sigma_dim, lm_dim=c.lm_embedding_dim
        )
        self.lig_edge_embedding = FCBlock(
            ns, ns, 2, c.dropout
        )  # in: bond one-hot + sigma + dist
        self.rec_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.cross_edge_embedding = FCBlock(ns, ns, 2, c.dropout)

        self.lig_distance_expansion = GaussianSmearing(0.0, c.lig_max_radius, c.distance_embed_dim)
        self.rec_distance_expansion = GaussianSmearing(0.0, c.rec_max_radius, c.distance_embed_dim)
        self.cross_distance_expansion = GaussianSmearing(0.0, c.cross_max_distance, c.cross_distance_embed_dim)

        # old models never reduce the pseudoscalar block (irrep_seq ends in
        # {ns}x0o, reference old_score_model.py:193-205)
        seq = get_irrep_seq(ns, nv, c.use_second_order_repr, reduce_pseudoscalars=False)
        self.irrep_seq = seq

        def conv(i):
            return TPConv(
                in_irreps=seq[min(i, 3)],
                sh_irreps=sh,
                out_irreps=seq[min(i + 1, 3)],
                n_edge_features=3 * ns,
                hidden_features=3 * ns,
                num_groups=1,
                dropout=c.dropout,
                batch_norm=c.batch_norm,
                residual=False,
            )

        n = c.num_conv_layers
        self.lig_conv_layers = [conv(i) for i in range(n)]
        self.rec_conv_layers = [conv(i) for i in range(n)]
        self.lig_to_rec_conv_layers = [conv(i) for i in range(n)]
        self.rec_to_lig_conv_layers = [conv(i) for i in range(n)]
        final_irreps = seq[min(n, 3)]
        self.final_irreps = final_irreps

        if c.confidence_mode:
            self.confidence_predictor = ConfidenceHead(
                ns, c.num_confidence_outputs + (1 if c.affinity_prediction else 0),
                c.confidence_dropout, not c.confidence_no_batchnorm,
            )
        else:
            self.center_distance_expansion = GaussianSmearing(0.0, c.center_max_distance, c.distance_embed_dim)
            self.center_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
            self.final_conv = TPConv(
                in_irreps=final_irreps,
                sh_irreps=sh,
                out_irreps="2x1o + 2x1e" if not c.odd_parity else "1x1o + 1x1e",
                n_edge_features=2 * ns,
                num_groups=1,
                dropout=c.dropout,
                batch_norm=c.batch_norm,
                residual=False,
            )
            self.tr_final_layer = FinalNormMLP(ns, c.dropout)
            self.rot_final_layer = FinalNormMLP(ns, c.dropout)
            if not c.no_torsion:
                self.final_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
                ftp = FullTensorProduct(sh, "1x2e")
                self.final_tp_tor = ftp
                self.tor_bond_conv = TPConv(
                    in_irreps=final_irreps,
                    sh_irreps=str(ftp.irreps_out),
                    out_irreps=f"{ns}x0o + {ns}x0e" if not c.odd_parity else f"{ns}x0o",
                    n_edge_features=3 * ns,
                    num_groups=1,
                    dropout=c.dropout,
                    batch_norm=c.batch_norm,
                    residual=False,
                )
                self.tor_final_layer = TorFinalMLP(ns, c.dropout)

    # -------------------------------------------------------------- #

    def _sigma_emb(self, batch):
        if self.cfg.separate_noise_schedule:
            return jnp.concatenate(
                [self.timestep_emb(t) for t in (batch.t_tr, batch.t_rot, batch.t_tor)], axis=-1
            )
        return self.timestep_emb(batch.t_tr)

    def __call__(
        self,
        batch: ComplexBatch,
        rec_cache=None,  # unused: the legacy arch has no cacheable phase
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> ScoreOutput:
        c = self.cfg
        ns = c.ns
        det, ura = deterministic, use_running_average
        B, L, _ = batch.lig_pos.shape
        N = batch.rec_pos.shape[1]

        if not c.confidence_mode:
            tr_sigma, rot_sigma, tor_sigma = t_to_sigma(batch.t_tr, batch.t_rot, batch.t_tor, c.sigma)
        else:
            tr_sigma, rot_sigma, tor_sigma = batch.t_tr, batch.t_rot, batch.t_tor
        sigma_emb = self._sigma_emb(batch)  # [B, sigma_dim]

        def se(shape):
            target = shape[:-1] + (self.sigma_dim,)
            x = sigma_emb.reshape((B,) + (1,) * (len(target) - 2) + (self.sigma_dim,))
            return jnp.broadcast_to(x, target)

        lig_attr = self.lig_node_embedding(batch.lig_f, se((B, L, 1)))
        lm = batch.rec_lm if c.lm_embedding_dim else None
        rec_attr = self.rec_node_embedding(batch.rec_f[..., None], se((B, N, 1)), lm)

        # ---- ligand graph: dense radius pairs + bond edges, one edge MLP
        pair_d = pairwise_dist(batch.lig_pos, batch.lig_pos)
        eye = jnp.eye(L, dtype=bool)[None]
        pair_mask = (
            (pair_d < c.lig_max_radius)
            & batch.lig_mask[:, :, None] & batch.lig_mask[:, None, :] & ~eye
        )
        pair_vec = batch.lig_pos[:, None, :, :] - batch.lig_pos[:, :, None, :]
        pair_sh = spherical_harmonics(c.sh_lmax, pair_vec)
        zeros_bond = jnp.zeros(pair_d.shape + (c.in_lig_edge_features,))
        pair_emb = self.lig_edge_embedding(
            jnp.concatenate([zeros_bond, se(pair_d.shape + (1,)), self.lig_distance_expansion(pair_d)], -1),
            deterministic=det,
        )
        pair_w = _smooth_weight(pair_d, c.lig_max_radius, c.smooth_edges)

        src, dst = batch.lig_edge_src, batch.lig_edge_dst
        p_src = jnp.take_along_axis(batch.lig_pos, src[..., None], axis=1)
        p_dst = jnp.take_along_axis(batch.lig_pos, dst[..., None], axis=1)
        bvec = p_dst - p_src
        bd = jnp.linalg.norm(bvec, axis=-1)
        bond_sh = spherical_harmonics(c.sh_lmax, bvec)
        bond_emb = self.lig_edge_embedding(
            jnp.concatenate([batch.lig_edge_attr, se(bd.shape + (1,)), self.lig_distance_expansion(bd)], -1),
            deterministic=det,
        )
        bond_w = _smooth_weight(bd, c.lig_max_radius, c.smooth_edges)

        # ---- receptor kNN graph (preprocessing-fixed, reference :517-528)
        r_nbr_pos = gather_nodes(batch.rec_pos, batch.rec_nbr)
        r_vec = r_nbr_pos - batch.rec_pos[:, :, None, :]
        r_d = jnp.linalg.norm(r_vec, axis=-1)
        rec_sh = spherical_harmonics(c.sh_lmax, r_vec)
        rec_emb = self.rec_edge_embedding(
            jnp.concatenate([se(r_d.shape + (1,)), self.rec_distance_expansion(r_d)], -1), deterministic=det
        )
        rec_w = _smooth_weight(r_d, c.rec_max_radius, c.smooth_edges)
        rec_nbr_mask = batch.rec_nbr_mask

        # ---- cross edges (dynamic sigma cutoff, capped top-K)
        cutoff = (tr_sigma * 3 + 20)[:, None, None] if c.dynamic_max_cross else c.cross_max_distance
        KC = min(N, c.cross_cap)
        cr_idx, cr_mask, cr_d = topk_neighbors(batch.lig_pos, batch.rec_pos, cutoff, batch.lig_mask, batch.rec_mask, KC)
        cr_pos = gather_nodes(batch.rec_pos, cr_idx)
        cr_vec = cr_pos - batch.lig_pos[:, :, None, :]
        cr_sh = spherical_harmonics(c.sh_lmax, cr_vec)
        cr_sh_rev = spherical_harmonics(c.sh_lmax, -cr_vec)
        cr_emb = self.cross_edge_embedding(
            jnp.concatenate([se(cr_d.shape + (1,)), self.cross_distance_expansion(cr_d)], -1), deterministic=det
        )
        cr_w = _smooth_weight(cr_d, c.cross_max_distance if not c.dynamic_max_cross else c.cross_max_distance, c.smooth_edges)

        n_layers = len(self.lig_conv_layers)
        for l in range(n_layers):
            last = l == n_layers - 1
            lig_scal, rec_scal = lig_attr[..., :ns], rec_attr[..., :ns]

            # lig <- lig (pairs + bonds through lig_conv_layers[l])
            layer = self.lig_conv_layers[l]
            ea_p = jnp.concatenate(
                [pair_emb,
                 jnp.broadcast_to(lig_scal[:, :, None, :], pair_emb.shape[:-1] + (ns,)),
                 jnp.broadcast_to(lig_scal[:, None, :, :], pair_emb.shape[:-1] + (ns,))], -1)
            sender_p = jnp.broadcast_to(lig_attr[:, None, :, :], pair_emb.shape[:-1] + (lig_attr.shape[-1],))
            msg_p = layer.messages(0, sender_p, pair_sh, ea_p, pair_mask, edge_weight=pair_w, deterministic=det)
            sc_src = jnp.take_along_axis(lig_scal, src[..., None], axis=1)
            sender_b = jnp.take_along_axis(lig_attr, dst[..., None], axis=1)
            ea_b = jnp.concatenate([bond_emb, sc_src, sender_b[..., :ns]], -1)
            msg_b = layer.messages(0, sender_b, bond_sh, ea_b, batch.lig_edge_mask, edge_weight=bond_w, deterministic=det)
            s_b, c_b = scatter_mean_to_nodes(msg_b, src, batch.lig_edge_mask, L)
            lig_intra = layer.finalize(
                0.0, jnp.sum(msg_p, axis=2) + s_b,
                jnp.sum(pair_mask, -1).astype(jnp.float32) + c_b, batch.lig_mask, ura)

            # lig <- rec (rec_to_lig_conv_layers[l]; eattr [emb, lig, rec])
            layer = self.rec_to_lig_conv_layers[l]
            cr_sender = gather_nodes(rec_attr, cr_idx)
            ea = jnp.concatenate(
                [cr_emb, jnp.broadcast_to(lig_scal[:, :, None, :], cr_emb.shape[:-1] + (ns,)), cr_sender[..., :ns]], -1)
            msg = layer.messages(0, cr_sender, cr_sh, ea, cr_mask, edge_weight=cr_w, deterministic=det)
            lig_inter = layer.finalize(
                0.0, jnp.sum(msg, axis=2), jnp.sum(cr_mask, -1).astype(jnp.float32), batch.lig_mask, ura)

            if not last:
                # rec <- rec
                layer = self.rec_conv_layers[l]
                r_sender = gather_nodes(rec_attr, batch.rec_nbr)
                ea = jnp.concatenate(
                    [rec_emb, jnp.broadcast_to(rec_scal[:, :, None, :], rec_emb.shape[:-1] + (ns,)), r_sender[..., :ns]], -1)
                msg = layer.messages(0, r_sender, rec_sh, ea, rec_nbr_mask, edge_weight=rec_w, deterministic=det)
                rec_intra = layer.finalize(
                    0.0, jnp.sum(msg, axis=2), jnp.sum(rec_nbr_mask, -1).astype(jnp.float32), batch.rec_mask, ura)

                # rec <- lig (flipped edges; eattr [emb, lig, rec] like the
                # reference's lig_to_rec_edge_attr_, old_score_model.py:374)
                layer = self.lig_to_rec_conv_layers[l]
                ea = jnp.concatenate(
                    [cr_emb, jnp.broadcast_to(lig_scal[:, :, None, :], cr_emb.shape[:-1] + (ns,)), cr_sender[..., :ns]], -1)
                lig_bc = jnp.broadcast_to(lig_attr[:, :, None, :], cr_emb.shape[:-1] + (lig_attr.shape[-1],))
                msg = layer.messages(0, lig_bc, cr_sh_rev, ea, cr_mask, edge_weight=cr_w, deterministic=det)
                D = msg.shape[-1]
                s_rl, c_rl = scatter_mean_to_nodes(
                    msg.reshape(B, -1, D), cr_idx.reshape(B, -1), cr_mask.reshape(B, -1), N)
                rec_inter = layer.finalize(0.0, s_rl, c_rl, batch.rec_mask, ura)

            lig_attr = pad_residual(lig_attr, lig_intra.shape[-1]) + lig_intra + lig_inter
            if not last:
                rec_attr = pad_residual(rec_attr, rec_intra.shape[-1]) + rec_intra + rec_inter

        # ---- heads
        if c.confidence_mode:
            scal = (
                jnp.concatenate([lig_attr[..., :ns], lig_attr[..., -ns:]], axis=-1)
                if c.num_conv_layers >= 3 else lig_attr[..., :ns]
            )
            m = batch.lig_mask.astype(scal.dtype)[..., None]
            pooled = jnp.sum(scal * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
            conf = self.confidence_predictor(pooled, None, det, ura)
            if c.num_confidence_outputs == 1 and not c.affinity_prediction:
                conf = conf[..., 0]
            return ScoreOutput(None, None, None, confidence=conf)

        m = batch.lig_mask.astype(lig_attr.dtype)[..., None]
        center = jnp.sum(batch.lig_pos * m, axis=1, keepdims=True) / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        cvec = batch.lig_pos - center
        cd = jnp.linalg.norm(cvec, axis=-1)
        csh = spherical_harmonics(c.sh_lmax, cvec)
        cattr = self.center_edge_embedding(
            jnp.concatenate([self.center_distance_expansion(cd), se(cd.shape + (1,))], -1), deterministic=det
        )
        # fixed_center_conv picks the receiver-node scalars; the legacy
        # default (False) uses the sender's (reference :411-416)
        cattr = jnp.concatenate([cattr, lig_attr[..., :ns]], axis=-1)
        msg_c = self.final_conv.messages(0, lig_attr, csh, cattr, batch.lig_mask, deterministic=det)
        cnt_c = jnp.sum(batch.lig_mask, axis=1).astype(msg_c.dtype)
        global_pred = self.final_conv.finalize(
            jnp.zeros((B, 12 if not c.odd_parity else 6)), jnp.sum(msg_c, axis=1), cnt_c,
            jnp.ones((B,), dtype=bool), ura,
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

        # ---- torsion head (reference :443-459)
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
            [tb_emb,
             jnp.broadcast_to(lig_attr[:, None, :, :ns], tb_emb.shape[:-1] + (ns,)),
             jnp.broadcast_to(tor_bond_attr[:, :, None, :ns], tb_emb.shape[:-1] + (ns,))], -1)
        sender_t = jnp.broadcast_to(lig_attr[:, None, :, :], tb_emb.shape[:-1] + (lig_attr.shape[-1],))
        tb_w = _smooth_weight(tb_d, c.lig_max_radius, c.smooth_edges)
        msg_t = self.tor_bond_conv.messages(0, sender_t, tb_sh, eattr_t, tb_mask, edge_weight=tb_w, deterministic=det)
        cnt_t = jnp.sum(tb_mask, axis=2).astype(msg_t.dtype)
        tor_feat = self.tor_bond_conv.finalize(
            jnp.zeros((B, batch.tor_src.shape[1], msg_t.shape[-1])), jnp.sum(msg_t, axis=2), cnt_t, batch.tor_mask, ura
        )
        tor_pred = self.tor_final_layer(tor_feat, det)[..., 0]
        tor_pred = jnp.where(batch.tor_mask, tor_pred, 0.0)
        if c.scale_by_sigma:
            tor_pred = tor_pred * jnp.sqrt(torus.score_norm(tor_sigma))[:, None]
        return ScoreOutput(tr_pred, rot_pred, tor_pred)
