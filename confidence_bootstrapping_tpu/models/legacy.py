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
from ..data.vocab import LIG_FEATURE_DIMS, REC_ATOM_FEATURE_DIMS, REC_RESIDUE_FEATURE_DIMS
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
    """The reference's non-old AtomEncoder (old_score_model.py:53-80): one
    joint Dense over [emb | scalars | lm] — scalars and LM features merge
    through a SINGLE ``additional_features_embedder`` linear (unlike
    OldAtomEncoder's separate add + merge layers)."""

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
        if self.n_scalar + self.lm_dim > 0:
            extras = [x for x in (x_scalar, x_lm) if x is not None]
            emb = nn.Dense(self.emb_dim)(jnp.concatenate([emb, *extras], axis=-1))
        return emb


def _smooth_weight(d, cutoff, enabled: bool):
    if not enabled:
        return None
    x = jnp.clip(d * np.pi / cutoff, a_max=np.pi)
    return 0.5 * (jnp.cos(x) + 1.0)


# pose-feature aggregators over the parallel axis for affinity prediction
# (reference old_all_atom_score_model.py:13-16; std is torch.std = ddof 1)
_AGGREGATORS = {
    "mean": lambda x: jnp.mean(x, axis=1),
    "max": lambda x: jnp.max(x, axis=1),
    "min": lambda x: jnp.min(x, axis=1),
    "std": lambda x: jnp.std(x, axis=1, ddof=1),
}


def _setup_confidence_head(model):
    """Confidence (+ optional affinity) heads shared by both old models
    (reference old_all_atom_score_model.py:117-150)."""
    c = model.cfg
    if c.parallel > 1:
        assert c.affinity_prediction, "parallel > 1 requires affinity_prediction"
        out_dim = 1 + c.ns  # [filtering | pose features for affinity]
        model.affinity_predictor = ConfidenceHead(
            c.ns, 1, c.confidence_dropout, not c.confidence_no_batchnorm
        )
    else:
        out_dim = c.num_confidence_outputs + (1 if c.affinity_prediction else 0)
    model.confidence_predictor = ConfidenceHead(
        c.ns, out_dim, c.confidence_dropout, not c.confidence_no_batchnorm
    )


def _sigma_embedding(model, batch):
    if model.cfg.separate_noise_schedule:
        return jnp.concatenate(
            [model.timestep_emb(t) for t in (batch.t_tr, batch.t_rot, batch.t_tor)], axis=-1
        )
    return model.timestep_emb(batch.t_tr)


def _build_lig_graph_old(model, batch, se, det):
    """Dense radius pairs + bond edges for the ligand graph (reference
    old_all_atom_score_model.py:354-394): one shared edge MLP over
    [bond-features | sigma | distance]."""
    c = model.cfg
    L = batch.lig_pos.shape[1]
    pair_d = pairwise_dist(batch.lig_pos, batch.lig_pos)
    eye = jnp.eye(L, dtype=bool)[None]
    pair_mask = (
        (pair_d < c.lig_max_radius)
        & batch.lig_mask[:, :, None] & batch.lig_mask[:, None, :] & ~eye
    )
    pair_vec = batch.lig_pos[:, None, :, :] - batch.lig_pos[:, :, None, :]
    pair_sh = spherical_harmonics(c.sh_lmax, pair_vec)
    zeros_bond = jnp.zeros(pair_d.shape + (c.in_lig_edge_features,))
    pair_emb = model.lig_edge_embedding(
        jnp.concatenate([zeros_bond, se(pair_d.shape + (1,)), model.lig_distance_expansion(pair_d)], -1),
        deterministic=det,
    )
    pair_w = _smooth_weight(pair_d, c.lig_max_radius, c.smooth_edges)

    src, dst = batch.lig_edge_src, batch.lig_edge_dst
    p_src = jnp.take_along_axis(batch.lig_pos, src[..., None], axis=1)
    p_dst = jnp.take_along_axis(batch.lig_pos, dst[..., None], axis=1)
    bvec = p_dst - p_src
    bd = jnp.linalg.norm(bvec, axis=-1)
    bond_sh = spherical_harmonics(c.sh_lmax, bvec)
    bond_emb = model.lig_edge_embedding(
        jnp.concatenate([batch.lig_edge_attr, se(bd.shape + (1,)), model.lig_distance_expansion(bd)], -1),
        deterministic=det,
    )
    bond_w = _smooth_weight(bd, c.lig_max_radius, c.smooth_edges)
    return dict(
        pair_mask=pair_mask, pair_sh=pair_sh, pair_emb=pair_emb, pair_w=pair_w,
        bond_sh=bond_sh, bond_emb=bond_emb, bond_w=bond_w,
    )


def _lig_intra_update(layer, lig_attr, g, batch, ns, det, ura):
    """lig <- lig group (pairs + bonds) through one conv layer, finalized
    with residual=False (the old models apply residuals manually)."""
    L = lig_attr.shape[1]
    lig_scal = lig_attr[..., :ns]
    pe = g["pair_emb"]
    ea_p = jnp.concatenate(
        [pe,
         jnp.broadcast_to(lig_scal[:, :, None, :], pe.shape[:-1] + (ns,)),
         jnp.broadcast_to(lig_scal[:, None, :, :], pe.shape[:-1] + (ns,))], -1)
    sender_p = jnp.broadcast_to(lig_attr[:, None, :, :], pe.shape[:-1] + (lig_attr.shape[-1],))
    msg_p = layer.messages(0, sender_p, g["pair_sh"], ea_p, g["pair_mask"], edge_weight=g["pair_w"], deterministic=det)
    src, dst = batch.lig_edge_src, batch.lig_edge_dst
    sc_src = jnp.take_along_axis(lig_scal, src[..., None], axis=1)
    sender_b = jnp.take_along_axis(lig_attr, dst[..., None], axis=1)
    ea_b = jnp.concatenate([g["bond_emb"], sc_src, sender_b[..., :ns]], -1)
    msg_b = layer.messages(0, sender_b, g["bond_sh"], ea_b, batch.lig_edge_mask, edge_weight=g["bond_w"], deterministic=det)
    s_b, c_b = scatter_mean_to_nodes(msg_b, src, batch.lig_edge_mask, L)
    return layer.finalize(
        0.0, jnp.sum(msg_p, axis=2) + s_b,
        jnp.sum(g["pair_mask"], -1).astype(jnp.float32) + c_b, batch.lig_mask, ura)


def _setup_score_heads(model, sh: str, final_irreps: str):
    """Center-conv + tr/rot/tor head modules shared by both old models
    (reference old_all_atom_score_model.py:152-198)."""
    c = model.cfg
    ns = c.ns
    model.center_distance_expansion = GaussianSmearing(0.0, c.center_max_distance, c.distance_embed_dim)
    model.center_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
    model.final_conv = TPConv(
        in_irreps=final_irreps,
        sh_irreps=sh,
        out_irreps="2x1o + 2x1e" if not c.odd_parity else "1x1o + 1x1e",
        n_edge_features=2 * ns,
        num_groups=1,
        dropout=c.dropout,
        batch_norm=c.batch_norm,
        residual=False,
    )
    model.tr_final_layer = FinalNormMLP(ns, c.dropout)
    model.rot_final_layer = FinalNormMLP(ns, c.dropout)
    if not c.no_torsion:
        model.final_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        ftp = FullTensorProduct(sh, "1x2e")
        model.final_tp_tor = ftp
        model.tor_bond_conv = TPConv(
            in_irreps=final_irreps,
            sh_irreps=str(ftp.irreps_out),
            out_irreps=f"{ns}x0o + {ns}x0e" if not c.odd_parity else f"{ns}x0o",
            n_edge_features=3 * ns,
            num_groups=1,
            dropout=c.dropout,
            batch_norm=c.batch_norm,
            residual=False,
        )
        model.tor_final_layer = TorFinalMLP(ns, c.dropout)


def _confidence_output(model, lig_attr, batch, det, ura) -> "ScoreOutput":
    """Pool ligand scalars -> confidence head; with parallel > 1, split the
    head output into per-pose filtering logits and aggregate the pose
    features into one affinity per group of `parallel` consecutive batch
    elements (reference old_all_atom_score_model.py:281-293 — there the
    pose axis is batch_parallel; here the batch axis IS the pose axis)."""
    c = model.cfg
    ns = c.ns
    scal = (
        jnp.concatenate([lig_attr[..., :ns], lig_attr[..., -ns:]], axis=-1)
        if c.num_conv_layers >= 3 else lig_attr[..., :ns]
    )
    m = batch.lig_mask.astype(scal.dtype)[..., None]
    pooled = jnp.sum(scal * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    conf = model.confidence_predictor(pooled, None, det, ura)
    if c.parallel > 1:
        P = c.parallel
        filtering = conf[:, 0].reshape(-1, P)
        pose_feat = conf[:, 1:].reshape(-1, P, ns)
        agg = jnp.concatenate(
            [_AGGREGATORS[a](pose_feat) for a in c.parallel_aggregators.split(" ")], axis=-1
        )
        affinity = model.affinity_predictor(agg, None, det, ura)[..., 0]
        return ScoreOutput(None, None, None, confidence=filtering, affinity=affinity)
    if c.num_confidence_outputs == 1 and not c.affinity_prediction:
        conf = conf[..., 0]
    return ScoreOutput(None, None, None, confidence=conf)


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
            _setup_confidence_head(self)
        else:
            _setup_score_heads(self, sh, final_irreps)

    # -------------------------------------------------------------- #

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
        sigma_emb = _sigma_embedding(self, batch)  # [B, sigma_dim]

        def se(shape):
            target = shape[:-1] + (self.sigma_dim,)
            x = sigma_emb.reshape((B,) + (1,) * (len(target) - 2) + (self.sigma_dim,))
            return jnp.broadcast_to(x, target)

        lig_attr = self.lig_node_embedding(batch.lig_f, se((B, L, 1)))
        lm = batch.rec_lm if c.lm_embedding_dim else None
        # no_aminoacid_identities zeros the receptor inputs (reference
        # old_all_atom_score_model.py:201-202; asserts no LM embedding)
        rec_f = batch.rec_f * 0 if c.no_aminoacid_identities else batch.rec_f
        rec_attr = self.rec_node_embedding(rec_f[..., None], se((B, N, 1)), lm)

        # ---- ligand graph: dense radius pairs + bond edges, one edge MLP
        lig_g = _build_lig_graph_old(self, batch, se, det)

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
        KC = c.effective_cross_cap(N)
        cr_idx, cr_mask, cr_d = topk_neighbors(batch.lig_pos, batch.rec_pos, cutoff, batch.lig_mask, batch.rec_mask, KC)
        cr_pos = gather_nodes(batch.rec_pos, cr_idx)
        cr_vec = cr_pos - batch.lig_pos[:, :, None, :]
        cr_sh = spherical_harmonics(c.sh_lmax, cr_vec)
        cr_emb = self.cross_edge_embedding(
            jnp.concatenate([se(cr_d.shape + (1,)), self.cross_distance_expansion(cr_d)], -1), deterministic=det
        )
        cr_w = _smooth_weight(cr_d, cutoff, c.smooth_edges)

        n_layers = len(self.lig_conv_layers)
        for l in range(n_layers):
            last = l == n_layers - 1
            lig_scal, rec_scal = lig_attr[..., :ns], rec_attr[..., :ns]

            # lig <- lig (pairs + bonds through lig_conv_layers[l])
            lig_intra = _lig_intra_update(self.lig_conv_layers[l], lig_attr, lig_g, batch, ns, det, ura)

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
                # reference's lig_to_rec_edge_attr_, old_score_model.py:374).
                # Quirk kept for converted-checkpoint parity: the reference
                # passes the UNreversed lr_edge_sh to the flipped conv
                # (old_score_model.py:370) — the odd-l sign is absorbed into
                # the trained weights, so we must match.
                layer = self.lig_to_rec_conv_layers[l]
                ea = jnp.concatenate(
                    [cr_emb, jnp.broadcast_to(lig_scal[:, :, None, :], cr_emb.shape[:-1] + (ns,)), cr_sender[..., :ns]], -1)
                lig_bc = jnp.broadcast_to(lig_attr[:, :, None, :], cr_emb.shape[:-1] + (lig_attr.shape[-1],))
                msg = layer.messages(0, lig_bc, cr_sh, ea, cr_mask, edge_weight=cr_w, deterministic=det)
                D = msg.shape[-1]
                s_rl, c_rl = scatter_mean_to_nodes(
                    msg.reshape(B, -1, D), cr_idx.reshape(B, -1), cr_mask.reshape(B, -1), N)
                rec_inter = layer.finalize(0.0, s_rl, c_rl, batch.rec_mask, ura)

            lig_attr = pad_residual(lig_attr, lig_intra.shape[-1]) + lig_intra + lig_inter
            if not last:
                rec_attr = pad_residual(rec_attr, rec_intra.shape[-1]) + rec_intra + rec_inter

        # ---- heads
        if c.confidence_mode:
            return _confidence_output(self, lig_attr, batch, det, ura)
        return _score_heads(self, batch, lig_attr, sigma_emb, tr_sigma, rot_sigma, tor_sigma, det, ura)


def _score_heads(model, batch, lig_attr, sigma_emb, tr_sigma, rot_sigma, tor_sigma, det, ura) -> "ScoreOutput":
    """tr/rot center conv + torsion head shared by both old models
    (reference old_all_atom_score_model.py:296-346)."""
    c = model.cfg
    ns = c.ns
    B, L, _ = batch.lig_pos.shape

    m = batch.lig_mask.astype(lig_attr.dtype)[..., None]
    center = jnp.sum(batch.lig_pos * m, axis=1, keepdims=True) / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    cvec = batch.lig_pos - center
    cd = jnp.linalg.norm(cvec, axis=-1)
    csh = spherical_harmonics(c.sh_lmax, cvec)
    se_c = jnp.broadcast_to(sigma_emb[:, None, :], cd.shape + (sigma_emb.shape[-1],))
    cattr = model.center_edge_embedding(
        jnp.concatenate([model.center_distance_expansion(cd), se_c], -1), deterministic=det
    )
    # fixed_center_conv picks the receiver-node scalars; the legacy
    # default (False) uses the sender's (reference :411-416)
    cattr = jnp.concatenate([cattr, lig_attr[..., :ns]], axis=-1)
    msg_c = model.final_conv.messages(0, lig_attr, csh, cattr, batch.lig_mask, deterministic=det)
    cnt_c = jnp.sum(batch.lig_mask, axis=1).astype(msg_c.dtype)
    global_pred = model.final_conv.finalize(
        jnp.zeros((B, 12 if not c.odd_parity else 6)), jnp.sum(msg_c, axis=1), cnt_c,
        jnp.ones((B,), dtype=bool), ura,
    )
    if c.odd_parity:
        tr_pred, rot_pred = global_pred[:, :3], global_pred[:, 3:6]
    else:
        tr_pred = global_pred[:, :3] + global_pred[:, 6:9]
        rot_pred = global_pred[:, 3:6] + global_pred[:, 9:12]

    tr_norm = jnp.linalg.norm(tr_pred, axis=1, keepdims=True)
    tr_pred = tr_pred / (tr_norm + 1e-12) * model.tr_final_layer(tr_norm, sigma_emb, det)
    rot_norm = jnp.linalg.norm(rot_pred, axis=1, keepdims=True)
    rot_pred = rot_pred / (rot_norm + 1e-12) * model.rot_final_layer(rot_norm, sigma_emb, det)
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
    tb_sh = model.final_tp_tor(tb_sh0, jnp.broadcast_to(bond_sh2[:, :, None, :], tb_sh0.shape[:-1] + (5,)))
    tb_emb = model.final_edge_embedding(model.lig_distance_expansion(tb_d), deterministic=det)
    tor_bond_attr = jnp.take_along_axis(lig_attr, batch.tor_src[..., None], axis=1) + jnp.take_along_axis(
        lig_attr, batch.tor_dst[..., None], axis=1
    )
    eattr_t = jnp.concatenate(
        [tb_emb,
         jnp.broadcast_to(lig_attr[:, None, :, :ns], tb_emb.shape[:-1] + (ns,)),
         jnp.broadcast_to(tor_bond_attr[:, :, None, :ns], tb_emb.shape[:-1] + (ns,))], -1)
    sender_t = jnp.broadcast_to(lig_attr[:, None, :, :], tb_emb.shape[:-1] + (lig_attr.shape[-1],))
    tb_w = _smooth_weight(tb_d, c.lig_max_radius, c.smooth_edges)
    msg_t = model.tor_bond_conv.messages(0, sender_t, tb_sh, eattr_t, tb_mask, edge_weight=tb_w, deterministic=det)
    cnt_t = jnp.sum(tb_mask, axis=2).astype(msg_t.dtype)
    tor_feat = model.tor_bond_conv.finalize(
        jnp.zeros((B, batch.tor_src.shape[1], msg_t.shape[-1])), jnp.sum(msg_t, axis=2), cnt_t, batch.tor_mask, ura
    )
    tor_pred = model.tor_final_layer(tor_feat, det)[..., 0]
    tor_pred = jnp.where(batch.tor_mask, tor_pred, 0.0)
    if c.scale_by_sigma:
        tor_pred = tor_pred * jnp.sqrt(torus.score_norm(tor_sigma))[:, None]
    return ScoreOutput(tr_pred, rot_pred, tor_pred)


class OldAllAtomScoreModel(nn.Module):
    """Legacy ALL-ATOM score/confidence/affinity model (the reference's
    ``models/old_all_atom_score_model.py``): three node types (ligand atoms,
    receptor residues, receptor atoms), NINE separate conv layers per depth
    — lig<-{lig,rec,atom} every layer, atom<-{atom,lig,rec} and
    rec<-{rec,lig,atom} on all but the last (reference :233-279) — with
    residual=False convs and manual ``pad + sum(updates)`` residuals.

    Fixed-shape mapping: lr/la cross edges are capped top-K neighbor lists
    per ligand atom (scattered back for the flipped rl/al groups); ar edges
    are one edge per atom to its own residue (the featurizer's
    atom->residue edge, reference datasets/process_mols.py builds
    ``('atom','receptor')`` the same way); atom<-atom uses the
    preprocessing kNN list. Reference quirks kept for converted-checkpoint
    parity: the flipped groups (al/rl/ra) reuse the UNreversed edge sh
    (:253-269), and la edge lengths go through the CROSS distance expansion
    despite the 5 A radius (:474). This is also the affinity architecture:
    with ``parallel > 1`` the confidence head emits [filtering | ns pose
    features] per pose and the affinity MLP aggregates over groups of
    `parallel` consecutive batch elements (:281-293)."""

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
        self.atom_node_embedding = enc(ns, REC_ATOM_FEATURE_DIMS, n_scalar=self.sigma_dim)
        self.lig_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.rec_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.atom_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.lr_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.ar_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.la_edge_embedding = FCBlock(ns, ns, 2, c.dropout)

        self.lig_distance_expansion = GaussianSmearing(0.0, c.lig_max_radius, c.distance_embed_dim)
        self.rec_distance_expansion = GaussianSmearing(0.0, c.rec_max_radius, c.distance_embed_dim)
        self.cross_distance_expansion = GaussianSmearing(0.0, c.cross_max_distance, c.cross_distance_embed_dim)

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
        # 9 groups per depth in the reference's conv_layers order
        # (old_all_atom_score_model.py:112-115): lig, lr, la, atom, al, ar,
        # rec, rl, ra. The last depth only instantiates the first three —
        # matching the reference's allocation would create params the
        # forward never touches (it allocates all 9 but uses 3).
        self.lig_conv_layers = [conv(i) for i in range(n)]
        self.lr_conv_layers = [conv(i) for i in range(n)]
        self.la_conv_layers = [conv(i) for i in range(n)]
        self.atom_conv_layers = [conv(i) for i in range(n - 1)]
        self.al_conv_layers = [conv(i) for i in range(n - 1)]
        self.ar_conv_layers = [conv(i) for i in range(n - 1)]
        self.rec_conv_layers = [conv(i) for i in range(n - 1)]
        self.rl_conv_layers = [conv(i) for i in range(n - 1)]
        self.ra_conv_layers = [conv(i) for i in range(n - 1)]
        final_irreps = seq[min(n, 3)]
        self.final_irreps = final_irreps

        if c.confidence_mode:
            _setup_confidence_head(self)
        else:
            _setup_score_heads(self, sh, final_irreps)

    # -------------------------------------------------------------- #

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
        A = batch.atom_pos.shape[1]

        if not c.confidence_mode:
            tr_sigma, rot_sigma, tor_sigma = t_to_sigma(batch.t_tr, batch.t_rot, batch.t_tor, c.sigma)
        else:
            tr_sigma, rot_sigma, tor_sigma = batch.t_tr, batch.t_rot, batch.t_tor
        sigma_emb = _sigma_embedding(self, batch)

        def se(shape):
            target = shape[:-1] + (self.sigma_dim,)
            x = sigma_emb.reshape((B,) + (1,) * (len(target) - 2) + (self.sigma_dim,))
            return jnp.broadcast_to(x, target)

        lig_attr = self.lig_node_embedding(batch.lig_f, se((B, L, 1)))
        lm = batch.rec_lm if c.lm_embedding_dim else None
        rec_f = batch.rec_f * 0 if c.no_aminoacid_identities else batch.rec_f
        rec_attr = self.rec_node_embedding(rec_f[..., None], se((B, N, 1)), lm)
        atom_attr = self.atom_node_embedding(batch.atom_f, se((B, A, 1)))

        # ---- ligand graph (dense radius pairs + bonds)
        lig_g = _build_lig_graph_old(self, batch, se, det)

        # ---- receptor residue kNN graph (reference :396-421)
        r_nbr_pos = gather_nodes(batch.rec_pos, batch.rec_nbr)
        r_vec = r_nbr_pos - batch.rec_pos[:, :, None, :]
        r_d = jnp.linalg.norm(r_vec, axis=-1)
        rec_sh = spherical_harmonics(c.sh_lmax, r_vec)
        rec_emb = self.rec_edge_embedding(
            jnp.concatenate([se(r_d.shape + (1,)), self.rec_distance_expansion(r_d)], -1), deterministic=det
        )
        rec_w = _smooth_weight(r_d, c.rec_max_radius, c.smooth_edges)

        # ---- receptor atom kNN graph (reference :423-444; lig-scale radius)
        a_nbr_pos = gather_nodes(batch.atom_pos, batch.atom_nbr)
        a_vec = a_nbr_pos - batch.atom_pos[:, :, None, :]
        a_d = jnp.linalg.norm(a_vec, axis=-1)
        atom_sh = spherical_harmonics(c.sh_lmax, a_vec)
        atom_emb = self.atom_edge_embedding(
            jnp.concatenate([se(a_d.shape + (1,)), self.lig_distance_expansion(a_d)], -1), deterministic=det
        )
        atom_w = _smooth_weight(a_d, c.lig_max_radius, c.smooth_edges)

        # ---- atom -> its residue edge (reference ('atom','receptor'))
        ar_res_pos = jnp.take_along_axis(batch.rec_pos, batch.atom_res[..., None], axis=1)
        ar_vec = ar_res_pos - batch.atom_pos
        ar_d = jnp.linalg.norm(ar_vec, axis=-1)
        ar_sh = spherical_harmonics(c.sh_lmax, ar_vec)
        ar_emb = self.ar_edge_embedding(
            jnp.concatenate([se(ar_d.shape + (1,)), self.rec_distance_expansion(ar_d)], -1), deterministic=det
        )
        # reference ar_edge_weight = 1 always (:487)

        # ---- lig <-> rec cross edges (dynamic sigma cutoff, capped top-K)
        cutoff = (tr_sigma * 3 + 20)[:, None, None] if c.dynamic_max_cross else c.cross_max_distance
        KC = c.effective_cross_cap(N)
        lr_idx, lr_mask, lr_d = topk_neighbors(batch.lig_pos, batch.rec_pos, cutoff, batch.lig_mask, batch.rec_mask, KC)
        lr_pos = gather_nodes(batch.rec_pos, lr_idx)
        lr_vec = lr_pos - batch.lig_pos[:, :, None, :]
        lr_sh = spherical_harmonics(c.sh_lmax, lr_vec)
        lr_emb = self.lr_edge_embedding(
            jnp.concatenate([se(lr_d.shape + (1,)), self.cross_distance_expansion(lr_d)], -1), deterministic=det
        )
        lr_w = _smooth_weight(lr_d, cutoff, c.smooth_edges)

        # ---- lig <-> atom cross edges (5 A radius, CROSS dist expansion)
        KCA = min(A, c.atom_cross_cap)
        la_idx, la_mask, la_d = topk_neighbors(
            batch.lig_pos, batch.atom_pos, c.lig_max_radius, batch.lig_mask, batch.atom_mask, KCA
        )
        la_pos = gather_nodes(batch.atom_pos, la_idx)
        la_vec = la_pos - batch.lig_pos[:, :, None, :]
        la_sh = spherical_harmonics(c.sh_lmax, la_vec)
        la_emb = self.la_edge_embedding(
            jnp.concatenate([se(la_d.shape + (1,)), self.cross_distance_expansion(la_d)], -1), deterministic=det
        )
        la_w = _smooth_weight(la_d, c.lig_max_radius, c.smooth_edges)

        atom_cnt = batch.atom_mask.astype(jnp.float32)

        n_layers = len(self.lig_conv_layers)
        for l in range(n_layers):
            last = l == n_layers - 1
            lig_scal, rec_scal, atom_scal = lig_attr[..., :ns], rec_attr[..., :ns], atom_attr[..., :ns]
            rec_scal_at_atom = jnp.take_along_axis(rec_scal, batch.atom_res[..., None], axis=1)

            # lig <- lig
            lig_intra = _lig_intra_update(self.lig_conv_layers[l], lig_attr, lig_g, batch, ns, det, ura)

            # lig <- rec  (eattr [emb | lig receiver | rec sender], :238)
            layer = self.lr_conv_layers[l]
            lr_sender = gather_nodes(rec_attr, lr_idx)
            ea = jnp.concatenate(
                [lr_emb, jnp.broadcast_to(lig_scal[:, :, None, :], lr_emb.shape[:-1] + (ns,)), lr_sender[..., :ns]], -1)
            msg = layer.messages(0, lr_sender, lr_sh, ea, lr_mask, edge_weight=lr_w, deterministic=det)
            lig_rec = layer.finalize(
                0.0, jnp.sum(msg, axis=2), jnp.sum(lr_mask, -1).astype(jnp.float32), batch.lig_mask, ura)

            # lig <- atom (:242)
            layer = self.la_conv_layers[l]
            la_sender = gather_nodes(atom_attr, la_idx)
            ea = jnp.concatenate(
                [la_emb, jnp.broadcast_to(lig_scal[:, :, None, :], la_emb.shape[:-1] + (ns,)), la_sender[..., :ns]], -1)
            msg = layer.messages(0, la_sender, la_sh, ea, la_mask, edge_weight=la_w, deterministic=det)
            lig_atom = layer.finalize(
                0.0, jnp.sum(msg, axis=2), jnp.sum(la_mask, -1).astype(jnp.float32), batch.lig_mask, ura)

            if not last:
                # atom <- atom (:249)
                layer = self.atom_conv_layers[l]
                a_sender = gather_nodes(atom_attr, batch.atom_nbr)
                ea = jnp.concatenate(
                    [atom_emb, jnp.broadcast_to(atom_scal[:, :, None, :], atom_emb.shape[:-1] + (ns,)), a_sender[..., :ns]], -1)
                msg = layer.messages(0, a_sender, atom_sh, ea, batch.atom_nbr_mask, edge_weight=atom_w, deterministic=det)
                atom_intra = layer.finalize(
                    0.0, jnp.sum(msg, axis=2), jnp.sum(batch.atom_nbr_mask, -1).astype(jnp.float32),
                    batch.atom_mask, ura)

                # atom <- lig (flipped la edges; UNreversed la sh, :252-254)
                layer = self.al_conv_layers[l]
                ea = jnp.concatenate(
                    [la_emb, la_sender[..., :ns], jnp.broadcast_to(lig_scal[:, :, None, :], la_emb.shape[:-1] + (ns,))], -1)
                lig_bc = jnp.broadcast_to(lig_attr[:, :, None, :], la_emb.shape[:-1] + (lig_attr.shape[-1],))
                msg = layer.messages(0, lig_bc, la_sh, ea, la_mask, edge_weight=la_w, deterministic=det)
                D = msg.shape[-1]
                s_al, c_al = scatter_mean_to_nodes(
                    msg.reshape(B, -1, D), la_idx.reshape(B, -1), la_mask.reshape(B, -1), A)
                atom_lig = layer.finalize(0.0, s_al, c_al, batch.atom_mask, ura)

                # atom <- rec (its residue; :256-257)
                layer = self.ar_conv_layers[l]
                rec_at_atom = jnp.take_along_axis(rec_attr, batch.atom_res[..., None], axis=1)
                ea = jnp.concatenate([ar_emb, atom_scal, rec_scal_at_atom], -1)
                msg = layer.messages(0, rec_at_atom, ar_sh, ea, batch.atom_mask, deterministic=det)
                atom_rec = layer.finalize(0.0, msg, atom_cnt, batch.atom_mask, ura)

                # rec <- rec (:260-261)
                layer = self.rec_conv_layers[l]
                r_sender = gather_nodes(rec_attr, batch.rec_nbr)
                ea = jnp.concatenate(
                    [rec_emb, jnp.broadcast_to(rec_scal[:, :, None, :], rec_emb.shape[:-1] + (ns,)), r_sender[..., :ns]], -1)
                msg = layer.messages(0, r_sender, rec_sh, ea, batch.rec_nbr_mask, edge_weight=rec_w, deterministic=det)
                rec_intra = layer.finalize(
                    0.0, jnp.sum(msg, axis=2), jnp.sum(batch.rec_nbr_mask, -1).astype(jnp.float32),
                    batch.rec_mask, ura)

                # rec <- lig (flipped lr edges; UNreversed lr sh, :263-265)
                layer = self.rl_conv_layers[l]
                ea = jnp.concatenate(
                    [lr_emb, lr_sender[..., :ns], jnp.broadcast_to(lig_scal[:, :, None, :], lr_emb.shape[:-1] + (ns,))], -1)
                lig_bc = jnp.broadcast_to(lig_attr[:, :, None, :], lr_emb.shape[:-1] + (lig_attr.shape[-1],))
                msg = layer.messages(0, lig_bc, lr_sh, ea, lr_mask, edge_weight=lr_w, deterministic=det)
                D = msg.shape[-1]
                s_rl, c_rl = scatter_mean_to_nodes(
                    msg.reshape(B, -1, D), lr_idx.reshape(B, -1), lr_mask.reshape(B, -1), N)
                rec_lig = layer.finalize(0.0, s_rl, c_rl, batch.rec_mask, ura)

                # rec <- atom (flipped ar edges; UNreversed ar sh, :267-269)
                layer = self.ra_conv_layers[l]
                ea = jnp.concatenate([ar_emb, rec_scal_at_atom, atom_scal], -1)
                msg = layer.messages(0, atom_attr, ar_sh, ea, batch.atom_mask, deterministic=det)
                s_ra, c_ra = scatter_mean_to_nodes(msg, batch.atom_res, batch.atom_mask, N)
                rec_atom = layer.finalize(0.0, s_ra, c_ra, batch.rec_mask, ura)

            lig_attr = pad_residual(lig_attr, lig_intra.shape[-1]) + lig_intra + lig_atom + lig_rec
            if not last:
                atom_attr = pad_residual(atom_attr, atom_intra.shape[-1]) + atom_intra + atom_lig + atom_rec
                rec_attr = pad_residual(rec_attr, rec_intra.shape[-1]) + rec_intra + rec_atom + rec_lig

        # ---- heads
        if c.confidence_mode:
            return _confidence_output(self, lig_attr, batch, det, ura)
        return _score_heads(self, batch, lig_attr, sigma_emb, tr_sigma, rot_sigma, tor_sigma, det, ura)
