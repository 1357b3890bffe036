"""SE(3)-equivariant tensor-product score model on padded complex batches.

TPU-first re-design of the reference's ``models/score_model.py`` (the
coarse-grained ``TensorProductScoreModel``, lines 44-677): same architecture
(atom encoders, receptor/ligand embedding convs, 4-edge-group trunk with the
last layer restricted to ligand updates, pseudo-vector tr/rot heads with
norm MLPs, torsion head convolving rotatable-bond centers), but:

  * graphs are fixed-shape: ligand radius edges are a dense masked [L, L]
    adjacency, cross edges are capped nearest-K receptor lists recomputed on
    device each forward, receptor kNN edges are host-precomputed [N, KR]
    lists (no torch_cluster, no dynamic shapes);
  * aggregation is masked means combining per-group message sums and counts
    (matching PyG scatter(reduce='mean') over the concatenated edge list);
  * the sigma-dependent cross cutoff (3*sigma_tr + 20, dynamic_max_cross) is
    a mask change, not a shape change, so the 20-step sampler can lax.scan;
  * SO(3)/torus score-norm lookups are device gathers (the reference syncs
    to CPU at score_model.py:420,447);
  * the t-independent receptor embedding is exposed separately
    (``embed_receptor``) so the sampler computes it once per complex
    (reference caches it on the graph at score_model.py:297-331).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

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
from .layers import AtomEncoder, FCBlock, GaussianSmearing, LinearIrreps, TPConv


def get_irrep_seq(ns, nv, use_second_order_repr, reduce_pseudoscalars):
    """Irreps ladder (reference models/tensor_layers.py:12-27)."""
    last = nv if reduce_pseudoscalars else ns
    if use_second_order_repr:
        return [
            f"{ns}x0e",
            f"{ns}x0e + {nv}x1o + {nv}x2e",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o + {last}x0o",
        ]
    return [
        f"{ns}x0e",
        f"{ns}x0e + {nv}x1o",
        f"{ns}x0e + {nv}x1o + {nv}x1e",
        f"{ns}x0e + {nv}x1o + {nv}x1e + {last}x0o",
    ]


class RecCache(NamedTuple):
    """t-independent receptor tensors, computed once per complex."""

    rec_attr: Any  # [B, N, D] embedded receptor node features
    rec_edge_emb: Any  # [B, N, KR, ns] embedded kNN edge features
    rec_edge_sh: Any  # [B, N, KR, sh_dim]
    rec_edge_mask: Any  # [B, N, KR]


class ScoreOutput(NamedTuple):
    tr_pred: Any  # [B, 3]
    rot_pred: Any  # [B, 3]
    tor_pred: Any  # [B, R] (masked by tor_mask)
    confidence: Any = None  # [B] or [B, K] in confidence mode
    atom_confidence: Any = None
    affinity: Any = None  # [B // parallel] when parallel > 1 (old models)
    sidechain_pred: Any = None  # [B, N, 10] chi + backbone vec predictions


class TensorProductScoreModel(nn.Module):
    cfg: ScoreModelConfig

    def setup(self):
        c = self.cfg
        ns, nv = c.ns, c.nv
        sh_irreps = spherical_harmonics_irreps(c.sh_lmax)
        self.timestep_emb = get_timestep_embedding(c.embedding_type, c.sigma_embed_dim, c.embedding_scale)

        self.lig_node_embedding = AtomEncoder(ns, LIG_FEATURE_DIMS, n_scalar=c.sigma_embed_dim)
        self.lig_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.rec_node_embedding = AtomEncoder(ns, REC_RESIDUE_FEATURE_DIMS, n_scalar=c.lm_embedding_dim)
        self.rec_edge_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.rec_sigma_embedding = FCBlock(ns, ns, 2, c.dropout)
        self.cross_edge_embedding = FCBlock(ns, ns, 2, c.dropout)

        self.lig_distance_expansion = GaussianSmearing(0.0, c.lig_max_radius, c.distance_embed_dim)
        self.rec_distance_expansion = GaussianSmearing(0.0, c.rec_max_radius, c.distance_embed_dim)
        self.cross_distance_expansion = GaussianSmearing(0.0, c.cross_max_distance, c.cross_distance_embed_dim)

        seq = get_irrep_seq(ns, nv, c.use_second_order_repr, c.reduce_pseudoscalars)
        self.irrep_seq = seq
        sh = str(sh_irreps)

        def emb_layer(i):
            return TPConv(
                in_irreps=seq[min(i, 3)],
                sh_irreps=sh,
                out_irreps=seq[min(i + 1, 3)],
                n_edge_features=3 * ns,
                hidden_features=3 * ns,
                num_groups=1,
                dropout=c.dropout,
                batch_norm=c.batch_norm,
                residual=True,
                tp_weights_layers=c.tp_weights_layers,
                depthwise=c.depthwise_convolution,
            )

        self.rec_emb_layers = [emb_layer(i) for i in range(c.num_prot_emb_layers)]
        self.lig_emb_layers = [emb_layer(i) for i in range(c.num_prot_emb_layers)]

        P, C = c.num_prot_emb_layers, c.num_conv_layers
        convs = []
        for i in range(P, P + C):
            last = i == P + C - 1
            groups = (2 if last else 4) if c.differentiate_convolutions else 1
            convs.append(
                TPConv(
                    in_irreps=seq[min(i, 3)],
                    sh_irreps=sh,
                    out_irreps=seq[min(i + 1, 3)],
                    n_edge_features=3 * ns,
                    hidden_features=3 * ns,
                    num_groups=groups,
                    dropout=c.dropout,
                    batch_norm=c.batch_norm,
                    residual=True,
                    tp_weights_layers=c.tp_weights_layers,
                    depthwise=c.depthwise_convolution,
                )
            )
        self.conv_layers = convs
        final_irreps = seq[min(P + C, 3)]
        self.final_irreps = final_irreps
        if c.sidechain_pred:
            # even+odd head summed (reference score_model.py:198-204, 422-427)
            self.sidechain_predictor = LinearIrreps(final_irreps, "4x0e + 2x1e + 4x0o + 2x1o")

        if c.confidence_mode:
            scalar_in = ns + (nv if c.reduce_pseudoscalars else ns) if C + P >= 3 else ns
            if c.atom_confidence:
                self.atom_confidence_predictor = ConfidenceHead(
                    ns, c.atom_num_confidence_outputs + ns, c.confidence_dropout, not c.confidence_no_batchnorm
                )
                scalar_in = ns
            self.confidence_predictor = ConfidenceHead(
                ns, c.num_confidence_outputs + (1 if c.affinity_prediction else 0),
                c.confidence_dropout, not c.confidence_no_batchnorm,
            )
            self.scalar_in = scalar_in
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

    # ------------------------------------------------------------------ #
    # ligand-only torsional mode (reference score_model.py:451-482,
    # activated by --dataset torsional pretraining)
    # ------------------------------------------------------------------ #

    def torsional_forward(self, batch: ComplexBatch, deterministic: bool = True, use_running_average: bool = True):
        c = self.cfg
        ns = c.ns
        B, L, _ = batch.lig_pos.shape
        det, ura = deterministic, use_running_average
        tor_sigma = t_to_sigma(batch.t_tor, batch.t_tor, batch.t_tor, c.sigma)[2]
        sigma_emb = self.timestep_emb(batch.t_tr)

        lig_attr = self.lig_node_embedding(
            batch.lig_f, jnp.broadcast_to(sigma_emb[:, None, :], (B, L, sigma_emb.shape[-1]))
        )
        g = self._lig_graph(batch, sigma_emb, det)
        for layer in self.lig_emb_layers:
            s, n = self._lig_conv(layer, 0, lig_attr, g, batch, det)
            lig_attr = layer.finalize(lig_attr, s, n, batch.lig_mask, ura)
        # widen to the torsion head's input irreps (ladder only appends blocks)
        from .layers import pad_residual

        lig_attr = pad_residual(lig_attr, Irreps(self.final_irreps).dim)

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
                jnp.broadcast_to(lig_attr[:, None, :, :ns], tb_emb.shape[:-1] + (ns,)),
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
        return jnp.where(batch.tor_mask, tor_pred, 0.0)

    # ------------------------------------------------------------------ #
    # receptor embedding (t-independent; cacheable across diffusion steps)
    # ------------------------------------------------------------------ #

    def embed_receptor(self, batch: ComplexBatch, deterministic: bool = True, use_running_average: bool = True) -> RecCache:
        c = self.cfg
        ns = c.ns
        rec_attr = self.rec_node_embedding(batch.rec_f[..., None], batch.rec_lm)  # [B, N, ns]

        nbr_pos = gather_nodes(batch.rec_pos, batch.rec_nbr)  # [B, N, KR, 3]
        vec = nbr_pos - batch.rec_pos[:, :, None, :]
        d = jnp.linalg.norm(vec, axis=-1)
        edge_emb = self.rec_edge_embedding(self.rec_distance_expansion(d), deterministic=deterministic)
        edge_sh = spherical_harmonics(c.sh_lmax, vec)
        emask = batch.rec_nbr_mask

        zero_sig = jnp.zeros((rec_attr.shape[0], ns), rec_attr.dtype)
        for layer in self.rec_emb_layers:
            s_, cnt = layer.conv_rec(
                0, rec_attr, batch.rec_pos, batch.rec_nbr, edge_emb, zero_sig, emask,
                sh_lmax=c.sh_lmax, deterministic=deterministic,
            )
            rec_attr = layer.finalize(rec_attr, s_, cnt, batch.rec_mask, use_running_average)

        return RecCache(rec_attr=rec_attr, rec_edge_emb=edge_emb, rec_edge_sh=edge_sh, rec_edge_mask=emask)

    # ------------------------------------------------------------------ #
    # ligand graph pieces
    # ------------------------------------------------------------------ #

    def _lig_graph(self, batch: ComplexBatch, sigma_emb, deterministic):
        """Bond edges + dense masked radius pairs, embedded (cf. reference
        build_lig_conv_graph, score_model.py:492-522)."""
        c = self.cfg
        B, L, _ = batch.lig_pos.shape
        pos = batch.lig_pos

        # dense radius pairs (receiver i, sender j)
        pair_mask, pair_d = radius_mask(pos, pos, c.lig_max_radius, batch.lig_mask, batch.lig_mask, exclude_self=True)
        pair_vec = pos[:, None, :, :] - pos[:, :, None, :]  # pos[j] - pos[i]
        pair_sh = spherical_harmonics(c.sh_lmax, pair_vec)
        zeros_bond = jnp.zeros(pair_d.shape + (c.in_lig_edge_features,))
        se = jnp.broadcast_to(sigma_emb[:, None, None, :], pair_d.shape + (sigma_emb.shape[-1],))
        pair_attr = jnp.concatenate([zeros_bond, se, self.lig_distance_expansion(pair_d)], axis=-1)
        pair_emb = self.lig_edge_embedding(pair_attr, deterministic=deterministic)

        # bond edges
        src, dst = batch.lig_edge_src, batch.lig_edge_dst
        p_src = jnp.take_along_axis(pos, src[..., None], axis=1)
        p_dst = jnp.take_along_axis(pos, dst[..., None], axis=1)
        bvec = p_dst - p_src
        bd = jnp.linalg.norm(bvec, axis=-1)
        bond_sh = spherical_harmonics(c.sh_lmax, bvec)
        se_b = jnp.broadcast_to(sigma_emb[:, None, :], bd.shape + (sigma_emb.shape[-1],))
        bond_attr = jnp.concatenate([batch.lig_edge_attr, se_b, self.lig_distance_expansion(bd)], axis=-1)
        bond_emb = self.lig_edge_embedding(bond_attr, deterministic=deterministic)

        return dict(
            pair_mask=pair_mask, pair_sh=pair_sh, pair_emb=pair_emb,
            bond_sh=bond_sh, bond_emb=bond_emb,
        )

    def _lig_conv(self, layer, group, lig_attr, g, batch, deterministic):
        """Messages into ligand nodes from the ligand edge group (bond +
        dense pairs share one weight MLP). Returns (sum [B,L,D], count).

        On TPU inference the dense pairs + bonds run as ONE fused kernel
        (ops/pallas/tpconv_lig.fused_tpconv_pb); the explicit composition
        below is the XLA fallback with identical semantics."""
        ns = self.cfg.ns
        fused = layer.conv_pb(
            group, lig_attr, batch.lig_pos, g["pair_emb"], g["pair_mask"],
            batch.lig_edge_src, batch.lig_edge_dst, g["bond_emb"], batch.lig_edge_mask,
            ns, sh_lmax=self.cfg.sh_lmax, deterministic=deterministic,
        )
        if fused is not None:
            return fused
        scal = lig_attr[..., :ns]
        B, L = scal.shape[:2]

        # dense pairs: receiver i gathers from sender j
        pe = g["pair_emb"]
        eattr = jnp.concatenate(
            [
                pe,
                jnp.broadcast_to(scal[:, :, None, :], pe.shape[:-1] + (ns,)),
                jnp.broadcast_to(scal[:, None, :, :], pe.shape[:-1] + (ns,)),
            ],
            axis=-1,
        )
        sender_pair = jnp.broadcast_to(lig_attr[:, None, :, :], eattr.shape[:-1] + (lig_attr.shape[-1],))
        sum_pair, cnt_pair = layer.conv_nbr(group, sender_pair, g["pair_sh"], eattr, g["pair_mask"], deterministic=deterministic)

        # bond edges: sender = dst, receiver = src
        src, dst = batch.lig_edge_src, batch.lig_edge_dst
        sc_src = jnp.take_along_axis(scal, src[..., None], axis=1)
        sc_dst = jnp.take_along_axis(scal, dst[..., None], axis=1)
        sender = jnp.take_along_axis(lig_attr, dst[..., None], axis=1)
        eattr_b = jnp.concatenate([g["bond_emb"], sc_src, sc_dst], axis=-1)
        msg_b = layer.messages(group, sender, g["bond_sh"], eattr_b, batch.lig_edge_mask, deterministic=deterministic)
        sum_b, cnt_b = scatter_mean_to_nodes(msg_b, src, batch.lig_edge_mask, L)
        return sum_pair + sum_b, cnt_pair + cnt_b

    # ------------------------------------------------------------------ #
    # forward
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        batch: ComplexBatch,
        rec_cache: Optional[RecCache] = None,
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> ScoreOutput:
        c = self.cfg
        ns, nv = c.ns, c.nv
        B, L, _ = batch.lig_pos.shape
        N = batch.rec_pos.shape[1]
        det, ura = deterministic, use_running_average

        if not c.confidence_mode:
            tr_sigma, rot_sigma, tor_sigma = t_to_sigma(batch.t_tr, batch.t_rot, batch.t_tor, c.sigma)
        else:
            tr_sigma, rot_sigma, tor_sigma = batch.t_tr, batch.t_rot, batch.t_tor

        sigma_emb = self.timestep_emb(batch.t_tr)  # [B, sigma_embed_dim]

        # ---- receptor embedding (cached across steps by the sampler)
        if rec_cache is None:
            rec_cache = self.embed_receptor(batch, det, ura)
        rec_sig = self.rec_sigma_embedding(sigma_emb, deterministic=det)  # [B, ns]
        rec_attr = rec_cache.rec_attr
        rec_attr = rec_attr.at[..., :ns].add(rec_sig[:, None, :])

        # ---- ligand embedding
        lig_attr = self.lig_node_embedding(
            batch.lig_f, jnp.broadcast_to(sigma_emb[:, None, :], (B, L, sigma_emb.shape[-1]))
        )
        g = self._lig_graph(batch, sigma_emb, det)
        for layer in self.lig_emb_layers:
            s, n = self._lig_conv(layer, 0, lig_attr, g, batch, det)
            lig_attr = layer.finalize(lig_attr, s, n, batch.lig_mask, ura)

        # ---- cross neighbor lists (sigma-dependent cutoff)
        if c.dynamic_max_cross:
            cutoff = (tr_sigma * 3 + 20)[:, None, None]
        else:
            cutoff = c.cross_max_distance
        rec_mask_eff = batch.rec_mask
        if c.crop_beyond is not None:
            # mask-based crop_beyond (reference rebatches per step, utils/utils.py:395)
            d_lr_min = jnp.min(
                jnp.where(
                    batch.lig_mask[:, :, None],
                    pairwise_dist(batch.lig_pos, batch.rec_pos),
                    1e9,
                ),
                axis=1,
            )  # [B, N]
            crop_cut = (tr_sigma * 3 + c.crop_beyond)[:, None] if not c.confidence_mode else c.crop_beyond
            rec_mask_eff = batch.rec_mask & (d_lr_min < crop_cut)

        KC = c.effective_cross_cap(N)
        cr_idx, cr_mask, cr_d = topk_neighbors(batch.lig_pos, batch.rec_pos, cutoff, batch.lig_mask, rec_mask_eff, KC)
        cr_pos = gather_nodes(batch.rec_pos, cr_idx)
        cr_vec = cr_pos - batch.lig_pos[:, :, None, :]  # lig -> rec
        cr_sh = spherical_harmonics(c.sh_lmax, cr_vec)
        cr_sh_rev = spherical_harmonics(c.sh_lmax, -cr_vec)
        se_c = jnp.broadcast_to(sigma_emb[:, None, None, :], cr_d.shape + (sigma_emb.shape[-1],))
        cr_emb = self.cross_edge_embedding(
            jnp.concatenate([se_c, self.cross_distance_expansion(cr_d)], axis=-1), deterministic=det
        )

        # ---- main trunk
        n_layers = len(self.conv_layers)
        for li, layer in enumerate(self.conv_layers):
            last = li == n_layers - 1
            lig_scal = lig_attr[..., :ns]
            rec_scal = rec_attr[..., :ns]

            if c.differentiate_convolutions:
                g_lig, g_lr, g_rec, g_rl = 0, 1, (None if last else 2), (None if last else 3)
            else:
                g_lig = g_lr = g_rec = g_rl = 0

            # ligand <- ligand
            lig_sum, lig_cnt = self._lig_conv(layer, g_lig, lig_attr, g, batch, det)

            # ligand <- receptor (lr) and receptor <- ligand (rl): one fused
            # kernel over the shared cross edge list on TPU inference
            # (ops/pallas/tpconv_lig.fused_tpconv_cross_rev); XLA fallback
            # below with identical semantics.
            cr_fused = layer.conv_cross_rev(
                g_lr, None if last else g_rl, lig_attr, batch.lig_pos, rec_attr, batch.rec_pos,
                cr_idx, cr_emb, cr_mask, ns, sh_lmax=c.sh_lmax, deterministic=det,
            )
            if cr_fused is not None:
                s_lr, c_lr2, s_rl, c_rl = cr_fused
            else:
                s_lr, c_lr2 = layer.conv_cross(
                    g_lr, lig_attr, batch.lig_pos, rec_attr, batch.rec_pos,
                    cr_idx, cr_emb, cr_mask, sh_lmax=c.sh_lmax, deterministic=det, ns=ns,
                )
                s_rl = c_rl = None
            lig_sum = lig_sum + s_lr
            lig_cnt = lig_cnt + c_lr2

            if not last:
                # receptor <- receptor (in-kernel gather; sigma emb added to
                # the cached edge embeddings inside the kernel)
                rec_sum, rec_cnt = layer.conv_rec(
                    g_rec, rec_attr, batch.rec_pos, batch.rec_nbr,
                    rec_cache.rec_edge_emb, rec_sig, rec_cache.rec_edge_mask,
                    sh_lmax=c.sh_lmax, deterministic=det,
                )

                if s_rl is None:
                    # receptor <- ligand (reversed cross edges), XLA path
                    cr_sender_scal = gather_nodes(rec_attr, cr_idx)[..., :ns]
                    eattr_rl = jnp.concatenate(
                        [cr_emb, cr_sender_scal, jnp.broadcast_to(lig_scal[:, :, None, :], cr_emb.shape[:-1] + (ns,))],
                        axis=-1,
                    )
                    lig_sender = jnp.broadcast_to(lig_attr[:, :, None, :], cr_emb.shape[:-1] + (lig_attr.shape[-1],))
                    msg_rl = layer.msgs_nbr(g_rl, lig_sender, cr_sh_rev, eattr_rl, cr_mask, deterministic=det)
                    D = msg_rl.shape[-1]
                    s_rl, c_rl = scatter_mean_to_nodes(
                        msg_rl.reshape(B, -1, D), cr_idx.reshape(B, -1), cr_mask.reshape(B, -1), N
                    )
                rec_sum = rec_sum + s_rl
                rec_cnt = rec_cnt + c_rl

                new_lig = layer.finalize(lig_attr, lig_sum, lig_cnt, batch.lig_mask, ura)
                rec_attr = layer.finalize(rec_attr, rec_sum, rec_cnt, batch.rec_mask, ura)
                lig_attr = new_lig
            else:
                lig_attr = layer.finalize(lig_attr, lig_sum, lig_cnt, batch.lig_mask, ura)

        # ---- heads
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
            if c.num_confidence_outputs == 1 and not c.affinity_prediction:
                conf = conf[..., 0]
            return ScoreOutput(None, None, None, confidence=conf, atom_confidence=atom_conf)

        # center conv: translational / rotational pseudo-vectors
        m = batch.lig_mask.astype(lig_attr.dtype)[..., None]
        center = jnp.sum(batch.lig_pos * m, axis=1, keepdims=True) / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        cvec = batch.lig_pos - center  # center -> atom
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

        sidechain_pred = None
        if c.sidechain_pred:
            from .layers import pad_residual

            sp = self.sidechain_predictor(pad_residual(rec_attr, Irreps(self.final_irreps).dim))
            sidechain_pred = sp[..., :10] + sp[..., 10:]  # sum even and odd parts

        if c.no_torsion:
            return ScoreOutput(tr_pred, rot_pred, jnp.zeros((B, batch.tor_src.shape[1])), sidechain_pred=sidechain_pred)

        # ---- torsion head (reference build_bond_conv_graph + tor_bond_conv)
        R = batch.tor_src.shape[1]
        pu = jnp.take_along_axis(batch.lig_pos, batch.tor_src[..., None], axis=1)  # [B, R, 3]
        pv = jnp.take_along_axis(batch.lig_pos, batch.tor_dst[..., None], axis=1)
        bond_pos = (pu + pv) / 2
        bond_vec = pv - pu

        tb_mask, tb_d = radius_mask(bond_pos, batch.lig_pos, c.lig_max_radius, batch.tor_mask, batch.lig_mask)
        tb_vec = batch.lig_pos[:, None, :, :] - bond_pos[:, :, None, :]
        tb_sh0 = spherical_harmonics(c.sh_lmax, tb_vec)
        bond_sh2 = spherical_harmonics(2, bond_vec)[..., 4:]  # the l=2 block
        tb_sh = self.final_tp_tor(tb_sh0, jnp.broadcast_to(bond_sh2[:, :, None, :], tb_sh0.shape[:-1] + (5,)))

        tb_emb = self.final_edge_embedding(self.lig_distance_expansion(tb_d), deterministic=det)
        tor_bond_attr = jnp.take_along_axis(lig_attr, batch.tor_src[..., None], axis=1) + jnp.take_along_axis(
            lig_attr, batch.tor_dst[..., None], axis=1
        )
        eattr_t = jnp.concatenate(
            [
                tb_emb,
                jnp.broadcast_to(lig_attr[:, None, :, :ns], tb_emb.shape[:-1] + (ns,)),
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

        return ScoreOutput(tr_pred, rot_pred, tor_pred, sidechain_pred=sidechain_pred)


class FinalNormMLP(nn.Module):
    """MLP rescaling the tr/rot vector norm (reference tr/rot_final_layer)."""

    ns: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, norm, sigma_emb, deterministic=True):
        x = jnp.concatenate([norm, sigma_emb], axis=-1)
        x = nn.Dense(self.ns)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x)


class TorFinalMLP(nn.Module):
    """Bias-free tanh MLP for the torsion logits (reference tor_final_layer)."""

    ns: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.ns, use_bias=False)(x)
        x = jnp.tanh(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(1, use_bias=False)(x)


class ConfidenceHead(nn.Module):
    """Linear-BN-ReLU-Dropout x2 -> Linear (reference confidence_predictor)."""

    ns: int
    out_dim: int
    dropout: float = 0.0
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True, use_running_average=True):
        for _ in range(2):
            x = nn.Dense(self.ns)(x)
            if self.use_batchnorm:
                x = MaskedBatchNorm1d()(x, mask, use_running_average)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out_dim)(x)


class MaskedBatchNorm1d(nn.Module):
    """Plain batch norm over all leading axes, masked for padded rows."""

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=True):
        dim = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((dim,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((dim,)))
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        m = mask.astype(x.dtype)[..., None]
        denom = jnp.maximum(jnp.sum(m), 1.0)
        mean_b = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / denom
        var_b = jnp.sum((x - mean_b) ** 2 * m, axis=tuple(range(x.ndim - 1))) / denom
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = mean_b, var_b
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean_b
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var_b
        return (x - mean) / jnp.sqrt(var + self.epsilon) * scale + bias
