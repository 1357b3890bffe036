"""Building blocks for the equivariant models.

Re-designs of the reference's ``models/layers.py`` (FCBlock),
``models/score_model.py:18-41`` (AtomEncoder), ``models/score_model.py:667``
(GaussianSmearing), and e3nn's irreps BatchNorm as used by
``models/tensor_layers.py:193``. All modules operate on arbitrarily-shaped
leading axes and support padded-node masking.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.irreps import DepthwiseTensorProduct, Irreps, WeightedTensorProduct, linear_apply, linear_weight_shapes


class FCBlock(nn.Module):
    """n-layer MLP: Linear (ReLU Dropout Linear)*(depth-1)."""

    hidden_dim: int
    out_dim: int
    depth: int = 2
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = nn.relu if self.activation == "relu" else nn.silu
        h = nn.Dense(self.hidden_dim if self.depth > 1 else self.out_dim)(x)
        for i in range(self.depth - 1):
            h = act(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(self.out_dim if i == self.depth - 2 else self.hidden_dim)(h)
        return h


def _chunk_cross_k(call, idx, edge_emb, idx_mask, kmax=128):
    """Apply a fused cross-conv kernel in K-chunks of <= kmax neighbors.

    The fused cross kernels hold the whole [T_l, K, F] edge block on the
    Mosaic VMEM stack; bucket-scaled caps (config.effective_cross_cap) blow
    the scoped limit beyond K~200 (measured: K=224 needs 83 MB of the 64 MB
    stack in conv_cross_rev, K=128 fits). Every output is a masked SUM over
    K (finalize divides by counts outside the kernel), so slicing the
    neighbor list into <=kmax-wide chunks and adding results is exact. The
    effective caps are multiples of 32, so every chunk keeps the >=16-lane
    alignment the kernels require."""
    K = idx.shape[-1]
    if K <= kmax:
        return call(idx, edge_emb, idx_mask)
    out = None
    for s in range(0, K, kmax):
        o = call(idx[..., s:s + kmax], edge_emb[..., s:s + kmax, :], idx_mask[..., s:s + kmax])
        out = o if out is None else jax.tree.map(lambda a, b: a + b, out, o)
    return out


class AtomEncoder(nn.Module):
    """Sum of categorical embeddings + linear fold-in of scalar features.

    feature_dims: vocabulary sizes of the categorical features (the trailing
    feature columns beyond them are treated as scalars: sigma embedding and/or
    language-model embedding, like reference AtomEncoder).
    """

    emb_dim: int
    feature_dims: Tuple[int, ...]
    n_scalar: int = 0  # sigma_embed_dim + lm_embedding_dim

    @nn.compact
    def __call__(self, x_cat, x_scalar=None):
        emb = 0.0
        for i, vocab in enumerate(self.feature_dims):
            table = nn.Embed(vocab, self.emb_dim, embedding_init=nn.initializers.xavier_uniform())
            emb = emb + table(jnp.clip(x_cat[..., i], 0, vocab - 1))
        if self.n_scalar > 0:
            emb = nn.Dense(self.emb_dim)(jnp.concatenate([emb, x_scalar], axis=-1))
        return emb


class GaussianSmearing(nn.Module):
    """Distance -> Gaussian RBF features on a linear grid."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist):
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / float((self.stop - self.start) / (self.num_gaussians - 1)) ** 2
        d = dist[..., None] - offset
        return jnp.exp(coeff * d**2)


class BatchNormIrreps(nn.Module):
    """Masked batch norm over irreps features (e3nn BatchNorm semantics).

    Scalars (0e): standard batch norm (mean/var) with affine weight+bias.
    Everything else (l>0 AND pseudoscalars 0o, matching e3nn's is_scalar()
    = l==0 and p==1): divide by the rms norm of the fields, no mean
    subtraction, affine weight only. Statistics are masked means over all
    valid nodes of the batch; running averages are kept in the
    'batch_stats' collection.
    """

    irreps: str
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        irreps = Irreps(self.irreps)
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        m = mask.astype(x.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)

        n_scalar = sum(mul for mul, ir in irreps if ir.l == 0 and ir.p == 1)
        n_field = sum(mul for mul, ir in irreps if not (ir.l == 0 and ir.p == 1))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((n_scalar,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((n_scalar,)))
        ra_norm = self.variable("batch_stats", "norm", lambda: jnp.ones((n_field,)))

        weight = self.param("weight", nn.initializers.ones, (irreps.num_irreps,))
        bias = self.param("bias", nn.initializers.zeros, (n_scalar,))

        out = []
        i_s = i_f = i_w = 0
        new_means, new_vars, new_norms = [], [], []
        for (mul, ir), sl in zip(irreps, irreps.slices()):
            blk = x[..., sl]
            w = weight[i_w : i_w + mul]
            i_w += mul
            if ir.l == 0 and ir.p == 1:
                mean_b = jnp.sum(blk * m[..., None], axis=tuple(range(blk.ndim - 1))) / denom
                var_b = jnp.sum((blk - mean_b) ** 2 * m[..., None], axis=tuple(range(blk.ndim - 1))) / denom
                if use_running_average:
                    mean = ra_mean.value[i_s : i_s + mul]
                    var = ra_var.value[i_s : i_s + mul]
                else:
                    mean, var = mean_b, var_b
                new_means.append(mean_b)
                new_vars.append(var_b)
                b = bias[i_s : i_s + mul]
                i_s += mul
                out.append(((blk - mean) / jnp.sqrt(var + self.epsilon)) * w + b)
            else:
                f = blk.reshape(blk.shape[:-1] + (mul, ir.dim))
                norm2 = jnp.mean(f**2, axis=-1)  # [..., mul]
                norm_b = jnp.sum(norm2 * m[..., None], axis=tuple(range(norm2.ndim - 1))) / denom
                if use_running_average:
                    norm = ra_norm.value[i_f : i_f + mul]
                else:
                    norm = norm_b
                new_norms.append(norm_b)
                i_f += mul
                fn = f / jnp.sqrt(norm + self.epsilon)[..., :, None] * w[..., :, None]
                out.append(fn.reshape(blk.shape))

        if not use_running_average and not self.is_initializing():
            mom = self.momentum
            if n_scalar:
                ra_mean.value = (1 - mom) * ra_mean.value + mom * jnp.concatenate(new_means)
                ra_var.value = (1 - mom) * ra_var.value + mom * jnp.concatenate(new_vars)
            if n_field:
                ra_norm.value = (1 - mom) * ra_norm.value + mom * jnp.concatenate(new_norms)
        return jnp.concatenate(out, axis=-1)


class LinearIrreps(nn.Module):
    """Equivariant linear layer (e3nn o3.Linear capability)."""

    irreps_in: str
    irreps_out: str

    @nn.compact
    def __call__(self, x):
        shapes = linear_weight_shapes(self.irreps_in, self.irreps_out)
        weights = {
            k: self.param(k, nn.initializers.normal(1.0), shape) for k, shape in shapes
        }
        biases = {}
        for oi, (mo, iro) in enumerate(Irreps(self.irreps_out)):
            if iro.l == 0:
                biases[f"b_{oi}"] = self.param(f"b_{oi}", nn.initializers.zeros, (mo,))
        return linear_apply(self.irreps_in, self.irreps_out, x, weights, biases)


def pad_residual(x, out_dim):
    """Residual connection with zero-padding to the wider irreps (reference
    tensor_layers.py:214-216; valid because the irreps ladder only appends)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, out_dim - x.shape[-1])])


class TPConv(nn.Module):
    """Tensor-product convolution: edge MLP -> TP weights -> messages.

    The reference's TensorProductConvLayer (models/tensor_layers.py:120-217)
    split into (a) per-edge-group message computation (this module) and
    (b) caller-side masked mean aggregation + BN + residual, because on TPU
    the edge groups live in different fixed-shape containers (dense ligand
    pairs, receptor kNN lists, capped cross lists).
    """

    in_irreps: str
    sh_irreps: str
    out_irreps: str
    n_edge_features: int
    num_groups: int = 1
    hidden_features: Optional[int] = None
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    tp_weights_layers: int = 2
    depthwise: bool = False

    def setup(self):
        if self.depthwise:
            # uvu product + post-aggregation Linear (reference depthwise path)
            self.tp = DepthwiseTensorProduct(self.in_irreps, self.sh_irreps)
            self.linear_2 = LinearIrreps(str(self.tp.irreps_out), self.out_irreps)
        else:
            self.tp = WeightedTensorProduct(self.in_irreps, self.sh_irreps, self.out_irreps)
        hidden = self.hidden_features or self.n_edge_features
        self.edge_mlps = [
            FCBlock(hidden, self.tp.weight_numel, depth=self.tp_weights_layers, dropout=self.dropout)
            for _ in range(self.num_groups)
        ]
        if self.batch_norm:
            self.bn = BatchNormIrreps(self.out_irreps)
        self.out_dim = Irreps(self.out_irreps).dim


    def _fused_mode(self, deterministic):
        """Which fused pallas path applies: 'ladder1' (tpconv_v3/tpconv_rec,
        the tuned lmax=1 score-model path), 'general' (tpconv_g, any mul-1
        sh with fan-in <= 128 — the lmax=2 confidence path), or None (XLA:
        training, dropout-active, depthwise, or unsupported layouts)."""
        import os

        import jax

        from ..ops.pallas import tpconv_v3 as _tpconv

        if (
            not deterministic
            or os.environ.get("CBT_DISABLE_FUSED")
            or self.depthwise
            or self.tp_weights_layers != 2
            or self.is_initializing()
            or jax.default_backend() != "tpu"
        ):
            return None
        if str(Irreps(self.sh_irreps)) == "1x0e + 1x1o" and _tpconv.ladder_spec(self.in_irreps, self.out_irreps) is not None:
            return "ladder1"
        try:
            from ..ops.pallas import tpconv_g as _tpg

            _tpg.general_layout(str(Irreps(self.in_irreps)), str(Irreps(self.sh_irreps)), str(Irreps(self.out_irreps)))
            return "general"
        except ValueError:
            return None

    def _train_fused_mode(self, deterministic):
        """Fused TRAINING path gate (differentiable custom_vjp kernels,
        ops/pallas/tpconv_train.py): 'auto' on TPU, 'interpret' when
        CBT_FUSED_TRAIN=interpret (CPU tests), None to use the XLA path.
        Unlike _fused_mode this is NOT inference-only — it exists precisely
        for deterministic=False (reference tensor_layers.py:120-217 trains
        through the same fused TP it infers with)."""
        import os

        import jax

        if (
            deterministic
            or self.depthwise
            or self.tp_weights_layers != 2
            or self.is_initializing()
            or os.environ.get("CBT_DISABLE_FUSED")
        ):
            return None
        env = os.environ.get("CBT_FUSED_TRAIN", "auto")
        if env == "0":
            return None
        if env != "interpret" and jax.default_backend() != "tpu":
            return None
        try:
            from ..ops.pallas import tpconv_g as _tpg

            _tpg.general_layout(str(Irreps(self.in_irreps)), str(Irreps(self.sh_irreps)), str(Irreps(self.out_irreps)))
        except ValueError:
            return None
        return env

    def _fused_train(self, group, sender_attr, edge_sh, edge_attr, edge_mask, tmode, sum_k):
        """Differentiable fused message op for training: broadcasts the edge
        tensors to a common [..., K, *] shape, draws the hidden-layer dropout
        mask (nn.Dropout semantics: keep prob 1-p, scale 1/(1-p)), and calls
        the custom_vjp kernel. Returns [..., out_dim] (sum_k) or
        [..., K, out_dim]."""
        import jax

        from ..ops.pallas import tpconv_train as _tpt

        lead = jnp.broadcast_shapes(
            sender_attr.shape[:-1], edge_sh.shape[:-1], edge_attr.shape[:-1], edge_mask.shape
        )
        K = lead[-1]
        bt = lambda a: jnp.broadcast_to(a, lead + a.shape[-1:]).reshape((-1, K, a.shape[-1]))
        mask = jnp.broadcast_to(edge_mask, lead).reshape(-1, K)
        dmask = None
        if self.dropout > 0.0:
            keep = 1.0 - self.dropout
            H = self.hidden_features or self.n_edge_features
            bits = jax.random.bernoulli(self.make_rng("dropout"), keep, mask.shape + (H,))
            dmask = bits.astype(jnp.float32) / keep
        p = self.edge_mlps[group].variables["params"]
        out = _tpt.fused_tpconv_train(
            bt(edge_attr), bt(sender_attr), bt(edge_sh), mask,
            p["Dense_0"]["kernel"], p["Dense_0"]["bias"], p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
            self.in_irreps, self.sh_irreps, self.out_irreps,
            dmask=dmask, sum_k=sum_k,
            use_bf16=(tmode != "interpret"), interpret=(tmode == "interpret"),
        )
        return out.reshape((lead[:-1] if sum_k else lead) + (out.shape[-1],))

    def conv_nbr(self, group, sender_attr, edge_sh, edge_attr, edge_mask, deterministic=True):
        """Messages summed over the trailing neighbor axis: [..., K, *] ->
        ([..., out_dim], counts [...]).

        Uses the fused Pallas kernel (ops/pallas/tpconv.py) on TPU for
        inference with lmax=1 ladder irreps and 2-layer weight MLPs; in
        training the differentiable fused kernel (tpconv_train.py); the XLA
        path otherwise. sender_attr must be materialized to the full
        [..., K, D] shape.
        """
        from ..ops.pallas import tpconv_g as _tpg
        from ..ops.pallas import tpconv_v3 as _tpconv

        counts = jnp.sum(edge_mask, axis=-1).astype(jnp.float32)
        mode = self._fused_mode(deterministic)
        if mode is None:
            tmode = self._train_fused_mode(deterministic)
            if tmode is not None:
                return self._fused_train(group, sender_attr, edge_sh, edge_attr, edge_mask, tmode, sum_k=True), counts
            msg = self.messages(group, sender_attr, edge_sh, edge_attr, edge_mask, deterministic=deterministic)
            return jnp.sum(msg, axis=-2), counts

        p = self.edge_mlps[group].variables["params"]
        w1, b1 = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
        w2, b2 = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
        lead = sender_attr.shape[:-2]
        K = sender_attr.shape[-2]
        flat = lambda a: a.reshape((-1, K) + a.shape[len(lead) + 1 :])
        if mode == "ladder1":
            out = _tpconv.fused_tpconv_nbr(
                flat(edge_attr), flat(sender_attr), flat(edge_sh), flat(edge_mask),
                w1, b1, w2, b2, self.in_irreps, self.out_irreps,
            )
        else:
            out = _tpg.fused_tpconv_nbr_g(
                flat(edge_attr), flat(sender_attr), flat(edge_sh), flat(edge_mask),
                w1, b1, w2, b2, self.in_irreps, self.sh_irreps, self.out_irreps,
            )
        return out.reshape(lead + (out.shape[-1],)), counts

    def conv_rec(self, group, node_attr, pos, nbr, edge_emb, sig, nbr_mask, sh_lmax=1, deterministic=True):
        """Messages for a kNN node group whose senders AND receivers are the
        same node set (receptor<-receptor): [B, N, D] node features, [B, N, K]
        neighbor indices, cached edge embeddings [B, N, K, Fe] plus a
        per-batch sigma embedding added to them (zeros to skip).

        On TPU inference this runs the v4 kernel (ops/pallas/tpconv_rec.py)
        that gathers neighbors in-kernel — no [B, N, K, D] sender tensor in
        HBM. Elsewhere it falls back to the XLA gather + conv_nbr path with
        identical semantics. Returns (msg_sum [B, N, out_dim], counts)."""
        import jax

        from ..ops.graph_builders import gather_nodes
        from ..ops.irreps import spherical_harmonics
        from ..ops.pallas import tpconv_rec as _tpconv_rec
        from ..ops.pallas import tpconv_v3 as _tpconv

        import os

        counts = jnp.sum(nbr_mask, axis=-1).astype(jnp.float32)
        ns = edge_emb.shape[-1]
        B, N = node_attr.shape[:2]
        mode = self._fused_mode(deterministic)
        use_fused = (
            mode == "ladder1"
            and sh_lmax == 1
            and self.n_edge_features == 3 * ns
            and N % 32 == 0
        )
        # in-kernel gather for lmax=2 kNN groups — TPU-VALIDATED (v5e):
        # numerics pinned by tests/test_pallas_tpconv.py::
        # test_rec_g_gather_matches_reference / test_cross_g_gather_matches_
        # reference plus an on-TPU gate=0-vs-auto parity check at the crop
        # buckets (docs/PERF_NOTES.md round 3); perf measured a WIN at
        # compacted tables (confidence fwd B=8 79.9 -> 73.2 ms at
        # N=256/A=2048) and neutral-to-slightly-worse at full buckets
        # (97.1 -> 97.9 ms at A=4096) — the one-hot gather matmul scales
        # with the table size. auto = fused when the node table is <= 2048
        # rows; 1/0 force either path.
        gate = os.environ.get("CBT_FUSED_REC_G", "auto")
        if (
            not use_fused
            and mode == "general"
            and sh_lmax <= 2
            and self.n_edge_features == 3 * ns
            and N % 8 == 0
            and (gate == "1" or (gate == "auto" and N <= 2048))
        ):
            # generalized v4: in-kernel gather for the lmax=2 kNN groups
            from ..ops.pallas import tpconv_g as _tpg

            p = self.edge_mlps[group].variables["params"]
            out = _tpg.fused_tpconv_rec_g(
                node_attr, pos, nbr, edge_emb, sig, nbr_mask,
                p["Dense_0"]["kernel"], p["Dense_0"]["bias"], p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
                self.in_irreps, self.sh_irreps, self.out_irreps, ns,
            )
            return out, counts
        if not use_fused:
            tmode = self._train_fused_mode(deterministic)
            if (
                tmode is not None
                and sh_lmax <= 2
                and self.n_edge_features == 3 * ns
                and N % 8 == 0
            ):
                # training with the in-kernel-gather kernel (custom_vjp,
                # tpconv_train.fused_tpconv_rec_train): no [B, N, K, D]
                # sender materialization in the forward
                from ..ops.pallas import tpconv_train as _tpt

                dmask = None
                if self.dropout > 0.0:
                    keep = 1.0 - self.dropout
                    H = self.hidden_features or self.n_edge_features
                    bits = jax.random.bernoulli(self.make_rng("dropout"), keep, nbr.shape + (H,))
                    # bf16 storage halves the [B, N, K, H] mask's HBM traffic;
                    # fwd kernel and bwd consume the SAME bf16 values
                    dmask = (bits * (1.0 / keep)).astype(jnp.bfloat16)
                p = self.edge_mlps[group].variables["params"]
                out = _tpt.fused_tpconv_rec_train(
                    node_attr, pos, nbr, edge_emb, sig, nbr_mask,
                    p["Dense_0"]["kernel"], p["Dense_0"]["bias"], p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
                    self.in_irreps, self.sh_irreps, self.out_irreps, ns,
                    dmask=dmask, use_bf16=(tmode != "interpret"), interpret=(tmode == "interpret"),
                )
                return out, counts
            # falls through to conv_nbr, which itself applies the fused
            # differentiable kernel in training / tpconv_g at inference
            sender = gather_nodes(node_attr, nbr)
            spos = gather_nodes(pos, nbr)
            vec = spos - pos[:, :, None, :]
            sh = spherical_harmonics(sh_lmax, vec)
            scal = node_attr[..., :ns]
            eattr = jnp.concatenate(
                [
                    edge_emb + sig[:, None, None, :],
                    jnp.broadcast_to(scal[:, :, None, :], sender[..., :ns].shape),
                    sender[..., :ns],
                ],
                axis=-1,
            )
            return self.conv_nbr(group, sender, sh, eattr, nbr_mask, deterministic=deterministic)[0], counts

        p = self.edge_mlps[group].variables["params"]
        w1, b1 = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
        w2, b2 = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
        out = _tpconv_rec.fused_tpconv_rec(
            node_attr, pos, nbr, edge_emb, sig, nbr_mask,
            w1, b1, w2, b2, self.in_irreps, self.out_irreps, ns,
        )
        return out, counts

    def conv_cross(self, group, recv_attr, recv_pos, src_attr, src_pos, idx, edge_emb, idx_mask, sh_lmax=1, deterministic=True, ns=None):
        """Messages for a cross group (receivers and senders are different
        node sets, e.g. ligand <- receptor): senders gathered in-kernel
        from the per-batch source table on TPU (lmax=1); XLA fallback with
        identical semantics otherwise. Returns (msg_sum, counts).

        ns: scalar-channel width used for the receiver/sender slices of the
        edge features. Callers should pass their config's ns explicitly;
        the fallback inference from tensor widths is kept for back-compat
        but raises if the layout matches neither expected pattern."""
        from ..ops.graph_builders import gather_nodes
        from ..ops.irreps import spherical_harmonics
        from ..ops.pallas import tpconv_rec as _tpconv_rec

        counts = jnp.sum(idx_mask, axis=-1).astype(jnp.float32)
        if ns is None:
            if edge_emb.shape[-1] * 3 == self.n_edge_features:
                ns = edge_emb.shape[-1]
            elif self.n_edge_features % 3 == 0:
                ns = self.n_edge_features // 3
            else:
                raise ValueError(
                    f"conv_cross cannot infer ns from edge layout (edge_emb width "
                    f"{edge_emb.shape[-1]}, n_edge_features {self.n_edge_features}); "
                    "pass ns explicitly"
                )
        if edge_emb.shape[-1] + 2 * ns != self.n_edge_features:
            raise ValueError(
                f"conv_cross edge layout mismatch: edge_emb width {edge_emb.shape[-1]} "
                f"+ 2*ns ({ns}) != n_edge_features {self.n_edge_features}"
            )
        import os

        mode = self._fused_mode(deterministic)
        use_fused = (
            mode == "ladder1"
            and sh_lmax == 1
            and self.n_edge_features == edge_emb.shape[-1] + 2 * ns
        )
        # same size-aware gate as conv_rec_knn (see comment there)
        gate = os.environ.get("CBT_FUSED_REC_G", "auto")
        if (
            not use_fused
            and mode == "general"
            and sh_lmax <= 2
            and self.n_edge_features == edge_emb.shape[-1] + 2 * ns
            and (gate == "1" or (gate == "auto" and src_attr.shape[1] <= 2048))
        ):
            from ..ops.pallas import tpconv_g as _tpg

            p = self.edge_mlps[group].variables["params"]
            out = _chunk_cross_k(
                lambda i, e, mm: _tpg.fused_tpconv_cross_g(
                    recv_attr, recv_pos, src_attr, src_pos, i, e, mm,
                    p["Dense_0"]["kernel"], p["Dense_0"]["bias"], p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
                    self.in_irreps, self.sh_irreps, self.out_irreps, ns,
                ),
                idx, edge_emb, idx_mask,
            )
            return out, counts
        if not use_fused:
            sender = gather_nodes(src_attr, idx)
            spos = gather_nodes(src_pos, idx)
            vec = spos - recv_pos[:, :, None, :]
            sh = spherical_harmonics(sh_lmax, vec)
            scal = recv_attr[..., :ns]
            eattr = jnp.concatenate(
                [
                    edge_emb,
                    jnp.broadcast_to(scal[:, :, None, :], sender[..., :ns].shape),
                    sender[..., :ns],
                ],
                axis=-1,
            )
            return self.conv_nbr(group, sender, sh, eattr, idx_mask, deterministic=deterministic)[0], counts

        p = self.edge_mlps[group].variables["params"]
        w1, b1 = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
        w2, b2 = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
        out = _chunk_cross_k(
            lambda i, e, mm: _tpconv_rec.fused_tpconv_cross(
                recv_attr, recv_pos, src_attr, src_pos, i, e, mm,
                w1, b1, w2, b2, self.in_irreps, self.out_irreps, ns,
            ),
            idx, edge_emb, idx_mask,
        )
        return out, counts

    def conv_pb(self, group, lig_attr, lig_pos, pair_emb, pair_mask,
                bond_src, bond_dst, bond_emb, bond_mask, ns, sh_lmax=1, deterministic=True):
        """Merged ligand<-ligand messages: dense pairs + bond edges in one
        fused kernel (ops/pallas/tpconv_lig.py) on TPU inference; returns
        (msg_sum [B, L, out_dim], counts [B, L]) or None when the fused path
        does not apply (caller falls back to the explicit XLA composition,
        which needs the precomputed pair/bond spherical harmonics)."""
        import os

        from ..ops.graph_builders import scatter_count_to_nodes
        from ..ops.pallas import tpconv_lig as _tpl

        if not (
            os.environ.get("CBT_FUSED_LIGSIDE", "1") == "1"  # TPU-validated; =0 to disable
            and self._fused_mode(deterministic) == "ladder1"
            and sh_lmax == 1
            and self.n_edge_features == 3 * ns
            and lig_attr.shape[1] % 8 == 0  # Mosaic sublane: L-dim slices need 8-alignment
        ):
            return None
        p = self.edge_mlps[group].variables["params"]
        out = _tpl.fused_tpconv_pb(
            lig_attr, lig_pos, pair_emb, pair_mask, bond_src, bond_dst, bond_emb, bond_mask,
            p["Dense_0"]["kernel"], p["Dense_0"]["bias"], p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
            self.in_irreps, self.out_irreps, ns,
        )
        L = lig_attr.shape[1]
        counts = jnp.sum(pair_mask, axis=-1).astype(jnp.float32) + scatter_count_to_nodes(bond_src, bond_mask, L)
        return out, counts

    def conv_cross_rev(self, group_fwd, group_rev, recv_attr, recv_pos, src_attr, src_pos,
                       idx, edge_emb, idx_mask, ns, sh_lmax=1, deterministic=True):
        """Both directions of the capped cross edge list in one fused kernel:
        returns (lig_sum, lig_counts, rec_sum or None, rec_counts or None),
        or None when the fused path does not apply. group_rev=None skips the
        reversed direction (the last trunk layer)."""
        import os

        from ..ops.graph_builders import scatter_count_to_nodes
        from ..ops.pallas import tpconv_lig as _tpl

        if not (
            os.environ.get("CBT_FUSED_LIGSIDE", "1") == "1"  # TPU-validated; =0 to disable
            and self._fused_mode(deterministic) == "ladder1"
            and sh_lmax == 1
            and self.n_edge_features == edge_emb.shape[-1] + 2 * ns
            # Mosaic's shape-cast of the [T_l, K, F] edge block requires a
            # lane-aligned K (measured: K=48 fine, K=205 "unsupported shape
            # cast"); misaligned caps (user-pinned --cross_cap) take the XLA
            # path. effective_cross_cap rounds scaled caps to 32.
            and idx.shape[-1] % 16 == 0
        ):
            return None
        pf = self.edge_mlps[group_fwd].variables["params"]
        if group_rev is not None:
            pr = self.edge_mlps[group_rev].variables["params"]
            rw = (pr["Dense_0"]["kernel"], pr["Dense_0"]["bias"], pr["Dense_1"]["kernel"], pr["Dense_1"]["bias"])
        else:
            rw = (None, None, None, None)

        # the REV direction accumulates a [N, out] scatter in VMEM, so the
        # kernel's stack grows with N as well as K — shrink the K chunk on
        # big receptor buckets (measured: N=2048 @ K=128 needs 51.5M of a
        # 48M scoped limit; K=64 fits)
        kmax = 128 if src_attr.shape[1] <= 1024 else 64
        lig_sum, rec_sum = _chunk_cross_k(
            lambda i, e, mm: _tpl.fused_tpconv_cross_rev(
                recv_attr, recv_pos, src_attr, src_pos, i, e, mm,
                pf["Dense_0"]["kernel"], pf["Dense_0"]["bias"], pf["Dense_1"]["kernel"], pf["Dense_1"]["bias"],
                *rw, self.in_irreps, self.out_irreps, ns,
            ),
            idx, edge_emb, idx_mask, kmax=kmax,
        )
        lig_counts = jnp.sum(idx_mask, axis=-1).astype(jnp.float32)
        rec_counts = None
        if rec_sum is not None:
            B = idx.shape[0]
            N = src_attr.shape[1]
            rec_counts = scatter_count_to_nodes(idx.reshape(B, -1), idx_mask.reshape(B, -1), N)
        return lig_sum, lig_counts, rec_sum, rec_counts

    def msgs_nbr(self, group, sender_attr, edge_sh, edge_attr, edge_mask, deterministic=True):
        """Per-edge messages over a neighbor list [..., K, *] -> [..., K, out],
        masked entries exactly zero. Fused Pallas path on TPU (same gating as
        conv_nbr); used by edge groups that scatter to OTHER nodes afterwards
        (the reversed-cross receptor<-ligand group)."""
        from ..ops.pallas import tpconv_g as _tpg
        from ..ops.pallas import tpconv_v3 as _tpconv

        mode = self._fused_mode(deterministic)
        if mode is None:
            return self.messages(group, sender_attr, edge_sh, edge_attr, edge_mask, deterministic=deterministic)

        p = self.edge_mlps[group].variables["params"]
        w1, b1 = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
        w2, b2 = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
        lead = sender_attr.shape[:-2]
        K = sender_attr.shape[-2]
        flat = lambda a: a.reshape((-1, K) + a.shape[len(lead) + 1 :])
        if mode == "ladder1":
            out = _tpconv.fused_tpconv_msgs(
                flat(edge_attr), flat(sender_attr), flat(edge_sh), flat(edge_mask),
                w1, b1, w2, b2, self.in_irreps, self.out_irreps,
            )
        else:
            out = _tpg.fused_tpconv_msgs_g(
                flat(edge_attr), flat(sender_attr), flat(edge_sh), flat(edge_mask),
                w1, b1, w2, b2, self.in_irreps, self.sh_irreps, self.out_irreps,
            )
        return out.reshape(lead + (K, out.shape[-1]))

    def messages(self, group, sender_attr, edge_sh, edge_attr, edge_mask, edge_weight=None, deterministic=True):
        """Per-edge messages for one edge group; masked entries are zero.

        sender_attr/edge_sh/edge_attr share leading shape [...]; returns
        [..., out_dim]. In training the differentiable fused kernel applies
        (tpconv_train.py) unless a per-edge weight is given.
        """
        if edge_weight is None:
            tmode = self._train_fused_mode(deterministic)
            if tmode is not None:
                return self._fused_train(group, sender_attr, edge_sh, edge_attr, edge_mask, tmode, sum_k=False)
        w = self.edge_mlps[group](edge_attr, deterministic=deterministic)
        if edge_weight is not None:
            w = w * edge_weight[..., None]
        msg = self.tp(sender_attr, edge_sh, w)
        return jnp.where(edge_mask[..., None], msg, 0.0)

    def finalize(self, x_in, msg_sum, msg_count, node_mask, use_running_average=True):
        """mean-aggregate, (depthwise: linear mix), batch norm, residual."""
        out = msg_sum / jnp.maximum(msg_count, 1.0)[..., None]
        if self.depthwise:
            out = self.linear_2(out)
        if self.batch_norm:
            out = self.bn(out, node_mask, use_running_average=use_running_average)
            out = jnp.where(node_mask[..., None], out, 0.0)
        if self.residual:
            out = out + pad_residual(x_in, self.out_dim)
        return out
