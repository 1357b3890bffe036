"""Differentiable fused TP-conv (training path) vs jax.grad of the XLA path.

The reference trains through the same fused TP kernels it infers with
(reference models/tensor_layers.py:120-217); these tests pin that the
custom_vjp op's forward AND backward match autodiff of the pure-XLA
composition (edge MLP -> dropout -> WeightedTensorProduct -> mask -> sum)
to float32 tolerance in interpret mode, for both the lmax=1 ladder and the
lmax=2 all-atom layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confidence_bootstrapping_tpu.ops.irreps import WeightedTensorProduct, spherical_harmonics
from confidence_bootstrapping_tpu.ops.pallas import tpconv_train


def _xla_ref(edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2, irreps_in, irreps_sh, irreps_out, sum_k):
    tp = WeightedTensorProduct(irreps_in, irreps_sh, irreps_out)
    h = jax.nn.relu(edge_attr @ w1 + b1)
    if dmask is not None:
        h = h * dmask
    w = h @ w2 + b2
    msg = tp(sender, sh, w)
    msg = jnp.where(mask[..., None], msg, 0.0)
    return jnp.sum(msg, axis=-2) if sum_k else msg


def _case(irreps, sh_lmax, M=16, K=6, Fe=24, H=24, seed=0):
    tp = WeightedTensorProduct(irreps, f"1x0e + 1x1o" if sh_lmax == 1 else "1x0e + 1x1o + 1x2e", irreps)
    rng = np.random.RandomState(seed)
    edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, tp.irreps_in.dim).astype(np.float32))
    sh = spherical_harmonics(sh_lmax, jnp.asarray(rng.randn(M, K, 3).astype(np.float32)))
    mask = jnp.asarray(rng.rand(M, K) > 0.3)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, tp.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(tp.weight_numel).astype(np.float32) * 0.1)
    return edge_attr, sender, sh, mask, w1, b1, w2, b2


@pytest.mark.parametrize("sum_k", [True, False])
@pytest.mark.parametrize(
    "irreps,sh_irreps,sh_lmax",
    [
        ("8x0e + 3x1o + 3x1e + 2x0o", "1x0e + 1x1o", 1),
        ("8x0e + 3x1o + 3x1e + 2x0o", "1x0e + 1x1o + 1x2e", 2),
    ],
)
def test_train_op_value_and_grads_match_xla(irreps, sh_irreps, sh_lmax, sum_k):
    edge_attr, sender, sh, mask, w1, b1, w2, b2 = _case(irreps, sh_lmax)
    cot = jnp.asarray(np.random.RandomState(9).randn(*(
        (edge_attr.shape[0],) + (() if sum_k else (edge_attr.shape[1],))
    ), WeightedTensorProduct(irreps, sh_irreps, irreps).irreps_out.dim).astype(np.float32))

    def loss_ref(edge_attr, sender, sh, w1, b1, w2, b2):
        out = _xla_ref(edge_attr, sender, sh, mask, None, w1, b1, w2, b2, irreps, sh_irreps, irreps, sum_k)
        return jnp.sum(out * cot)

    def loss_fused(edge_attr, sender, sh, w1, b1, w2, b2):
        out = tpconv_train.fused_tpconv_train(
            edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, sh_irreps, irreps,
            sum_k=sum_k, use_bf16=False, interpret=True,
        )
        return jnp.sum(out * cot)

    args = (edge_attr, sender, sh, w1, b1, w2, b2)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=tuple(range(7)))(*args)
    v_fus, g_fus = jax.value_and_grad(loss_fused, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=2e-4)
    for name, a, b in zip(["edge_attr", "sender", "sh", "w1", "b1", "w2", "b2"], g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4, err_msg=name)


def test_train_op_dropout_mask_applied_and_grads():
    irreps, sh_irreps = "8x0e + 3x1o + 3x1e + 2x0o", "1x0e + 1x1o"
    edge_attr, sender, sh, mask, w1, b1, w2, b2 = _case(irreps, 1)
    rng = np.random.RandomState(3)
    p = 0.25
    dmask = jnp.asarray((rng.rand(*edge_attr.shape[:2], w1.shape[1]) > p).astype(np.float32) / (1 - p))
    cot = jnp.asarray(rng.randn(edge_attr.shape[0], WeightedTensorProduct(irreps, sh_irreps, irreps).irreps_out.dim).astype(np.float32))

    def loss_ref(edge_attr, sender, w1, b1, w2, b2):
        out = _xla_ref(edge_attr, sender, sh, mask, dmask, w1, b1, w2, b2, irreps, sh_irreps, irreps, True)
        return jnp.sum(out * cot)

    def loss_fused(edge_attr, sender, w1, b1, w2, b2):
        out = tpconv_train.fused_tpconv_train(
            edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, sh_irreps, irreps,
            dmask=dmask, sum_k=True, use_bf16=False, interpret=True,
        )
        return jnp.sum(out * cot)

    args = (edge_attr, sender, w1, b1, w2, b2)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=tuple(range(6)))(*args)
    v_fus, g_fus = jax.value_and_grad(loss_fused, argnums=tuple(range(6)))(*args)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=2e-4)
    for name, a, b in zip(["edge_attr", "sender", "w1", "b1", "w2", "b2"], g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4, err_msg=name)


def test_train_op_chunked_backward_matches_single_chunk():
    """M*K big enough to trigger the scanned backward (> 2*_CHUNK edges)."""
    irreps, sh_irreps = "8x0e + 3x1o", "1x0e + 1x1o"
    edge_attr, sender, sh, mask, w1, b1, w2, b2 = _case(irreps, 1, M=1040, K=6, seed=4)
    assert 1040 * 6 > 2 * tpconv_train._CHUNK

    def loss(edge_attr, w1):
        out = tpconv_train.fused_tpconv_train(
            edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, sh_irreps, irreps,
            sum_k=True, use_bf16=False, interpret=True,
        )
        return jnp.sum(out**2)

    def loss_ref(edge_attr, w1):
        out = _xla_ref(edge_attr, sender, sh, mask, None, w1, b1, w2, b2, irreps, sh_irreps, irreps, True)
        return jnp.sum(out**2)

    g = jax.grad(loss, argnums=(0, 1))(edge_attr, w1)
    gr = jax.grad(loss_ref, argnums=(0, 1))(edge_attr, w1)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_score_model_train_grads_fused_vs_xla(monkeypatch):
    """Full score-model loss gradients: fused training kernels (interpret
    mode, f32) vs the XLA path — the model-level pin that the custom_vjp
    routing in TPConv.messages/conv_nbr is transparent to training."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_score_model import SMALL_CFG, make_random_batch
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.train import diffusion
    from confidence_bootstrapping_tpu.train.losses import score_matching_loss
    from confidence_bootstrapping_tpu.config import TrainConfig

    batch = make_random_batch(B=2)
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = TrainConfig()
    noised, targets = diffusion.apply_noise(batch, jax.random.PRNGKey(1), SMALL_CFG.sigma, cfg)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            noised, deterministic=False, use_running_average=False,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        lb = score_matching_loss(
            out.tr_pred, out.rot_pred, out.tor_pred, targets, noised, SMALL_CFG.sigma,
            cfg.tr_weight, cfg.rot_weight, cfg.tor_weight, SMALL_CFG.no_torsion,
        )
        return lb.loss

    monkeypatch.setenv("CBT_FUSED_TRAIN", "0")
    l_xla, g_xla = jax.value_and_grad(loss_fn)(variables["params"])
    monkeypatch.setenv("CBT_FUSED_TRAIN", "interpret")
    l_fus, g_fus = jax.value_and_grad(loss_fn)(variables["params"])

    np.testing.assert_allclose(float(l_fus), float(l_xla), rtol=1e-4)
    flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_f = jax.tree_util.tree_leaves_with_path(g_fus)
    assert len(flat_x) == len(flat_f)
    for (px, ax), (pf, af) in zip(flat_x, flat_f):
        assert px == pf
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(px),
        )


def _xla_rec_ref(node_attr, pos, nbr, edge_emb, sig, mask, dmask, w1, b1, w2, b2,
                 irreps, sh_irr, ns, lmax):
    from confidence_bootstrapping_tpu.ops.graph_builders import gather_nodes

    tp = WeightedTensorProduct(irreps, sh_irr, irreps)
    sender = gather_nodes(node_attr, nbr)
    spos = gather_nodes(pos, nbr)
    vec = spos - pos[:, :, None, :]
    sh = spherical_harmonics(lmax, vec)
    B, N, K = nbr.shape
    recv = jnp.broadcast_to(node_attr[:, :, None, :ns], (B, N, K, ns))
    eattr = jnp.concatenate([edge_emb + sig[:, None, None, :], recv, sender[..., :ns]], axis=-1)
    h = jax.nn.relu(eattr @ w1 + b1)
    if dmask is not None:
        h = h * dmask
    w = h @ w2 + b2
    msg = tp(sender, sh, w)
    msg = jnp.where(mask[..., None], msg, 0.0)
    return jnp.sum(msg, axis=2)


@pytest.mark.parametrize("lmax,dropout", [(1, False), (2, False), (1, True)])
def test_rec_train_op_grads_match_xla(lmax, dropout):
    """fused_tpconv_rec_train (in-kernel gather fwd + XLA chunked bwd with
    node-table scatter + sh-jacobian d_pos) vs jax.grad of the XLA
    composition, interpret mode, f32."""
    from confidence_bootstrapping_tpu.ops.pallas import tpconv_train as tpt

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    sh_irr = "1x0e + 1x1o" if lmax == 1 else "1x0e + 1x1o + 1x2e"
    ns, B, N, K = 8, 2, 16, 4
    Fe, H = 3 * ns, 20
    tp = WeightedTensorProduct(irreps, sh_irr, irreps)
    rng = np.random.RandomState(7)
    node_attr = jnp.asarray(rng.randn(B, N, tp.irreps_in.dim).astype(np.float32))
    pos = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 5)
    nbr = jnp.asarray(rng.randint(0, N, (B, N, K)).astype(np.int32))
    edge_emb = jnp.asarray(rng.randn(B, N, K, ns).astype(np.float32))
    sig = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, N, K) > 0.3)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, tp.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(tp.weight_numel).astype(np.float32) * 0.1)
    dmask = None
    if dropout:
        dmask = jnp.asarray((rng.rand(B, N, K, H) > 0.25).astype(np.float32) / 0.75)
    cot = jnp.asarray(rng.randn(B, N, tp.irreps_out.dim).astype(np.float32))

    def loss_ref(node_attr, pos, edge_emb, sig, w1, b1, w2, b2):
        out = _xla_rec_ref(node_attr, pos, nbr, edge_emb, sig, mask, dmask,
                           w1, b1, w2, b2, irreps, sh_irr, ns, lmax)
        return jnp.sum(out * cot)

    def loss_fused(node_attr, pos, edge_emb, sig, w1, b1, w2, b2):
        out = tpt.fused_tpconv_rec_train(
            node_attr, pos, nbr, edge_emb, sig, mask, w1, b1, w2, b2,
            irreps, sh_irr, irreps, ns, dmask=dmask, use_bf16=False, interpret=True,
        )
        return jnp.sum(out * cot)

    args = (node_attr, pos, edge_emb, sig, w1, b1, w2, b2)
    names = ["node_attr", "pos", "edge_emb", "sig", "w1", "b1", "w2", "b2"]
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=tuple(range(8)))(*args)
    v_fus, g_fus = jax.value_and_grad(loss_fused, argnums=tuple(range(8)))(*args)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=5e-4)
    for name, a, b in zip(names, g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3, err_msg=name)


def test_xla_bwd_fallback_matches_pallas_bwd(monkeypatch):
    """The chunked-XLA backward (CBT_PALLAS_BWD=0) and the Pallas backward
    kernel produce identical gradients (both are live paths: XLA is the
    CPU/fallback route, Pallas the TPU route)."""
    irreps, sh_irr = "8x0e + 3x1o + 3x1e + 2x0o", "1x0e + 1x1o"
    edge_attr, sender, sh, mask, w1, b1, w2, b2 = _case(irreps, 1, seed=21)
    cot = jnp.asarray(np.random.RandomState(22).randn(
        edge_attr.shape[0], WeightedTensorProduct(irreps, sh_irr, irreps).irreps_out.dim).astype(np.float32))

    def loss(edge_attr, sender, w1, b1, w2, b2):
        out = tpconv_train.fused_tpconv_train(
            edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, sh_irr, irreps,
            sum_k=True, use_bf16=False, interpret=True,
        )
        return jnp.sum(out * cot)

    args = (edge_attr, sender, w1, b1, w2, b2)
    monkeypatch.setenv("CBT_PALLAS_BWD", "0")
    tpconv_train._make_op.cache_clear()
    g_xla = jax.grad(loss, argnums=tuple(range(6)))(*args)
    monkeypatch.setenv("CBT_PALLAS_BWD", "auto")
    tpconv_train._make_op.cache_clear()
    g_pal = jax.grad(loss, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_pal, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
