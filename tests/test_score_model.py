"""Score model: shape, equivariance, masking-invariance tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rot

from confidence_bootstrapping_tpu.config import ScoreModelConfig
from confidence_bootstrapping_tpu.data.complex_graph import ComplexBatch
from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel


def make_random_batch(B=2, L=12, E=24, R=4, N=24, KR=8, lm_dim=16, seed=0, pad_lig=0, pad_rec=0):
    """Small random complex batch (chain ligand so torsion masks are sane)."""
    rng = np.random.RandomState(seed)
    l_real, n_real = L - pad_lig, N - pad_rec

    lig_f = rng.randint(0, 2, size=(B, L, 16))
    lig_pos = rng.randn(B, L, 3).astype(np.float32) * 3
    lig_mask = np.zeros((B, L), dtype=bool)
    lig_mask[:, :l_real] = True

    # chain bonds 0-1-...-l_real-1, directed both ways
    src = np.concatenate([np.arange(l_real - 1), np.arange(1, l_real)])
    dst = np.concatenate([np.arange(1, l_real), np.arange(l_real - 1)])
    e_real = len(src)
    lig_edge_src = np.zeros((B, E), dtype=np.int32)
    lig_edge_dst = np.zeros((B, E), dtype=np.int32)
    lig_edge_mask = np.zeros((B, E), dtype=bool)
    lig_edge_src[:, :e_real] = src
    lig_edge_dst[:, :e_real] = dst
    lig_edge_mask[:, :e_real] = True
    lig_edge_attr = np.zeros((B, E, 4), dtype=np.float32)
    lig_edge_attr[:, :e_real, 0] = 1.0

    # two rotatable bonds in the middle of the chain
    tor_src = np.zeros((B, R), dtype=np.int32)
    tor_dst = np.zeros((B, R), dtype=np.int32)
    tor_mask = np.zeros((B, R), dtype=bool)
    mask_rotate = np.zeros((B, R, L), dtype=bool)
    for r, (u, v) in enumerate([(3, 4), (5, 6)]):
        tor_src[:, r], tor_dst[:, r], tor_mask[:, r] = u, v, True
        mask_rotate[:, r, v:l_real] = True

    rec_f = rng.randint(0, 20, size=(B, N))
    rec_pos = rng.randn(B, N, 3).astype(np.float32) * 8 + 5
    rec_lm = rng.randn(B, N, lm_dim).astype(np.float32)
    rec_mask = np.zeros((B, N), dtype=bool)
    rec_mask[:, :n_real] = True
    # kNN neighbor lists among real nodes
    rec_nbr = np.zeros((B, N, KR), dtype=np.int32)
    rec_nbr_mask = np.zeros((B, N, KR), dtype=bool)
    for b in range(B):
        d = np.linalg.norm(rec_pos[b, :n_real, None] - rec_pos[b, None, :n_real], axis=-1)
        np.fill_diagonal(d, 1e9)
        for i in range(n_real):
            nn_idx = np.argsort(d[i])[:KR]
            rec_nbr[b, i] = np.pad(nn_idx, (0, KR - len(nn_idx)))
            rec_nbr_mask[b, i, : len(nn_idx)] = True

    return ComplexBatch(
        lig_f=jnp.asarray(lig_f),
        lig_pos=jnp.asarray(lig_pos),
        lig_mask=jnp.asarray(lig_mask),
        lig_edge_src=jnp.asarray(lig_edge_src),
        lig_edge_dst=jnp.asarray(lig_edge_dst),
        lig_edge_attr=jnp.asarray(lig_edge_attr),
        lig_edge_mask=jnp.asarray(lig_edge_mask),
        tor_src=jnp.asarray(tor_src),
        tor_dst=jnp.asarray(tor_dst),
        tor_mask=jnp.asarray(tor_mask),
        mask_rotate=jnp.asarray(mask_rotate),
        rec_f=jnp.asarray(rec_f),
        rec_lm=jnp.asarray(rec_lm),
        rec_pos=jnp.asarray(rec_pos),
        rec_mask=jnp.asarray(rec_mask),
        rec_nbr=jnp.asarray(rec_nbr),
        rec_nbr_mask=jnp.asarray(rec_nbr_mask),
        t_tr=jnp.full((B,), 0.5),
        t_rot=jnp.full((B,), 0.5),
        t_tor=jnp.full((B,), 0.5),
        orig_center=jnp.zeros((B, 3)),
    )


SMALL_CFG = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1, lm_embedding_dim=16, dropout=0.0)


def _init_and_run(cfg, batch, seed=0):
    model = TensorProductScoreModel(cfg)
    variables = model.init(jax.random.PRNGKey(seed), batch)
    out = model.apply(variables, batch)
    return model, variables, out


def test_forward_shapes():
    batch = make_random_batch()
    _, _, out = _init_and_run(SMALL_CFG, batch)
    assert out.tr_pred.shape == (2, 3)
    assert out.rot_pred.shape == (2, 3)
    assert out.tor_pred.shape == (2, 4)
    assert np.isfinite(np.asarray(out.tr_pred)).all()
    assert np.isfinite(np.asarray(out.rot_pred)).all()
    assert np.isfinite(np.asarray(out.tor_pred)).all()
    # padded torsion slots must be zero
    np.testing.assert_allclose(np.asarray(out.tor_pred)[:, 2:], 0.0)


def test_se3_equivariance():
    """Rotating the whole complex rotates tr/rot predictions; tor invariant."""
    batch = make_random_batch()
    model, variables, out = _init_and_run(SMALL_CFG, batch)

    rot = Rot.random(random_state=42).as_matrix().astype(np.float32)
    shift = np.asarray([1.0, -2.0, 3.0], dtype=np.float32)
    batch_r = batch.replace(
        lig_pos=jnp.asarray((np.asarray(batch.lig_pos) @ rot.T + shift)),
        rec_pos=jnp.asarray((np.asarray(batch.rec_pos) @ rot.T + shift)),
    )
    out_r = model.apply(variables, batch_r)

    np.testing.assert_allclose(np.asarray(out_r.tr_pred), np.asarray(out.tr_pred) @ rot.T, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_r.rot_pred), np.asarray(out.rot_pred) @ rot.T, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_r.tor_pred), np.asarray(out.tor_pred), atol=2e-3)


@pytest.mark.slow
def test_padding_invariance():
    """Extra padded slots must not change predictions."""
    b_small = make_random_batch(B=1, L=12, N=24, seed=3)
    model, variables, out_small = _init_and_run(SMALL_CFG, b_small)

    b_big = make_random_batch(B=1, L=16, E=24, N=32, seed=3, pad_lig=4, pad_rec=8)
    # same real content by construction (same seed draws first): rebuild real parts
    b_big = b_big.replace(
        lig_f=b_big.lig_f.at[:, :12].set(b_small.lig_f),
        lig_pos=b_big.lig_pos.at[:, :12].set(b_small.lig_pos),
        rec_f=b_big.rec_f.at[:, :24].set(b_small.rec_f),
        rec_pos=b_big.rec_pos.at[:, :24].set(b_small.rec_pos),
        rec_lm=b_big.rec_lm.at[:, :24].set(b_small.rec_lm),
        rec_nbr=b_big.rec_nbr.at[:, :24, :].set(b_small.rec_nbr),
        rec_nbr_mask=b_big.rec_nbr_mask.at[:, :24, :].set(b_small.rec_nbr_mask),
    )
    out_big = model.apply(variables, b_big)
    np.testing.assert_allclose(np.asarray(out_big.tr_pred), np.asarray(out_small.tr_pred), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_big.rot_pred), np.asarray(out_small.rot_pred), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_big.tor_pred)[:, :4], np.asarray(out_small.tor_pred), atol=1e-4
    )


def test_confidence_mode():
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1, lm_embedding_dim=16, dropout=0.0,
        confidence_mode=True, crop_beyond=20.0,
    )
    batch = make_random_batch()
    batch = batch.set_time(0.0, 0.0, 0.0)
    model = TensorProductScoreModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out.confidence.shape == (2,)
    assert np.isfinite(np.asarray(out.confidence)).all()


def test_rec_cache_matches_inline():
    batch = make_random_batch()
    model, variables, out = _init_and_run(SMALL_CFG, batch)
    cache = model.apply(variables, batch, method="embed_receptor")
    out_c = model.apply(variables, batch, rec_cache=cache)
    np.testing.assert_allclose(np.asarray(out.tr_pred), np.asarray(out_c.tr_pred), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.tor_pred), np.asarray(out_c.tor_pred), atol=1e-6)
