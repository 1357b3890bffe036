"""Evaluator metric dict, side-chain machinery, native lib fallbacks."""

import numpy as np
import jax
import jax.numpy as jnp

from confidence_bootstrapping_tpu.eval import metrics as metrics_mod
from confidence_bootstrapping_tpu.data import parse_chi
from confidence_bootstrapping_tpu.data.mol_io import Residue
from confidence_bootstrapping_tpu.train.losses import sidechain_losses


def test_performance_metrics_keys_and_values():
    rng = np.random.RandomState(0)
    C, N = 10, 10
    rmsds = rng.rand(C, N) * 10
    cents = rng.rand(C, N) * 8
    confs = -rmsds + rng.randn(C, N) * 0.1  # good confidence model
    self_d = rng.rand(C, N) * 2
    rt = rng.rand(C)
    m = metrics_mod.performance_metrics(rmsds, cents, confs, self_d, rt)
    for key in [
        "rmsds_below_2", "min_rmsds_below_2", "top5_rmsds_below_2", "top10_rmsds_below_2",
        "filtered_rmsds_below_2", "reverse_filtered_rmsds_below_2", "run_times_mean",
        "centroid_below_5", "self_intersect_fraction", "top5_filtered_rmsds_below_2",
    ]:
        assert key in m, key
    # a good confidence model makes filtered rmsds better than reverse-filtered
    assert m["filtered_rmsds_percentile_50"] < m["reverse_filtered_rmsds_percentile_50"]


def test_min_self_distance():
    pos = np.asarray([[0.0, 0, 0], [1.5, 0, 0], [3.0, 0, 0]])
    bonds = [(0, 1, 1), (1, 2, 1)]
    d = metrics_mod.min_self_distance(pos, bonds)
    assert abs(d - 3.0) < 1e-9  # only the non-bonded 0-2 pair counts


def test_chi_angles_known_geometry():
    # a serine with a synthetic geometry: chi1 = N-CA-CB-OG dihedral
    r = Residue("SER", "A", 1, " ")
    r.atoms = {
        "N": np.asarray([0.0, 1.4, 0.0]),
        "CA": np.asarray([0.0, 0.0, 0.0]),
        "CB": np.asarray([1.4, 0.0, 0.0]),
        "OG": np.asarray([1.4, -1.0, 1.0]),
        "C": np.asarray([-1.0, -1.0, 0.0]),
    }
    chi = parse_chi.residue_chi_angles(r)
    assert np.isfinite(chi[0]) and np.isnan(chi[1])
    assert 0 <= chi[0] < 1
    bb = parse_chi.residue_backbone_vecs(r)
    np.testing.assert_allclose(np.linalg.norm(bb, axis=1), 1.0, atol=1e-5)


def test_sidechain_loss_masking():
    B, N = 2, 8
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(B, N, 10).astype(np.float32))
    target = rng.rand(B, N, 10).astype(np.float32)
    target[:, :, 1] = np.nan  # chi2 undefined everywhere
    mask = np.ones((B, N), dtype=bool)
    mask[:, -2:] = False
    sl, bl, sb, bb = sidechain_losses(pred, jnp.asarray(target), jnp.asarray(mask))
    assert np.isfinite(float(sl)) and np.isfinite(float(bl))


def test_sidechain_head_equivariance():
    from scipy.spatial.transform import Rotation as Rot

    from confidence_bootstrapping_tpu.config import ScoreModelConfig
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from test_score_model import make_random_batch

    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1, lm_embedding_dim=16,
        dropout=0.0, sidechain_pred=True,
    )
    batch = make_random_batch()
    model = TensorProductScoreModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out.sidechain_pred.shape == (2, batch.rec_pos.shape[1], 10)
    # scalars (chi) invariant, vectors rotate
    rot = Rot.random(random_state=3).as_matrix().astype(np.float32)
    b_r = batch.replace(
        lig_pos=jnp.asarray(np.asarray(batch.lig_pos) @ rot.T),
        rec_pos=jnp.asarray(np.asarray(batch.rec_pos) @ rot.T),
    )
    out_r = model.apply(variables, b_r)
    np.testing.assert_allclose(
        np.asarray(out_r.sidechain_pred[..., :4]), np.asarray(out.sidechain_pred[..., :4]), atol=2e-3
    )
    v = np.asarray(out.sidechain_pred[..., 4:]).reshape(2, -1, 2, 3)
    v_r = np.asarray(out_r.sidechain_pred[..., 4:]).reshape(2, -1, 2, 3)
    np.testing.assert_allclose(v_r, v @ rot.T, atol=2e-3)
