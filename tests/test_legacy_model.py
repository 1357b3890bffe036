"""Legacy (old-architecture) score model: shapes, SE(3) equivariance,
confidence mode, factory dispatch (reference models/old_score_model.py,
selected by inference.py --old_score_model)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rot

from confidence_bootstrapping_tpu.config import ScoreModelConfig
from confidence_bootstrapping_tpu.models.factory import get_model
from confidence_bootstrapping_tpu.models.legacy import OldAllAtomScoreModel, OldTensorProductScoreModel
from tests.test_score_model import make_random_batch
from tests.test_all_atom_model import make_aa_batch

LEGACY_CFG = ScoreModelConfig(
    ns=8, nv=2, sh_lmax=2, num_conv_layers=3, lm_embedding_dim=16, dropout=0.0,
    old_score_model=True, smooth_edges=True,
)


def _run(cfg, batch, seed=0):
    model = OldTensorProductScoreModel(cfg)
    variables = model.init(jax.random.PRNGKey(seed), batch)
    return model, variables, model.apply(variables, batch)


def test_factory_dispatches_legacy():
    assert isinstance(get_model(LEGACY_CFG), OldTensorProductScoreModel)


def test_legacy_forward_shapes():
    batch = make_random_batch()
    _, _, out = _run(LEGACY_CFG, batch)
    assert out.tr_pred.shape == (2, 3)
    assert out.rot_pred.shape == (2, 3)
    assert out.tor_pred.shape == (2, 4)
    for a in (out.tr_pred, out.rot_pred, out.tor_pred):
        assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(out.tor_pred)[:, 2:], 0.0)


def test_legacy_se3_equivariance():
    """The legacy trunk (per-group conv layers, manual residual, lmax=2 sh)
    is still SE(3)-equivariant: tr/rot rotate, torsion invariant."""
    batch = make_random_batch()
    model, variables, out = _run(LEGACY_CFG, batch)

    rot = Rot.random(random_state=7).as_matrix().astype(np.float32)
    shift = np.asarray([2.0, 1.0, -3.0], dtype=np.float32)
    batch_r = batch.replace(
        lig_pos=jnp.asarray(np.asarray(batch.lig_pos) @ rot.T + shift),
        rec_pos=jnp.asarray(np.asarray(batch.rec_pos) @ rot.T + shift),
    )
    out_r = model.apply(variables, batch_r)
    np.testing.assert_allclose(np.asarray(out_r.tr_pred), np.asarray(out.tr_pred) @ rot.T, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_r.rot_pred), np.asarray(out.rot_pred) @ rot.T, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_r.tor_pred), np.asarray(out.tor_pred), atol=3e-3)


def test_legacy_confidence_and_separate_schedule():
    import dataclasses

    batch = make_random_batch()
    cfg = dataclasses.replace(
        LEGACY_CFG, confidence_mode=True, separate_noise_schedule=True, use_old_atom_encoder=True
    )
    _, _, out = _run(cfg, batch)
    assert out.confidence.shape == (2,)
    assert np.isfinite(np.asarray(out.confidence)).all()
    assert out.tr_pred is None


# ---------------------------------------------------------------------- #
# legacy ALL-ATOM model (reference models/old_all_atom_score_model.py)

LEGACY_AA_CFG = ScoreModelConfig(
    ns=8, nv=2, sh_lmax=2, num_conv_layers=3, lm_embedding_dim=16, dropout=0.0,
    old_score_model=True, all_atoms=True, smooth_edges=True,
)


def _run_aa(cfg, batch, seed=0):
    model = OldAllAtomScoreModel(cfg)
    variables = model.init(jax.random.PRNGKey(seed), batch)
    return model, variables, model.apply(variables, batch)


def test_factory_dispatches_legacy_all_atom():
    assert isinstance(get_model(LEGACY_AA_CFG), OldAllAtomScoreModel)


def test_legacy_aa_forward_shapes():
    batch = make_aa_batch()
    _, _, out = _run_aa(LEGACY_AA_CFG, batch)
    assert out.tr_pred.shape == (2, 3)
    assert out.rot_pred.shape == (2, 3)
    assert out.tor_pred.shape == (2, 4)
    for a in (out.tr_pred, out.rot_pred, out.tor_pred):
        assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(out.tor_pred)[:, 2:], 0.0)


def test_legacy_aa_se3_equivariance():
    batch = make_aa_batch()
    model, variables, out = _run_aa(LEGACY_AA_CFG, batch)

    rot = Rot.random(random_state=11).as_matrix().astype(np.float32)
    shift = np.asarray([1.0, -2.0, 3.0], dtype=np.float32)
    batch_r = batch.replace(
        lig_pos=jnp.asarray(np.asarray(batch.lig_pos) @ rot.T + shift),
        rec_pos=jnp.asarray(np.asarray(batch.rec_pos) @ rot.T + shift),
        atom_pos=jnp.asarray(np.asarray(batch.atom_pos) @ rot.T + shift),
    )
    out_r = model.apply(variables, batch_r)
    np.testing.assert_allclose(np.asarray(out_r.tr_pred), np.asarray(out.tr_pred) @ rot.T, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_r.rot_pred), np.asarray(out.rot_pred) @ rot.T, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_r.tor_pred), np.asarray(out.tor_pred), atol=3e-3)


def test_legacy_aa_parallel_affinity():
    """parallel=2: confidence head splits into per-pose filtering logits and
    one aggregated affinity per group of 2 consecutive batch elements
    (reference old_all_atom_score_model.py:281-293)."""
    import dataclasses

    batch = make_aa_batch(B=4)
    cfg = dataclasses.replace(
        LEGACY_AA_CFG, confidence_mode=True, affinity_prediction=True, parallel=2,
        no_aminoacid_identities=True, lm_embedding_dim=0,
    )
    _, _, out = _run_aa(cfg, batch)
    assert out.confidence.shape == (2, 2)
    assert out.affinity.shape == (2,)
    assert np.isfinite(np.asarray(out.confidence)).all()
    assert np.isfinite(np.asarray(out.affinity)).all()


def test_legacy_through_sampler_and_confidence_scoring():
    """Legacy models must run through sample_jit and score_confidence: the
    receptor-cache path is gated on the model actually exposing
    embed_receptor (ADVICE r2 high: infer --old_score_model and converted
    legacy confidence checkpoints previously crashed with AttributeError)."""
    import dataclasses

    from confidence_bootstrapping_tpu.config import SamplerConfig
    from confidence_bootstrapping_tpu.sampler import sampling

    batch = make_random_batch()
    model, variables, _ = _run(LEGACY_CFG, batch)
    scfg = SamplerConfig(inference_steps=2)
    b0 = sampling.randomize_position(batch, jax.random.PRNGKey(0), LEGACY_CFG.sigma.tr_sigma_max)
    final, _ = sampling.sample_jit(model, variables, b0, jax.random.PRNGKey(1), LEGACY_CFG, scfg)
    assert np.isfinite(np.asarray(final.lig_pos)).all()

    ccfg = dataclasses.replace(LEGACY_CFG, confidence_mode=True)
    cmodel = OldTensorProductScoreModel(ccfg)
    cvars = cmodel.init(jax.random.PRNGKey(2), batch)
    conf = sampling.score_confidence(cmodel, cvars, batch, lig_pos=final.lig_pos)
    assert conf.shape == (2,)
    assert np.isfinite(np.asarray(conf)).all()
