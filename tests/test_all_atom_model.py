"""All-atom model tests: shapes, SE(3) equivariance, confidence mode."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rot

from confidence_bootstrapping_tpu.config import ScoreModelConfig
from confidence_bootstrapping_tpu.models.all_atom_model import AllAtomScoreModel
from confidence_bootstrapping_tpu.models.factory import confidence_model_config, get_model

from test_score_model import make_random_batch


def make_aa_batch(B=2, A=40, KA=4, seed=0):
    batch = make_random_batch(B=B, seed=seed)
    rng = np.random.RandomState(seed + 100)
    N = batch.rec_pos.shape[1]
    n_real_res = int(np.asarray(batch.rec_mask)[0].sum())
    a_real = A - 4
    atom_f = rng.randint(0, 3, size=(B, A, 4))
    # atoms scattered around their residue CA
    atom_res = rng.randint(0, n_real_res, size=(B, A)).astype(np.int32)
    res_pos = np.take_along_axis(np.asarray(batch.rec_pos), atom_res[..., None], axis=1)
    atom_pos = (res_pos + rng.randn(B, A, 3) * 1.5).astype(np.float32)
    atom_mask = np.zeros((B, A), dtype=bool)
    atom_mask[:, :a_real] = True
    atom_nbr = np.zeros((B, A, KA), dtype=np.int32)
    atom_nbr_mask = np.zeros((B, A, KA), dtype=bool)
    for b in range(B):
        d = np.linalg.norm(atom_pos[b, :a_real, None] - atom_pos[b, None, :a_real], axis=-1)
        np.fill_diagonal(d, 1e9)
        for i in range(a_real):
            nn = np.argsort(d[i])[:KA]
            atom_nbr[b, i] = nn
            atom_nbr_mask[b, i] = d[i, nn] < 5.0
    return batch.replace(
        atom_f=jnp.asarray(atom_f),
        atom_pos=jnp.asarray(atom_pos),
        atom_mask=jnp.asarray(atom_mask),
        atom_nbr=jnp.asarray(atom_nbr),
        atom_nbr_mask=jnp.asarray(atom_nbr_mask),
        atom_res=jnp.asarray(atom_res),
    )


AA_CFG = ScoreModelConfig(
    ns=8, nv=2, sh_lmax=2, num_conv_layers=2, num_prot_emb_layers=1, lm_embedding_dim=16,
    dropout=0.0, all_atoms=True,
)


def test_aa_forward_shapes():
    batch = make_aa_batch()
    model = AllAtomScoreModel(AA_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out.tr_pred.shape == (2, 3)
    assert out.rot_pred.shape == (2, 3)
    assert np.isfinite(np.asarray(out.tr_pred)).all()
    assert np.isfinite(np.asarray(out.tor_pred)).all()


def test_aa_se3_equivariance():
    batch = make_aa_batch()
    model = AllAtomScoreModel(AA_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    rot = Rot.random(random_state=7).as_matrix().astype(np.float32)
    shift = np.asarray([0.5, 1.5, -1.0], dtype=np.float32)
    batch_r = batch.replace(
        lig_pos=jnp.asarray(np.asarray(batch.lig_pos) @ rot.T + shift),
        rec_pos=jnp.asarray(np.asarray(batch.rec_pos) @ rot.T + shift),
        atom_pos=jnp.asarray(np.asarray(batch.atom_pos) @ rot.T + shift),
    )
    out_r = model.apply(variables, batch_r)
    np.testing.assert_allclose(np.asarray(out_r.tr_pred), np.asarray(out.tr_pred) @ rot.T, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_r.rot_pred), np.asarray(out.rot_pred) @ rot.T, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_r.tor_pred), np.asarray(out.tor_pred), atol=2e-3)


def test_confidence_architecture_runs():
    """The pretrained-confidence manifest shape (ns=24, lmax=2, crop 20)."""
    cfg = confidence_model_config(ns=8, nv=2, num_conv_layers=2, lm_embedding_dim=16)
    batch = make_aa_batch().set_time(0.0, 0.0, 0.0)
    model = get_model(cfg)
    assert isinstance(model, AllAtomScoreModel)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out.confidence.shape == (2,)
    assert np.isfinite(np.asarray(out.confidence)).all()
