"""All-atom model tests: shapes, SE(3) equivariance, confidence mode."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rot

from confidence_bootstrapping_tpu.config import ScoreModelConfig
from confidence_bootstrapping_tpu.models.all_atom_model import AllAtomScoreModel
from confidence_bootstrapping_tpu.models.factory import confidence_model_config, get_model

from test_score_model import make_random_batch


def make_aa_batch(B=2, A=40, KA=4, seed=0, **kw):
    batch = make_random_batch(B=B, seed=seed, **kw)
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


def test_compact_crop_identity_when_nothing_cropped():
    """compact_crop with a huge crop distance and caps >= bucket sizes is an
    identity on the real nodes: the trunk forward on the compacted view
    (with the remapped cache) matches the full forward exactly."""
    from confidence_bootstrapping_tpu.models.all_atom_model import compact_crop

    cfg = confidence_model_config(ns=8, nv=2, num_conv_layers=2, lm_embedding_dim=16)
    batch = make_aa_batch().set_time(0.0, 0.0, 0.0)
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    full = model.apply(variables, batch).confidence

    cache = model.apply(variables, batch, method="embed_receptor")
    N, A = batch.rec_pos.shape[1], batch.atom_pos.shape[1]
    cb, cc, stats = compact_crop(batch, cache, 1e6, N, A)
    np.testing.assert_array_equal(np.asarray(cb.rec_mask), np.asarray(batch.rec_mask))
    np.testing.assert_array_equal(np.asarray(cb.atom_mask), np.asarray(batch.atom_mask))
    assert int(np.asarray(stats["res_overflow"]).max()) == 0
    out = model.apply(variables, cb, rec_cache=cc).confidence
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-5)


def test_compact_crop_semantics():
    """Cropping semantics match the reference's subgraph crop
    (utils/utils.py:395-420): only residues within crop_dist survive (packed,
    order preserved), their atoms follow, neighbor indices are remapped, and
    edges whose sender was cropped are masked."""
    from confidence_bootstrapping_tpu.models.all_atom_model import compact_crop

    batch = make_aa_batch()
    crop = 6.0
    B = batch.lig_pos.shape[0]
    cb, _, stats = compact_crop(batch, None, crop, 16, 24)

    for b in range(B):
        d = np.linalg.norm(
            np.asarray(batch.rec_pos)[b][None] - np.asarray(batch.lig_pos)[b][:, None], axis=-1
        )
        d = np.where(np.asarray(batch.lig_mask)[b][:, None], d, np.inf).min(0)
        keep = np.asarray(batch.rec_mask)[b] & (d < crop)
        kept_idx = np.flatnonzero(keep)
        assert int(np.asarray(stats["kept_res"])[b]) == len(kept_idx)
        n_kept = len(kept_idx)
        # packed order-preserving selection
        np.testing.assert_array_equal(
            np.asarray(cb.rec_pos)[b, :n_kept], np.asarray(batch.rec_pos)[b, kept_idx]
        )
        assert not np.asarray(cb.rec_mask)[b, n_kept:].any()
        # neighbor remap: surviving edges point at the same coordinates
        old2new = {o: n for n, o in enumerate(kept_idx)}
        for new_i, old_i in enumerate(kept_idx):
            for k in range(batch.rec_nbr.shape[-1]):
                old_nbr = int(np.asarray(batch.rec_nbr)[b, old_i, k])
                was_valid = bool(np.asarray(batch.rec_nbr_mask)[b, old_i, k])
                now_valid = bool(np.asarray(cb.rec_nbr_mask)[b, new_i, k])
                assert now_valid == (was_valid and old_nbr in old2new)
                if now_valid:
                    assert int(np.asarray(cb.rec_nbr)[b, new_i, k]) == old2new[old_nbr]
        # atoms follow their residues, atom_res remapped
        a_keep = np.asarray(batch.atom_mask)[b] & np.isin(np.asarray(batch.atom_res)[b], kept_idx)
        a_idx = np.flatnonzero(a_keep)
        assert int(np.asarray(stats["kept_atoms"])[b]) == len(a_idx)
        np.testing.assert_array_equal(
            np.asarray(cb.atom_pos)[b, : len(a_idx)], np.asarray(batch.atom_pos)[b, a_idx]
        )
        np.testing.assert_array_equal(
            np.asarray(cb.atom_res)[b, : len(a_idx)],
            np.asarray([old2new[o] for o in np.asarray(batch.atom_res)[b, a_idx]]),
        )


def test_score_confidence_compact_path_runs():
    """score_confidence's compacted trunk (crop_res_cap/crop_atom_cap) runs
    and returns finite scores on a batch larger than the caps."""
    import dataclasses

    from confidence_bootstrapping_tpu.sampler import sampling

    cfg = dataclasses.replace(
        confidence_model_config(ns=8, nv=2, num_conv_layers=2, lm_embedding_dim=16),
        crop_beyond=8.0, crop_res_cap=16, crop_atom_cap=24,
    )
    batch = make_aa_batch().set_time(0.0, 0.0, 0.0)
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    conf = sampling.score_confidence(model, variables, batch)
    assert conf.shape == (2,)
    assert np.isfinite(np.asarray(conf)).all()
    # and the uncompacted path still works for comparison
    conf_full = sampling.score_confidence(model, variables, batch, compact=False)
    assert np.isfinite(np.asarray(conf_full)).all()

    # the default is crop-FIRST (training-consistent, ADVICE r2 medium):
    # identical to manually compacting and running a plain forward
    from confidence_bootstrapping_tpu.models.all_atom_model import compact_crop

    cb, _, _ = compact_crop(batch, None, 8.0, 16, 24)
    out = model.apply(variables, cb)
    np.testing.assert_allclose(
        np.asarray(conf), np.nan_to_num(np.asarray(out.confidence), nan=-1000.0),
        rtol=1e-5, atol=1e-5,
    )

    # the opt-in embed-full-then-compact fast path still runs
    conf_fast = sampling.score_confidence(model, variables, batch, embed_full_receptor=True)
    assert np.isfinite(np.asarray(conf_fast)).all()
