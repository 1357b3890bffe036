"""Training step + data-parallel mesh tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from confidence_bootstrapping_tpu.config import TrainConfig
from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
from confidence_bootstrapping_tpu.parallel import mesh as meshlib
from confidence_bootstrapping_tpu.train import diffusion, train_loop
from confidence_bootstrapping_tpu.train.losses import score_matching_loss

from test_score_model import SMALL_CFG, make_random_batch


def test_apply_noise_targets():
    batch = make_random_batch(B=4)
    cfg = TrainConfig()
    noised, targets = diffusion.apply_noise(batch, jax.random.PRNGKey(0), SMALL_CFG.sigma, cfg)
    assert np.isfinite(np.asarray(noised.lig_pos)).all()
    assert np.isfinite(np.asarray(targets.tr_score)).all()
    assert np.isfinite(np.asarray(targets.rot_score)).all()
    # torsion targets masked
    np.testing.assert_allclose(np.asarray(targets.tor_score)[:, 2:], 0.0)
    # times in [minimum_t, 1]
    t = np.asarray(noised.t_tr)
    assert (t >= 0).all() and (t <= 1).all()
    # positions moved
    assert np.abs(np.asarray(noised.lig_pos) - np.asarray(batch.lig_pos)).max() > 1e-3


@pytest.mark.slow
def test_train_step_updates_and_finite():
    batch = make_random_batch(B=4)
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(lr=1e-3)
    state = train_loop.init_train_state(variables, cfg)
    step = train_loop.make_train_step(model, SMALL_CFG, cfg)

    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # params and EMA moved
    p0 = jax.tree.leaves(variables["params"])[0]
    p1 = jax.tree.leaves(state.params)[0]
    assert np.abs(np.asarray(p0) - np.asarray(p1)).max() > 0
    e1 = jax.tree.leaves(state.ema_params)[0]
    assert np.abs(np.asarray(e1) - np.asarray(p1)).max() > 0


@pytest.mark.slow
def test_train_step_data_parallel_8_devices():
    """The same jitted step with the batch sharded over an 8-device mesh."""
    assert len(jax.devices()) == 8, "conftest should force 8 virtual cpu devices"
    m = meshlib.make_mesh()
    batch = make_random_batch(B=8)
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(lr=1e-3)
    state = train_loop.init_train_state(variables, cfg)
    step = train_loop.make_train_step(model, SMALL_CFG, cfg)

    sharded = meshlib.shard_batch(m, batch)
    state_r = meshlib.replicate(m, state)
    new_state, metrics = step(state_r, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # gradient math must match the single-device run
    new_state_1, metrics_1 = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics_1["loss"]), rtol=1e-4)
    a = jax.tree.leaves(new_state.params)[0]
    b = jax.tree.leaves(new_state_1.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_plateau_scheduler():
    cfg = TrainConfig()
    batch = make_random_batch(B=2)
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    state = train_loop.init_train_state(variables, cfg)
    sched = train_loop.PlateauScheduler(patience=1, factor=0.5)
    state = sched.step(state, 1.0)
    state = sched.step(state, 1.1)
    assert float(state.lr_scale) == 1.0
    state = sched.step(state, 1.2)  # second bad epoch > patience
    assert float(state.lr_scale) == 0.5


def test_layer_freeze_mask_and_masked_step():
    batch = make_random_batch(B=2)
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    mask = train_loop.layer_freeze_mask(variables["params"], step=1)
    # first conv layer frozen (except bn), last unfrozen; heads always train;
    # input embeddings frozen until the final step (reference semantics)
    import jax as _jax

    def leaves(t):
        return [np.asarray(x) for x in _jax.tree.leaves(t) if np.asarray(x).size]

    for k, sub in mask["conv_layers_0"].items():
        for x in leaves(sub):
            assert x.max() == (1.0 if k == "bn" else 0.0), k
    assert all(x.min() == 1.0 for x in leaves(mask["conv_layers_1"]))
    assert all(x.min() == 1.0 for x in leaves(mask["tr_final_layer"]))
    assert all(x.max() == 0.0 for x in leaves(mask["lig_node_embedding"]))
    full = train_loop.layer_freeze_mask(variables["params"], step=3)
    assert all(x.min() == 1.0 for x in leaves(full))

    cfg = TrainConfig(lr=1e-2)
    state = train_loop.init_train_state(variables, cfg)
    step = train_loop.make_train_step(model, SMALL_CFG, cfg)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1), mask)
    # frozen layer MLP params unchanged, unfrozen layer moved
    a0 = _jax.tree.leaves(state.params["conv_layers_0"]["edge_mlps_0"])[0]
    a1 = _jax.tree.leaves(new_state.params["conv_layers_0"]["edge_mlps_0"])[0]
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1))
    b0 = _jax.tree.leaves(state.params["conv_layers_1"]["edge_mlps_0"])[0]
    b1 = _jax.tree.leaves(new_state.params["conv_layers_1"]["edge_mlps_0"])[0]
    assert np.abs(np.asarray(b0) - np.asarray(b1)).max() > 0


def test_tensor_parallel_train_step_matches_single_device():
    """2-D data x model sharding (parallel/mesh.py): channel-sharded weights
    over a (2, 2) mesh give the same loss/params as the unsharded step."""
    from confidence_bootstrapping_tpu.parallel import mesh as meshlib

    batch = make_random_batch(B=4)
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(lr=1e-3)
    state = train_loop.init_train_state(variables, cfg)
    step = train_loop.make_train_step(model, SMALL_CFG, cfg)

    ref_state, ref_metrics = step(state, batch, jax.random.PRNGKey(1))

    mesh2 = meshlib.make_mesh_2d(2, 2)
    tp_state = meshlib.shard_model_tree(mesh2, state)
    tp_batch = meshlib.shard_batch(mesh2, batch)
    tp_new, tp_metrics = step(tp_state, tp_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(tp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4)
    a = jax.tree.leaves(ref_state.params)
    b = jax.tree.leaves(tp_new.params)
    for x, y in zip(a, b):
        # one adam step moves each param by ~±lr regardless of gradient
        # magnitude (m/sqrt(v) = sign(g) after step 1), so reduction-order
        # sign flips on near-zero grads bound the tolerance at 2*lr.
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2.5e-3)
    # at least one kernel actually sharded over the model axis
    specs = jax.tree.leaves(meshlib.model_parallel_specs(state.params, mesh2))
    assert any(s != jax.sharding.PartitionSpec() for s in specs)


def test_torsional_train_step():
    """Torsion-only pretraining step (train_loop.make_torsional_train_step)."""
    batch = make_random_batch(B=2)
    model = TensorProductScoreModel(SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = TrainConfig(lr=1e-3)
    state = train_loop.init_train_state(variables, cfg)
    step = train_loop.make_torsional_train_step(model, SMALL_CFG, cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    eval_step = train_loop.make_torsional_eval_step(model, SMALL_CFG, cfg)
    m = eval_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
