"""Training fast path: loss + full parameter gradients through the Pallas
layers (hand-written backwards) must match the XLA path.

VERDICT round-1 item 3. f32 + interpret mode on CPU -> tight tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from targetdiff_tpu.models.score_model import DiffusionModel
from tests.test_fast_forward import NUM_CLASSES, PROTEIN_DIM, batch_mult8, small_flagship


def _setup():
    cfg = small_flagship()
    batch = batch_mult8()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=8)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_fast_train_loss_and_grads_match_xla():
    model, params, batch = _setup()
    key = jax.random.PRNGKey(5)
    t = jnp.array([2, 7])

    def loss_xla(p):
        return model.get_diffusion_loss(p, key, batch, time_step=t)["loss"]

    def loss_fast(p):
        return model.get_diffusion_loss(p, key, batch, time_step=t, impl="fast")["loss"]

    la, ga = jax.value_and_grad(loss_xla)(params)
    lb, gb = jax.value_and_grad(loss_fast)(params)
    assert abs(float(la) - float(lb)) / max(abs(float(la)), 1.0) < 1e-4

    fa, tree_a = jax.tree_util.tree_flatten_with_path(ga)
    fb = jax.tree_util.tree_leaves(gb)
    assert len(fa) == len(fb)
    for (path, a), b in zip(fa, fb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, atol=5e-3 * scale, rtol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fast_bf16_train_grads_close_to_xla():
    """bf16 training variant (VERDICT r2 #3): heavy dots in bf16, f32
    accumulation. Gradients must track the XLA f32 path at bf16-apt
    tolerances on every leaf."""
    model, params, batch = _setup()
    key = jax.random.PRNGKey(5)
    t = jnp.array([2, 7])

    def loss_xla(p):
        return model.get_diffusion_loss(p, key, batch, time_step=t)["loss"]

    def loss_16(p):
        return model.get_diffusion_loss(
            p, key, batch, time_step=t, impl="fast_bf16"
        )["loss"]

    la, ga = jax.value_and_grad(loss_xla)(params)
    lb, gb = jax.value_and_grad(loss_16)(params)
    assert abs(float(la) - float(lb)) / max(abs(float(la)), 1.0) < 2e-2

    fa, _tree = jax.tree_util.tree_flatten_with_path(ga)
    fb = jax.tree_util.tree_leaves(gb)
    assert len(fa) == len(fb)
    for (path, a), b in zip(fa, fb):
        a, b = np.asarray(a), np.asarray(b)
        # 1e-2 floor: softmax shift-invariance makes some k/q bias grads
        # mathematically ~0; bf16 noise on those is benign
        scale = max(np.abs(a).max(), 1e-2)
        assert np.abs(a - b).max() < 0.08 * scale, (
            f"bf16 grad mismatch at {jax.tree_util.keystr(path)}: "
            f"{np.abs(a - b).max():.3e} vs scale {scale:.3e}"
        )


def test_fast_train_step_runs():
    """One full optimizer step on the fast path (trainer wiring)."""
    from targetdiff_tpu.config import Config
    from targetdiff_tpu.trainer import create_train_state, make_train_step
    from targetdiff_tpu.utils.train import get_optimizer

    model, params, batch = _setup()
    opt = get_optimizer(Config(dict(type="adam", lr=1e-3, weight_decay=0.0,
                                    beta1=0.95, beta2=0.999, max_grad_norm=8.0)))
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    # train_step donates the state; snapshot params before stepping
    before = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), state.params)
    step = make_train_step(model, opt, pos_noise_std=0.0, impl="fast")
    state2, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"])) and float(metrics["grad_norm"]) > 0
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()), before, state2.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
