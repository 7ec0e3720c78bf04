"""Property-prediction model family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from targetdiff_tpu.models.prop.prop_model import (
    PropBatch,
    PropPredNet,
    PropPredNetEnc,
    prop_loss_fn,
)

PROT_DIM, LIG_DIM = 27, 30


def prop_config():
    return dict(
        hidden_channels=32,
        encoder=dict(
            name="egnn", num_layers=2, hidden_dim=32, edge_dim=0, num_r_gaussian=16,
            act_fn="relu", norm=False, knn=8, cutoff=10.0,
        ),
    )


def make_batch(B=2, NP_=12, NL=4):
    rng = np.random.default_rng(0)
    pmask = np.ones((B, NP_), bool)
    pmask[0, 10:] = False
    lmask = np.ones((B, NL), bool)
    return PropBatch(
        jnp.asarray(rng.normal(size=(B, NP_, 3)).astype(np.float32) * 3),
        jnp.asarray((rng.random((B, NP_, PROT_DIM)) > 0.7).astype(np.float32)),
        jnp.asarray(pmask),
        jnp.asarray(rng.normal(size=(B, NL, 3)).astype(np.float32)),
        jnp.asarray(rng.random((B, NL, LIG_DIM)).astype(np.float32)),
        jnp.asarray(lmask),
        jnp.asarray(np.array([5.2, 7.1], np.float32)),
        jnp.asarray(np.array([1, 2], np.int32)),
    )


def test_prop_forward_and_loss():
    model = PropPredNet(config=prop_config(), output_dim=3)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    pred = model.apply(params, batch)
    assert pred.shape == (2,)
    assert np.isfinite(np.asarray(pred)).all()

    loss, _ = prop_loss_fn(model, params, jax.random.PRNGKey(1), batch, 0.1)
    assert np.isfinite(float(loss))

    g = jax.grad(lambda p: prop_loss_fn(model, p, jax.random.PRNGKey(1), batch, 0.1)[0])(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_prop_training_reduces_loss():
    import optax

    model = PropPredNet(config=prop_config(), output_dim=3)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        (loss, _), grads = jax.value_and_grad(
            lambda p: prop_loss_fn(model, p, key, batch, 0.0), has_aux=True
        )(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    first = None
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(0))
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5


def test_prop_enc_variant():
    model = PropPredNetEnc(
        config=prop_config(), enc_ligand_dim=13, enc_node_dim=0, enc_graph_dim=2,
        output_dim=1,
    )
    batch = make_batch()._replace(
        enc_ligand_feat=jnp.ones((2, 4, 13)), enc_graph_feat=jnp.ones((2, 2))
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    pred = model.apply(params, batch)
    assert pred.shape == (2,)
    assert np.isfinite(np.asarray(pred)).all()


def test_prop_padding_invariance():
    model = PropPredNet(config=prop_config(), output_dim=3)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    base = np.asarray(model.apply(params, batch))

    def pad(x, n, fill=0.0):
        shape = (x.shape[0], n) + x.shape[2:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=1)

    wide = batch._replace(
        protein_pos=pad(batch.protein_pos, 4, 9.0),
        protein_feat=pad(batch.protein_feat, 4, 1.0),
        protein_mask=pad(batch.protein_mask, 4, False),
    )
    wide_pred = np.asarray(model.apply(params, wide))
    np.testing.assert_allclose(wide_pred, base, atol=1e-4)
