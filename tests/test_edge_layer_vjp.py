"""Gradient parity of the hand-written Pallas layer backwards vs jax.grad
of a dense XLA implementation of the exact same math (f32, interpret mode).

The forward semantics are already parity-tested against the flax layers
(tests/test_fast_forward.py); here the XLA reference mirrors that math with
plain jnp ops, and the custom-VJP layers must match its autodiff gradients
for every differentiable input (h, x, e_w, all parameters).

Reference layer math: models/uni_transformer.py:11-140."""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from targetdiff_tpu.ops.pallas.edge_layer import H2XParams, X2HParams
from targetdiff_tpu.ops.pallas.edge_layer_vjp import (
    h2x_layer_trainable,
    x2h_layer_trainable,
)

B, N, K, H, HEADS, R = 2, 16, 4, 16, 2, 5
DH = H // HEADS
COEFF = -0.5
NEG = -1e9


def _rand(key, *shape, scale=0.3):
    return jax.random.normal(key, shape) * scale


def make_inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    h = _rand(ks[0], B, N, H, scale=1.0)
    x = _rand(ks[1], B, N, 3, scale=3.0)
    idx = jax.random.randint(ks[2], (B, N, K), 0, N)
    nmask = jax.random.uniform(ks[3], (B, N, K)) > 0.15
    etype = jax.random.randint(ks[4], (B, N, K), 0, 4)
    ew = jax.nn.sigmoid(_rand(ks[5], B, N, K, scale=1.0))
    offsets = jnp.linspace(0.0, 8.0, R)
    mlig = jnp.arange(N)[None, :] >= N - 4
    mlig = jnp.broadcast_to(mlig, (B, N))
    return h, x, idx, nmask, etype, ew, offsets, mlig


def make_x2h_params(seed=1):
    ks = iter(jax.random.split(jax.random.PRNGKey(seed), 32))

    def edge():
        return (
            _rand(next(ks), 4, H), _rand(next(ks), 4 * R, H), _rand(next(ks), H, H),
            _rand(next(ks), H, H), _rand(next(ks), H), 1.0 + _rand(next(ks), H, scale=0.1),
            _rand(next(ks), H), _rand(next(ks), H, H), _rand(next(ks), H),
        )

    def node(out=H):
        return (
            _rand(next(ks), H, H), _rand(next(ks), H), 1.0 + _rand(next(ks), H, scale=0.1),
            _rand(next(ks), H), _rand(next(ks), H, out), _rand(next(ks), out),
        )

    return X2HParams(*edge(), *edge(), *node())


def make_h2x_params(seed=2):
    ks = iter(jax.random.split(jax.random.PRNGKey(seed), 32))

    def edge(out=H):
        return (
            _rand(next(ks), 4, H), _rand(next(ks), 4 * R, H), _rand(next(ks), H, H),
            _rand(next(ks), H, H), _rand(next(ks), H), 1.0 + _rand(next(ks), H, scale=0.1),
            _rand(next(ks), H), _rand(next(ks), H, out), _rand(next(ks), out),
        )

    def node():
        return (
            _rand(next(ks), H, H), _rand(next(ks), H), 1.0 + _rand(next(ks), H, scale=0.1),
            _rand(next(ks), H), _rand(next(ks), H, H), _rand(next(ks), H),
        )

    return H2XParams(*edge(H), *edge(HEADS), *node())


def _ln(z, lns, lnb, eps=1e-5):
    mean = z.mean(-1, keepdims=True)
    var = ((z - mean) ** 2).mean(-1, keepdims=True)
    return (z - mean) * jax.lax.rsqrt(var + eps) * lns + lnb


def _gather(a, idx):
    # a [B, N, C]; idx [B, N, K] -> [B, N, K, C]
    C = a.shape[-1]
    flat = jnp.take_along_axis(
        a, idx.reshape(B, N * K)[..., None], axis=1
    )
    return flat.reshape(B, N, K, C)


def _common(h, x, idx, nmask, etype, ew, offsets, p, edge_fields):
    hj = _gather(h, idx)
    xj = _gather(x, idx)
    xi = x[:, :, None, :]
    rel = xi - xj
    dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
    rbf = jnp.exp(COEFF * (dist - offsets) ** 2)
    et4 = jax.nn.one_hot(etype, 4)
    r_feat = jnp.concatenate([rbf * et4[..., i : i + 1] for i in range(4)], -1)

    def edge_mlp(w1e, w1r, w1i, w1j, b1, lns, lnb, w2, b2):
        z = (
            et4 @ w1e + r_feat @ w1r + hj @ w1j
            + (h @ w1i)[:, :, None, :] + b1
        )
        a = jnp.maximum(_ln(z, lns, lnb), 0.0)
        return a @ w2 + b2

    k = edge_mlp(*[getattr(p, f) for f in edge_fields[0]])
    v = edge_mlp(*[getattr(p, f) for f in edge_fields[1]]) * ew[..., None]

    qw1, qb1, qlns, qlnb, qw2, qb2 = [getattr(p, f) for f in edge_fields[2]]
    zq = h @ qw1 + qb1
    q = jnp.maximum(_ln(zq, qlns, qlnb), 0.0) @ qw2 + qb2

    kh = k.reshape(B, N, K, HEADS, -1)
    qh = q.reshape(B, N, HEADS, -1)
    logits = (kh * qh[:, :, None]).sum(-1) / math.sqrt(DH)  # [B,N,K,heads]
    logits = jnp.where(nmask[..., None], logits, NEG)
    mx = jax.lax.stop_gradient(logits.max(2, keepdims=True))
    e = jnp.exp(logits - mx) * nmask[..., None]
    den = e.sum(2, keepdims=True)
    alpha = e / jnp.maximum(den, 1e-16)
    return alpha, v, rel


def xla_x2h(h, x, idx, nmask, etype, ew, offsets, p: X2HParams):
    fields = (
        ["hk_w1e", "hk_w1r", "hk_w1i", "hk_w1j", "hk_b1", "hk_lns", "hk_lnb",
         "hk_w2", "hk_b2"],
        ["hv_w1e", "hv_w1r", "hv_w1i", "hv_w1j", "hv_b1", "hv_lns", "hv_lnb",
         "hv_w2", "hv_b2"],
        ["hq_w1", "hq_b1", "hq_lns", "hq_lnb", "hq_w2", "hq_b2"],
    )
    alpha, v, _ = _common(h, x, idx, nmask, etype, ew, offsets, p, fields)
    vh = v.reshape(B, N, K, HEADS, -1)
    out = (alpha[..., None] * vh).sum(2).reshape(B, N, H)
    return h + out


def xla_h2x(h, x, idx, nmask, etype, ew, mlig, offsets, p: H2XParams):
    fields = (
        ["xk_w1e", "xk_w1r", "xk_w1i", "xk_w1j", "xk_b1", "xk_lns", "xk_lnb",
         "xk_w2", "xk_b2"],
        ["xv_w1e", "xv_w1r", "xv_w1i", "xv_w1j", "xv_b1", "xv_lns", "xv_lnb",
         "xv_w2", "xv_b2"],
        ["xq_w1", "xq_b1", "xq_lns", "xq_lnb", "xq_w2", "xq_b2"],
    )
    alpha, v16, rel = _common(h, x, idx, nmask, etype, ew, offsets, p, fields)
    s = (alpha * v16).sum(-1, keepdims=True) / HEADS  # [B,N,K,1]
    delta = (s * rel).sum(2)
    return x + delta * mlig[..., None].astype(x.dtype)


def _cmp_tree(ga, gb, atol=2e-4, rtol=2e-3, label=""):
    fa = jax.tree_util.tree_leaves(ga)
    fb = jax.tree_util.tree_leaves(gb)
    assert len(fa) == len(fb)
    for i, (a, b) in enumerate(zip(fa, fb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=rtol,
            err_msg=f"{label} leaf {i}",
        )


def test_x2h_grads_match_xla():
    h, x, idx, nmask, etype, ew, offsets, _ = make_inputs()
    p = make_x2h_params()
    w = jax.random.normal(jax.random.PRNGKey(9), (B, N, H))

    def loss_ref(h, x, ew, p):
        return (xla_x2h(h, x, idx, nmask, etype, ew, offsets, p) * w).sum()

    def loss_fast(h, x, ew, p):
        out = x2h_layer_trainable(
            h, x, idx, nmask, etype, ew, offsets, p, HEADS, COEFF, True
        )
        return (out * w).sum()

    la, ga = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(h, x, ew, p)
    lb, gb = jax.value_and_grad(loss_fast, argnums=(0, 1, 2, 3))(h, x, ew, p)
    assert abs(la - lb) / max(abs(la), 1.0) < 1e-5
    _cmp_tree(ga[0], gb[0], label="d_h")
    _cmp_tree(ga[1], gb[1], label="d_x")
    _cmp_tree(ga[2], gb[2], label="d_ew")
    _cmp_tree(ga[3], gb[3], label="d_params")


def test_h2x_grads_match_xla():
    h, x, idx, nmask, etype, ew, offsets, mlig = make_inputs(3)
    p = make_h2x_params()
    w = jax.random.normal(jax.random.PRNGKey(11), (B, N, 3))

    def loss_ref(h, x, ew, p):
        return (xla_h2x(h, x, idx, nmask, etype, ew, mlig, offsets, p) * w).sum()

    def loss_fast(h, x, ew, p):
        out = h2x_layer_trainable(
            h, x, idx, nmask, etype, ew, mlig, offsets, p, HEADS, COEFF, True
        )
        return (out * w).sum()

    la, ga = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(h, x, ew, p)
    lb, gb = jax.value_and_grad(loss_fast, argnums=(0, 1, 2, 3))(h, x, ew, p)
    assert abs(la - lb) / max(abs(la), 1.0) < 1e-5
    _cmp_tree(ga[0], gb[0], label="d_h")
    _cmp_tree(ga[1], gb[1], label="d_x")
    _cmp_tree(ga[2], gb[2], label="d_ew")
    _cmp_tree(ga[3], gb[3], label="d_params")
