"""Shared NN building blocks (flax.linen).

Counterpart of the reference's models/common.py (MLP :60-80, ShiftedSoftplus
:156-162, nonlinearities :50-57), with PyTorch-compatible default
initialization (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias)
so training dynamics match the reference and ported checkpoints drop in.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x) - log 2 (reference: models/common.py:156-162)."""
    return jax.nn.softplus(x) - math.log(2.0)


class Swish(nn.Module):
    """x * sigmoid(beta * x) with learnable beta (reference: models/common.py:41-47)."""

    @nn.compact
    def __call__(self, x):
        beta = self.param("beta", lambda key: jnp.asarray(1.0, jnp.float32))
        return x * jax.nn.sigmoid(beta * x)


def get_activation(name: str) -> Callable:
    if name == "swish":
        return Swish()
    fns = {
        "tanh": jnp.tanh,
        "relu": jax.nn.relu,
        "softplus": jax.nn.softplus,
        "elu": jax.nn.elu,
        "silu": jax.nn.silu,
    }
    return fns[name]


class TorchLinear(nn.Module):
    """Dense layer matching torch.nn.Linear's default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)

        def default_kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def default_binit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "kernel", self.kernel_init or default_kinit, (fan_in, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype), preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init or default_binit, (self.features,), jnp.float32
            )
            y = y + bias.astype(dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the trailing axis, params in f32, epsilon matching torch."""

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32), (dim,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (dim,))
        dtype = self.dtype or x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(dtype)


class MLP(nn.Module):
    """Same-hidden-dim MLP: Linear -> [LayerNorm -> act] x (L-1) -> Linear,
    optionally norm+act after the last layer (reference: models/common.py:60-80).
    """

    out_dim: int
    hidden_dim: int
    num_layer: int = 2
    norm: bool = True
    act_fn: str = "relu"
    act_last: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act_fn)
        for layer_idx in range(self.num_layer):
            out = self.hidden_dim if layer_idx < self.num_layer - 1 else self.out_dim
            x = TorchLinear(out, dtype=self.dtype, name=f"lin_{layer_idx}")(x)
            if layer_idx < self.num_layer - 1 or self.act_last:
                if self.norm:
                    x = LayerNorm(dtype=self.dtype, name=f"norm_{layer_idx}")(x)
                x = act(x)
        return x


def outer_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., A] x [..., B] -> [..., A*B], ordered a-major
    (reference: models/common.py:83-90)."""
    out = a[..., :, None] * b[..., None, :]
    return out.reshape(out.shape[:-2] + (a.shape[-1] * b.shape[-1],))


def angle_expansion(angle: jnp.ndarray, start=1.0, stop=5.0, half_expansion=10) -> jnp.ndarray:
    """Cosine angle basis (reference: models/common.py:29-38; unused in the
    released main path but part of the ops inventory)."""
    import numpy as np

    l_mul = 1.0 / np.linspace(stop, start, half_expansion)
    r_mul = np.linspace(start, stop, half_expansion)
    coeff = jnp.asarray(np.concatenate([l_mul, r_mul]), jnp.float32)
    return jnp.cos(angle[..., None] * coeff)


def get_h_dist(dist_metric: str, hi: jnp.ndarray, hj: jnp.ndarray):
    """Hidden-state distances (reference: models/common.py:93-101)."""
    if dist_metric == "euclidean":
        return ((hi - hj) ** 2).sum(-1, keepdims=True)
    if dist_metric == "cos_sim":
        hi_n = jnp.linalg.norm(hi, axis=-1, keepdims=True)
        hj_n = jnp.linalg.norm(hj, axis=-1, keepdims=True)
        return (hi * hj).sum(-1, keepdims=True) / (hi_n * hj_n), hj_n
    raise ValueError(dist_metric)
