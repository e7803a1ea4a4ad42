"""Model building blocks (reference: agent/models/model_building_blocks.py).

ConvBlock = Conv2D + BatchNorm + activation (+ optional max-pool) (:11-77);
ConvBlocks stacks N of them (:80-142); Attention is single-head QKV
self-attention with a relu output (:145-179). Convs run in NHWC which is the
native TPU layout; matmuls/convs carry ``preferred_element_type`` so the MXU
accumulates in f32 even under bf16 params.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def get_activation(name) -> Callable:
    """String -> fn map (utils/agent/utils.py:106-151)."""
    if callable(name):
        return name
    return ACTIVATIONS[name]


class ConvBlocks(nn.Module):
    """N stacked Conv+Norm+act(+pool) blocks; auto-expands HW input to HWC
    (model_building_blocks.py:59-60)."""

    num_blocks: int
    num_filters: int
    kernel_size: int
    activation: str = "relu"
    max_pool: bool = False
    max_pool_kernel_size: int = 4
    padding: str = "VALID"
    use_batch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:  # [B, H, W] -> [B, H, W, 1]
            x = x[..., None]
        act = get_activation(self.activation)
        k = self.kernel_size
        for _ in range(self.num_blocks):
            x = nn.Conv(self.num_filters, (k, k), padding=self.padding)(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3)(x)
            x = act(x)
            if self.max_pool:
                p = self.max_pool_kernel_size
                x = nn.max_pool(x, (p, p), strides=(p, p), padding="VALID")
        return x


class SelfAttention(nn.Module):
    """Single-head QKV self-attention, relu output, no scaling — matching
    model_building_blocks.py:160-179 exactly (the reference does not scale
    by sqrt(d))."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        q = nn.Dense(self.hidden_size)(x)
        k = nn.Dense(self.hidden_size)(x)
        v = nn.Dense(self.hidden_size)(x)
        w = jnp.einsum("...qd,...kd->...qk", q, k,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("...qk,...kd->...qd", w, v,
                         preferred_element_type=jnp.float32)
        return jax.nn.relu(out)


def mask_logits(logits, mask) -> jnp.ndarray:
    """logits += max(log(mask), f32.min) (square_model.py:137-139)."""
    neg = jnp.finfo(jnp.float32).min
    return logits + jnp.maximum(jnp.log(jnp.maximum(mask, 0.0)), neg)
