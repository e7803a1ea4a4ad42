"""Flat action-space codecs — the reference's wrapper layer
(utils/environment/env_wrappers.py) reduced to pure index math.

``FlatteningActionWrapperRect.action`` (:80-98) decodes a flat id by
``divmod(a, h*w)`` then ``divmod(rem, w)``; the square wrapper (:184-199)
uses ``divmod(a, w)``. The observation-side wrappers only flatten
``action_mask``, which here is a reshape at the consumer.
"""

from __future__ import annotations

import jax.numpy as jnp

from placement_tpu.env.types import EnvParams, Variant


def flat_action_size(params: EnvParams) -> int:
    if params.variant == Variant.SQUARE:
        return params.height * params.width
    return params.num_orientations * params.height * params.width


def decode_flat_action(params: EnvParams, flat) -> jnp.ndarray:
    """flat i32[...] -> (orientation, x, y) i32[..., 3]."""
    h, w = params.height, params.width
    if params.variant == Variant.SQUARE:
        x, y = flat // w, flat % w
        o = jnp.zeros_like(flat)
    else:
        o, rem = flat // (h * w), flat % (h * w)
        x, y = rem // w, rem % w
    return jnp.stack([o, x, y], axis=-1).astype(jnp.int32)


def encode_flat_action(params: EnvParams, action) -> jnp.ndarray:
    """(o, x, y) i32[..., 3] -> flat id (inverse of decode)."""
    h, w = params.height, params.width
    o, x, y = action[..., 0], action[..., 1], action[..., 2]
    if params.variant == Variant.SQUARE:
        return x * w + y
    return o * h * w + x * w + y


def flatten_mask(params: EnvParams, mask) -> jnp.ndarray:
    """action_mask [..., O, H, W] (or [..., H, W] square) -> [..., A]."""
    a = flat_action_size(params)
    return mask.reshape(mask.shape[:mask.ndim - (2 if params.variant == Variant.SQUARE else 3)] + (a,))
