"""Action distributions as pure functions.

Reference: utils/agent/factorized_action_distributions.py —
``Categorical`` (:21-104) and the two factorized distributions
(:107-458 orientation order o->x->y, :461-818 coordinate order x->y->o).
The reference's class-variable tricks and TF graph plumbing collapse into
stateless functions of (logits | encoding+mask, key).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

NEG = jnp.finfo(jnp.float32).min


def _mask(logits, m):
    return logits + jnp.maximum(jnp.log(jnp.maximum(m, 0.0)), NEG)


# ---------------------------------------------------------------------------
# Categorical (factorized_action_distributions.py:21-104)
# ---------------------------------------------------------------------------

def cat_sample(key, logits) -> jnp.ndarray:
    return jax.random.categorical(key, logits, axis=-1)


def cat_argmax(logits) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1)


def cat_logp(logits, x) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(
        logp, x[..., None].astype(jnp.int32), axis=-1)[..., 0]


def cat_entropy(logits) -> jnp.ndarray:
    a0 = logits - jnp.max(logits, axis=-1, keepdims=True)
    ea0 = jnp.exp(a0)
    z0 = jnp.sum(ea0, axis=-1, keepdims=True)
    p0 = ea0 / z0
    return jnp.sum(p0 * (jnp.log(z0) - a0), axis=-1)


def cat_kl(logits_p, logits_q) -> jnp.ndarray:
    a0 = logits_p - jnp.max(logits_p, axis=-1, keepdims=True)
    a1 = logits_q - jnp.max(logits_q, axis=-1, keepdims=True)
    ea0, ea1 = jnp.exp(a0), jnp.exp(a1)
    z0 = jnp.sum(ea0, axis=-1, keepdims=True)
    z1 = jnp.sum(ea1, axis=-1, keepdims=True)
    p0 = ea0 / z0
    return jnp.sum(p0 * (a0 - jnp.log(z0) - a1 + jnp.log(z1)), axis=-1)


# ---------------------------------------------------------------------------
# Factorized distributions
# ---------------------------------------------------------------------------

class FactorizedHeads(NamedTuple):
    """Per-factor logit functions over a fixed encoding. Signatures mirror
    the factorized model heads (rectangle_model_factorized.py:133-311):

      o(enc, x_norm, y_norm) — x/y ignored under "orientation" ordering
      x(enc, onehot_o)       — onehot ignored under "coordinates"
      y(enc, onehot_o, x_norm)
    """

    o: Callable
    x: Callable
    y: Callable
    num_orientations: int
    height: int
    width: int


def _factor_masks_orientation(mask):
    """mask [B, O, H, W] -> per-factor masks for o -> x -> y
    (:352-358, :393-401, :440-448)."""
    o_mask = jnp.max(mask, axis=(2, 3))

    def x_mask(o):
        m = jnp.take_along_axis(
            mask, o[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
        return jnp.max(m, axis=2)

    def y_mask(o, x):
        m = jnp.take_along_axis(
            mask, o[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
        return jnp.take_along_axis(
            m, x[:, None, None].astype(jnp.int32), axis=1)[:, 0]

    return o_mask, x_mask, y_mask


def _factor_masks_coordinates(mask):
    """x -> y -> o ordering (:700-718, :760-768, :798-808)."""
    x_mask = jnp.max(mask, axis=(1, 3))

    def y_mask(x):
        m = jnp.take_along_axis(
            mask, x[:, None, None, None].astype(jnp.int32), axis=2)[:, :, 0]
        return jnp.max(m, axis=1)

    def o_mask(x, y):
        m = jnp.take_along_axis(
            mask, x[:, None, None, None].astype(jnp.int32), axis=2)[:, :, 0]
        return jnp.take_along_axis(
            m, y[:, None, None].astype(jnp.int32), axis=2)[:, :, 0]

    return x_mask, y_mask, o_mask


def _onehot_o(o, n):
    return jax.nn.one_hot(o.astype(jnp.int32), n, dtype=jnp.float32)


class Factorized:
    """Hierarchical masked categorical over (orientation, x, y).

    order="orientation": p(o) p(x|o) p(y|o,x)  (reference class at :107)
    order="coordinates": p(x) p(y|x) p(o|x,y)  (reference class at :461)
    """

    def __init__(self, heads: FactorizedHeads, enc, mask, order: str):
        self.heads = heads
        self.enc = enc
        self.mask = mask
        self.order = order

    # -- per-factor logits -------------------------------------------------

    def _logits_chain_orientation(self, o=None, x=None):
        h = self.heads
        o_m, x_m, y_m = _factor_masks_orientation(self.mask)
        o_logits = _mask(h.o(self.enc, None, None), o_m)
        x_logits = y_logits = None
        if o is not None:
            oh = _onehot_o(o, h.num_orientations)
            x_logits = _mask(h.x(self.enc, oh), x_m(o))
        if o is not None and x is not None:
            oh = _onehot_o(o, h.num_orientations)
            x_norm = x.astype(jnp.float32) / h.height  # :438 x / num_x
            y_logits = _mask(h.y(self.enc, oh, x_norm), y_m(o, x))
        return o_logits, x_logits, y_logits

    def _logits_chain_coordinates(self, x=None, y=None):
        h = self.heads
        x_m, y_m, o_m = _factor_masks_coordinates(self.mask)
        x_logits = _mask(h.x(self.enc, None), x_m)
        y_logits = o_logits = None
        if x is not None:
            x_norm = x.astype(jnp.float32) / h.height
            y_logits = _mask(h.y(self.enc, None, x_norm), y_m(x))
        if x is not None and y is not None:
            x_norm = x.astype(jnp.float32) / h.height
            y_norm = y.astype(jnp.float32) / h.width
            o_logits = _mask(h.o(self.enc, x_norm, y_norm), o_m(x, y))
        return x_logits, y_logits, o_logits

    # -- API ---------------------------------------------------------------

    def sample(self, key, deterministic: bool = False) -> tuple:
        k1, k2, k3 = jax.random.split(key, 3)
        pick = (lambda k, lg: cat_argmax(lg)) if deterministic else cat_sample
        if self.order == "orientation":
            o_l, _, _ = self._logits_chain_orientation()
            o = pick(k1, o_l)
            _, x_l, _ = self._logits_chain_orientation(o=o)
            x = pick(k2, x_l)
            _, _, y_l = self._logits_chain_orientation(o=o, x=x)
            y = pick(k3, y_l)
        else:
            x_l, _, _ = self._logits_chain_coordinates()
            x = pick(k1, x_l)
            _, y_l, _ = self._logits_chain_coordinates(x=x)
            y = pick(k2, y_l)
            _, _, o_l = self._logits_chain_coordinates(x=x, y=y)
            o = pick(k3, o_l)
        return jnp.stack([o, x, y], axis=-1)

    def logp(self, actions) -> jnp.ndarray:
        o, x, y = actions[..., 0], actions[..., 1], actions[..., 2]
        if self.order == "orientation":
            o_l, x_l, y_l = self._logits_chain_orientation(o=o, x=x)
            return cat_logp(o_l, o) + cat_logp(x_l, x) + cat_logp(y_l, y)
        x_l, y_l, o_l = self._logits_chain_coordinates(x=x, y=y)
        return cat_logp(x_l, x) + cat_logp(y_l, y) + cat_logp(o_l, o)

    def entropy(self, key) -> jnp.ndarray:
        """Stochastic factor-sum entropy: later factors condition on a fresh
        sample of the earlier ones, as in the reference (:233-254)."""
        k1, k2 = jax.random.split(key)
        if self.order == "orientation":
            o_l, _, _ = self._logits_chain_orientation()
            o = cat_sample(k1, o_l)
            _, x_l, _ = self._logits_chain_orientation(o=o)
            x = cat_sample(k2, x_l)
            _, _, y_l = self._logits_chain_orientation(o=o, x=x)
            return cat_entropy(o_l) + cat_entropy(x_l) + cat_entropy(y_l)
        x_l, _, _ = self._logits_chain_coordinates()
        x = cat_sample(k1, x_l)
        _, y_l, _ = self._logits_chain_coordinates(x=x)
        y = cat_sample(k2, y_l)
        _, _, o_l = self._logits_chain_coordinates(x=x, y=y)
        return cat_entropy(x_l) + cat_entropy(y_l) + cat_entropy(o_l)

    def kl(self, other: "Factorized", key) -> jnp.ndarray:
        """Stochastic factor-sum KL (:257-283)."""
        k1, k2 = jax.random.split(key)
        if self.order == "orientation":
            o_l, _, _ = self._logits_chain_orientation()
            oo_l, _, _ = other._logits_chain_orientation()
            o = cat_sample(k1, o_l)
            _, x_l, _ = self._logits_chain_orientation(o=o)
            _, ox_l, _ = other._logits_chain_orientation(o=o)
            x = cat_sample(k2, x_l)
            _, _, y_l = self._logits_chain_orientation(o=o, x=x)
            _, _, oy_l = other._logits_chain_orientation(o=o, x=x)
            return (cat_kl(o_l, oo_l) + cat_kl(x_l, ox_l)
                    + cat_kl(y_l, oy_l))
        x_l, _, _ = self._logits_chain_coordinates()
        ox_l, _, _ = other._logits_chain_coordinates()
        x = cat_sample(k1, x_l)
        _, y_l, _ = self._logits_chain_coordinates(x=x)
        _, oy_l, _ = other._logits_chain_coordinates(x=x)
        y = cat_sample(k2, y_l)
        _, _, o_l = self._logits_chain_coordinates(x=x, y=y)
        _, _, oo_l = other._logits_chain_coordinates(x=x, y=y)
        return cat_kl(x_l, ox_l) + cat_kl(y_l, oy_l) + cat_kl(o_l, oo_l)
