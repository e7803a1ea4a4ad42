"""Random-policy baselines (reference: agent/random/random_policy_*.py).

The reference picks uniformly from ``np.argwhere(env.action_mask == 1)``
per step in a Python loop (:25-59); here the whole batch samples masked
uniform actions on device and ``simulate`` scans full episodes under jit.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from placement_tpu.env import core
from placement_tpu.env.types import EnvParams, Variant
from placement_tpu.env.wrappers import decode_flat_action


def random_action(key, params: EnvParams, action_mask) -> jnp.ndarray:
    """Uniform over valid actions; mask [B, O, H, W] (or [B, H, W])."""
    b = action_mask.shape[0]
    flat = action_mask.reshape(b, -1)
    logits = jnp.where(flat > 0, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, axis=-1)
    if params.variant == Variant.SQUARE:
        w = params.width
        return jnp.stack([jnp.zeros_like(idx), idx // w, idx % w],
                         axis=-1).astype(jnp.int32)
    return decode_flat_action(params, idx)


def simulate(params: EnvParams, key, num_episodes: int,
             batch: int = None) -> jnp.ndarray:
    """Play ``num_episodes`` random-policy episodes; returns episode returns
    f32[num_episodes] (random_policy_square.py:25-59 semantics, batched)."""
    batch = batch or min(num_episodes, 256)
    k_reset, k_run = jax.random.split(key)
    states = jax.vmap(lambda k: core.reset(params, k))(
        jax.random.split(k_reset, batch))

    max_steps = params.area + 2  # episodes end well before this

    def step_fn(carry, _):
        states, key = carry
        key, k = jax.random.split(key)
        mask = states.action_mask
        if params.variant == Variant.SQUARE:
            mask = mask[:, 0]
        actions = random_action(k, params, mask)
        next_states, reward, done, _ = jax.vmap(
            lambda s, a: core.step_autoreset(params, s, a))(states, actions)
        return (next_states, key), (reward, done)

    (_, _), (rewards, dones) = jax.lax.scan(
        step_fn, (states, k_run), None, length=max_steps)

    # per-env episode returns, emitted at done boundaries
    def acc_fn(acc, inp):
        r, d = inp
        total = acc + r
        emitted = jnp.where(d, total, jnp.nan)
        return jnp.where(d, 0.0, total), emitted

    _, emitted = jax.lax.scan(acc_fn, jnp.zeros((batch,)), (rewards, dones))
    flat = emitted.reshape(-1)
    flat = flat[~jnp.isnan(flat)]
    if flat.shape[0] < num_episodes:
        # Long-episode configs can complete fewer than num_episodes within
        # the scan window; silently returning fewer would bias any baseline
        # mean computed from the result.
        raise ValueError(
            f"simulate completed only {flat.shape[0]} episodes "
            f"(< requested {num_episodes}) within {max_steps} steps at "
            f"batch={batch}; raise `batch` or lower `num_episodes`")
    return flat[:num_episodes]
