"""Host-side gym-style adapter over the functional stepper.

The reference exposes OpenAI-Gym 0.22 environments (``reset()`` returning
obs only, ``step()`` returning a 4-tuple; ``environment/dummy_env_*.py``).
Users migrating from the reference get the same imperative interface here,
backed by the jitted pure stepper — one class for all four variants, plus
the flattening wrappers (``utils/environment/env_wrappers.py:9-199``) as
constructor flags instead of wrapper objects.

This adapter is a convenience shell for interactive use and porting old
scripts; batch training should use ``placement_tpu.env.core`` directly.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import numpy as np

from placement_tpu.env import core
from placement_tpu.env.types import EnvParams, Variant
from placement_tpu.env.wrappers import (decode_flat_action,
                                        flat_action_size, flatten_mask)


class PlacementEnv:
    """Single-board, stateful ``reset()/step()`` interface.

    ``flatten_actions=True`` accepts a flat integer action and flattens the
    observation's ``action_mask`` — the composition of
    ``FlatteningActionWrapper*`` + ``FlatteningActionMaskObservationWrapper*``
    the reference's ``create_env`` applies (utils/agent/utils.py:394-418).
    """

    def __init__(self, params: EnvParams, seed: int = 0,
                 flatten_actions: bool = False):
        self.params = params.validate()
        self.flatten_actions = flatten_actions
        self._key = jax.random.PRNGKey(seed)
        self._reset = jax.jit(lambda k: core.reset(self.params, k))
        self._step = jax.jit(lambda s, a: core.step(self.params, s, a))
        self._observe = jax.jit(lambda s: core.observe(self.params, s))
        self.state = None

    # -- spaces (reported as plain dicts; no gym dependency) ---------------

    @property
    def action_size(self) -> int:
        return flat_action_size(self.params)

    @property
    def action_shape(self) -> Tuple[int, ...]:
        """(O, H, W) bounds of the tuple action (or (H, W) for square)."""
        p = self.params
        if p.variant == Variant.SQUARE:
            return (p.height, p.width)
        return (p.num_orientations, p.height, p.width)

    # -- gym 0.22 API -------------------------------------------------------

    def seed(self, seed: int) -> None:
        self._key = jax.random.PRNGKey(seed)

    def reset(self) -> Dict[str, np.ndarray]:
        self._key, k = jax.random.split(self._key)
        self.state = self._reset(k)
        return self._obs()

    def step(self, action: Union[int, Tuple[int, ...], np.ndarray]
             ) -> Tuple[Dict[str, np.ndarray], float, bool, Dict[str, Any]]:
        if self.state is None:
            raise RuntimeError("call reset() before step()")
        a = self._coerce_action(action)
        self.state, reward, done, info = self._step(self.state, a)
        info_np = {k: float(jax.device_get(v)) for k, v in info.items()}
        return self._obs(), float(jax.device_get(reward)), \
            bool(jax.device_get(done)), info_np

    # -- reference convenience accessors ------------------------------------

    @property
    def grid(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.state.grid))

    @property
    def action_mask(self) -> np.ndarray:
        """bool mask in reference layout: [O, H, W] (square: [H, W])."""
        m = np.asarray(jax.device_get(self.state.action_mask))
        return m[0] if self.params.variant == Variant.SQUARE else m

    def validate_action(self, action) -> bool:
        """Legality test (DummyPlacementEnv.validate_action,
        dummy_env_rectangular_pin.py:1712-1736) via the current mask."""
        a = np.asarray(jax.device_get(self._coerce_action(action)))
        m = np.asarray(jax.device_get(self.state.action_mask))
        return bool(m[a[0], a[1], a[2]])

    # -- internals -----------------------------------------------------------

    def _coerce_action(self, action):
        import jax.numpy as jnp
        if self.flatten_actions or (np.isscalar(action)
                                    and not isinstance(action, tuple)):
            return decode_flat_action(self.params,
                                      jnp.asarray(action, jnp.int32))
        a = np.asarray(action, np.int32)
        if a.shape == (2,):  # square tuple action (x, y)
            a = np.concatenate([[0], a]).astype(np.int32)
        if a.shape != (3,):
            raise ValueError(f"action must be flat int, (x, y), or "
                             f"(o, x, y); got shape {a.shape}")
        import jax.numpy as jnp2
        return jnp2.asarray(a)

    def _obs(self) -> Dict[str, np.ndarray]:
        obs = jax.device_get(self._observe(self.state))
        obs = {k: np.asarray(v) for k, v in obs.items()}
        if self.flatten_actions:
            obs["action_mask"] = np.asarray(
                flatten_mask(self.params,
                             jax.device_get(self.state.action_mask))
            ).astype(obs["action_mask"].dtype)
        return obs


def make(env_type: str = "rectangle_pin", seed: int = 0,
         flatten_actions: bool = False, **env_overrides) -> PlacementEnv:
    """Factory mirroring ``init_env``/``create_env``
    (utils/agent/utils.py:317-418): build from a model-type's config JSON
    with keyword overrides."""
    from placement_tpu.utils.config import MODEL_TYPES, load_experiment
    key = env_type if env_type in MODEL_TYPES else {
        "square": "square", "rectangle": "rectangle",
        "rectangle_pin": "rectangle_pin",
        "rectangle_spatial_pin": "rectangle_spatial_pin"}[env_type]
    params, _, _ = load_experiment(key)
    if env_overrides:
        params = params.replace(**env_overrides).validate()
    return PlacementEnv(params, seed=seed, flatten_actions=flatten_actions)
