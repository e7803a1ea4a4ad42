"""Test utilities: inject hand-constructed instances into an EnvState.

The reference test-suites build fixtures by assigning ``env.components`` /
pin lists directly (tests/rectangular_environment/conftest.py:20-31,
tests/pin_environment/conftest.py:9-117). These helpers do the same against
the fixed-shape state so the golden-value tests port over.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


from placement_tpu.env.types import EnvParams, EnvState

I32 = jnp.int32


@functools.lru_cache(maxsize=64)
def _mask_refresh(params: EnvParams):
    def f(state: EnvState) -> EnvState:
        from placement_tpu.ops.sat import orientation_action_mask
        cur = jnp.clip(state.cursor, 0, params.max_components - 1)
        mask = orientation_action_mask(
            state.grid, state.comp_h[cur], state.comp_w[cur],
            params.num_orientations)
        mask = mask & (state.cursor < state.num_components)
        return state.replace(action_mask=mask)
    return jax.jit(f)


class PinSpec:
    """Mirror of the reference Pin fixture fields
    (dummy_env_rectangular_pin.py:30-55)."""

    def __init__(self, relative_x, relative_y, pin_id, component_id, net_id,
                 absolute_x=-1, absolute_y=-1):
        self.relative_x = relative_x
        self.relative_y = relative_y
        self.pin_id = pin_id
        self.component_id = component_id
        self.net_id = net_id
        self.absolute_x = absolute_x
        self.absolute_y = absolute_y


class ComponentSpec:
    """Mirror of the reference Component fixture fields."""

    def __init__(self, h, w, comp_id, pins: Optional[List[PinSpec]] = None,
                 position=(-1, -1)):
        self.h = h
        self.w = w
        self.comp_id = comp_id
        self.pins = pins or []
        self.position = position


def set_components(params: EnvParams, state: EnvState,
                   comps: Sequence[ComponentSpec]) -> EnvState:
    """Overwrite the instance with a fixed component/pin list (cursor reset
    to 0, grid untouched, action mask recomputed for component 0)."""
    c = params.max_components
    p = params.max_pins

    comp_h = np.zeros(c, np.int32)
    comp_w = np.zeros(c, np.int32)
    comp_x = np.full(c, -1, np.int32)
    comp_y = np.full(c, -1, np.int32)
    pin_rows = []
    for comp in comps:
        comp_h[comp.comp_id] = comp.h
        comp_w[comp.comp_id] = comp.w
        comp_x[comp.comp_id] = comp.position[0]
        comp_y[comp.comp_id] = comp.position[1]
        for pin in comp.pins:
            pin_rows.append(pin)
    # net-grouped order like the reference's rebuilt self.pins (:1167-1169)
    pin_rows.sort(key=lambda q: q.net_id)

    pin_rel_x = np.full(p, -1, np.int32)
    pin_rel_y = np.full(p, -1, np.int32)
    pin_abs_x = np.full(p, -1, np.int32)
    pin_abs_y = np.full(p, -1, np.int32)
    pin_net = np.full(p, -1, np.int32)
    pin_comp = np.full(p, -1, np.int32)
    pin_local = np.zeros(p, np.int32)
    for i, q in enumerate(pin_rows):
        pin_rel_x[i] = q.relative_x
        pin_rel_y[i] = q.relative_y
        pin_abs_x[i] = q.absolute_x
        pin_abs_y[i] = q.absolute_y
        pin_net[i] = q.net_id
        pin_comp[i] = q.component_id
        pin_local[i] = q.pin_id

    nets = {q.net_id for q in pin_rows}
    state = state.replace(
        comp_h=jnp.asarray(comp_h), comp_w=jnp.asarray(comp_w),
        comp_x=jnp.asarray(comp_x), comp_y=jnp.asarray(comp_y),
        num_components=jnp.asarray(len(comps), I32),
        cursor=jnp.asarray(0, I32),
        pin_rel_x=jnp.asarray(pin_rel_x), pin_rel_y=jnp.asarray(pin_rel_y),
        pin_abs_x=jnp.asarray(pin_abs_x), pin_abs_y=jnp.asarray(pin_abs_y),
        pin_net=jnp.asarray(pin_net), pin_comp=jnp.asarray(pin_comp),
        pin_local=jnp.asarray(pin_local),
        pin_rel_x0=jnp.asarray(pin_rel_x), pin_rel_y0=jnp.asarray(pin_rel_y),
        num_nets=jnp.asarray(len(nets), I32),
        num_pins=jnp.asarray(len(pin_rows), I32),
        done=jnp.asarray(False))
    return _mask_refresh(params)(state)
