"""The unified pure-functional placement stepper.

One ``reset``/``step`` pair covers all four reference environments
(``dummy_env_square.py:74/115``, ``dummy_env_rectangular.py:310/353``,
``dummy_env_rectangular_pin.py:1544/1599``,
``dummy_env_rectangular_pin_spatial.py``): the variants differ only in
orientation count, instance generation, reward, and observation builders.
Everything is data-independent control flow (``jnp.where`` selects), so
``jax.vmap(step)`` compiles to a single lock-step batched program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from placement_tpu.env import generator, routing
from placement_tpu.env.types import EnvParams, EnvState, Variant
from placement_tpu.ops.sat import orientation_action_mask, paint_rectangle

I32 = jnp.int32
F32 = jnp.float32


# ---------------------------------------------------------------------------
# Reset
# ---------------------------------------------------------------------------

def reset(params: EnvParams, key) -> EnvState:
    """Draw a fresh instance and initial masks (DummyPlacementEnv.reset)."""
    h, w = params.height, params.width
    key, gen_key = jax.random.split(key)
    grid = jnp.zeros((h, w), I32)

    if params.variant == Variant.SQUARE:
        n = params.component_n
        mask = orientation_action_mask(grid, n, n, 1)
        zero = jnp.zeros((params.max_pins,), I32)
        return EnvState(
            grid=grid, action_mask=mask,
            comp_h=jnp.full((1,), n, I32), comp_w=jnp.full((1,), n, I32),
            comp_x=jnp.full((1,), -1, I32), comp_y=jnp.full((1,), -1, I32),
            # unlimited supply of identical components: the episode only ends
            # when the mask empties (dummy_env_square.py:246-255)
            num_components=jnp.asarray(params.area, I32),
            cursor=jnp.asarray(0, I32),
            pin_rel_x=zero - 1, pin_rel_y=zero - 1,
            pin_abs_x=zero - 1, pin_abs_y=zero - 1,
            pin_net=zero - 1, pin_comp=zero - 1, pin_local=zero,
            pin_rel_x0=zero - 1, pin_rel_y0=zero - 1,
            num_nets=jnp.asarray(0, I32), num_pins=jnp.asarray(0, I32),
            done=jnp.asarray(False), steps=jnp.asarray(0, I32), key=key,
            info_wirelength=jnp.asarray(0.0, F32),
            info_intersections=jnp.asarray(0.0, F32))

    inst = generator.generate_instance(gen_key, params)
    mask = orientation_action_mask(
        grid, inst["comp_h"][0], inst["comp_w"][0], params.num_orientations)
    return EnvState(
        grid=grid, action_mask=mask,
        comp_h=inst["comp_h"], comp_w=inst["comp_w"],
        comp_x=inst["comp_x"], comp_y=inst["comp_y"],
        num_components=inst["num_components"], cursor=jnp.asarray(0, I32),
        pin_rel_x=inst["pin_rel_x"], pin_rel_y=inst["pin_rel_y"],
        pin_abs_x=inst["pin_abs_x"], pin_abs_y=inst["pin_abs_y"],
        pin_net=inst["pin_net"], pin_comp=inst["pin_comp"],
        pin_local=inst["pin_local"],
        # materialized copies: identical values, distinct buffers, so whole-
        # state donation never sees the same buffer twice
        pin_rel_x0=inst["pin_rel_x"] + 0, pin_rel_y0=inst["pin_rel_y"] + 0,
        num_nets=inst["num_nets"], num_pins=inst["num_pins"],
        done=jnp.asarray(False), steps=jnp.asarray(0, I32), key=key,
        info_wirelength=jnp.asarray(0.0, F32),
        info_intersections=jnp.asarray(0.0, F32))


# ---------------------------------------------------------------------------
# Pin rotation (Component.place_component, dummy_env_rectangular_pin.py:156-204)
# ---------------------------------------------------------------------------

def _rotate_pins(params: EnvParams, state: EnvState, orientation, x, y):
    """Update relative pin coordinates of the current component for the chosen
    orientation and set absolute positions. Mirrors the explicit 0/90/180/270
    formulas; note the reference mutates relative coords in place, so they
    stay rotated for the rest of the episode."""
    cur = state.cursor
    mine = state.pin_comp == cur
    h = state.comp_h[jnp.clip(cur, 0, params.max_components - 1)]
    w = state.comp_w[jnp.clip(cur, 0, params.max_components - 1)]
    rx, ry = state.pin_rel_x, state.pin_rel_y

    new_rx = jnp.select(
        [orientation == 0, orientation == 1, orientation == 2],
        [rx, ry, h - rx - 1],
        w - ry - 1)
    new_ry = jnp.select(
        [orientation == 0, orientation == 1, orientation == 2],
        [ry, h - rx - 1, w - ry - 1],
        rx)

    rel_x = jnp.where(mine, new_rx, rx)
    rel_y = jnp.where(mine, new_ry, ry)
    abs_x = jnp.where(mine, x + rel_x, state.pin_abs_x)
    abs_y = jnp.where(mine, y + rel_y, state.pin_abs_y)
    return rel_x, rel_y, abs_x, abs_y


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------

def step(params: EnvParams, state: EnvState, action, *,
         defer_routing: bool = False
         ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, Dict]:
    """One transition. ``action`` is i32[3] (orientation, x, y); the square
    variant ignores the orientation slot. Returns (state', reward, done,
    info). Reward/done/invalid semantics follow each reference env exactly:

      square/rect invalid -> (same obs, 0.0, done=True)  (dummy_env_square.py:134,
          dummy_env_rectangular.py:424)
      pin invalid  -> episode ends with the worst-case penalty reward and
          wirelength/intersection info (dummy_env_rectangular_pin.py:1696-1710)

    ``defer_routing`` (static): for pin variants, SKIP the
    ``routing.terminal_reward`` computation — the single most expensive part
    of the step, normally evaluated every call and discarded unless the
    episode ends (:186-195). Reward and the info wirelength/intersection
    fields come back zero; ``info["placed_all_eff"]`` carries the
    ``placed_all & valid`` flag the routing call needs, so a batched caller
    can compute terminal rewards just for the boards that actually finished
    (``pooled.gated_terminal_rewards``) and patch them in. Non-pin variants
    ignore the flag (their reward has no routing term).
    """
    h, w = params.height, params.width
    o_count = params.num_orientations
    orientation = jnp.clip(action[0], 0, o_count - 1)
    x, y = action[1], action[2]

    in_bounds = ((action[0] >= 0) & (action[0] < o_count)
                 & (x >= 0) & (x < h) & (y >= 0) & (y < w))
    valid = in_bounds & (state.action_mask[
        orientation, jnp.clip(x, 0, h - 1), jnp.clip(y, 0, w - 1)])
    valid = valid & ~state.done

    cur = jnp.clip(state.cursor, 0, params.max_components - 1)
    ch = state.comp_h[cur]
    cw = state.comp_w[cur]
    ph = jnp.where(orientation % 2 == 0, ch, cw)
    pw = jnp.where(orientation % 2 == 0, cw, ch)

    # --- apply placement (masked) -----------------------------------------
    new_grid = paint_rectangle(state.grid, x, y, ph, pw)
    new_grid = jnp.where(valid, new_grid, state.grid)

    comp_x = jnp.where(valid, state.comp_x.at[cur].set(x), state.comp_x)
    comp_y = jnp.where(valid, state.comp_y.at[cur].set(y), state.comp_y)

    if params.has_pins:
        rel_x, rel_y, abs_x, abs_y = _rotate_pins(params, state, orientation,
                                                  x, y)
        rel_x = jnp.where(valid, rel_x, state.pin_rel_x)
        rel_y = jnp.where(valid, rel_y, state.pin_rel_y)
        abs_x = jnp.where(valid, abs_x, state.pin_abs_x)
        abs_y = jnp.where(valid, abs_y, state.pin_abs_y)
    else:
        rel_x, rel_y = state.pin_rel_x, state.pin_rel_y
        abs_x, abs_y = state.pin_abs_x, state.pin_abs_y

    cursor = jnp.where(valid, state.cursor + 1, state.cursor)
    placed_all = cursor >= state.num_components

    # --- next action mask -------------------------------------------------
    nxt = jnp.clip(cursor, 0, params.max_components - 1)
    next_mask = orientation_action_mask(
        new_grid, state.comp_h[nxt], state.comp_w[nxt], o_count)
    next_mask = next_mask & ~placed_all      # zeros once all placed
    next_mask = jnp.where(valid, next_mask, state.action_mask)

    # --- done + reward ----------------------------------------------------
    mask_dead = ~jnp.any(next_mask)
    done_valid = placed_all | mask_dead
    done = jnp.where(valid, done_valid, True)

    if params.variant == Variant.SQUARE:
        reward = jnp.where(valid, 1.0, 0.0).astype(F32)
        info_wl = state.info_wirelength
        info_int = state.info_intersections
        info: Dict = {}
    elif params.variant == Variant.RECT:
        reward = jnp.where(valid, 1.0, 0.0).astype(F32)
        info_wl = state.info_wirelength
        info_int = state.info_intersections
        info = {}
    elif defer_routing:
        # reward == terminal_reward(placed_all & valid) wherever done, else 0
        # (the :189-190 select below reduces to exactly that); the caller
        # recomputes it for done boards only and patches state/info.
        reward = jnp.zeros((), F32)
        info_wl = jnp.zeros((), F32)
        info_int = jnp.zeros((), F32)
        info = {"placed_all_eff": placed_all & valid}
    else:
        term_reward, term_wl, term_int = routing.terminal_reward(
            params, abs_x, abs_y, state.pin_net,
            placed_all & valid)
        reward = jnp.where(
            valid, jnp.where(done_valid, term_reward, 0.0), term_reward)
        reward = reward.astype(F32)
        emit = done
        info_wl = jnp.where(emit, term_wl, 0.0)
        info_int = jnp.where(emit, term_int, 0.0)
        info = {"wirelength": info_wl, "num_intersections": info_int}

    new_state = state.replace(
        grid=new_grid, action_mask=next_mask,
        comp_x=comp_x, comp_y=comp_y, cursor=cursor,
        pin_rel_x=rel_x, pin_rel_y=rel_y, pin_abs_x=abs_x, pin_abs_y=abs_y,
        done=done, steps=state.steps + 1,
        info_wirelength=info_wl, info_intersections=info_int)
    return new_state, reward, done, info


# ---------------------------------------------------------------------------
# Observations
# ---------------------------------------------------------------------------

def components_feature(params: EnvParams, state: EnvState) -> jnp.ndarray:
    """all_components_feature f32[C, 5]: [h, w, x, y, area_ratio]
    (Component.calculate_feature, dummy_env_rectangular_pin.py:217-239).
    Unplaced components carry position (-1, -1); padding rows are zero."""
    area_ratio = (state.comp_h * state.comp_w).astype(F32) / params.area
    feat = jnp.stack([
        state.comp_h.astype(F32), state.comp_w.astype(F32),
        state.comp_x.astype(F32), state.comp_y.astype(F32), area_ratio],
        axis=1)
    return jnp.where(state.comp_valid[:, None], feat, 0.0)


def pins_feature(params: EnvParams, state: EnvState
                 ) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """all_pins_num_feature f32[C, ppc, 4] + all_pins_cat_feature f32[C, ppc, 1]
    for the PIN variant, scattered by (component_id, chunk-local pin_id)
    (update_all_pins_feature, dummy_env_rectangular_pin.py:1521-1542)."""
    c, ppc = params.max_components, params.max_num_pins_per_component
    valid = state.pin_valid
    ci = jnp.where(valid, state.pin_comp, c)
    pi = jnp.where(valid, jnp.clip(state.pin_local, 0, ppc - 1), ppc)
    num = jnp.zeros((c + 1, ppc + 1, 4), F32)
    num = num.at[ci, pi].set(jnp.stack(
        [state.pin_rel_x, state.pin_rel_y,
         state.pin_abs_x, state.pin_abs_y], axis=1).astype(F32))
    cat = jnp.zeros((c + 1, ppc + 1, 1), F32)
    cat = cat.at[ci, pi, 0].set(state.pin_net.astype(F32))
    return num[:c, :ppc], cat[:c, :ppc]


def placement_mask(params: EnvParams, state: EnvState) -> jnp.ndarray:
    if params.variant == Variant.RECT:
        # binary placed flag (dummy_env_rectangular.py:275-284)
        return state.comp_placed.astype(F32)
    # pin envs: 0 absent, 1 to-place, 2 placed, 3 current
    # (dummy_env_rectangular_pin.py:1577-1579, 1649-1657)
    c = jnp.arange(params.max_components)
    codes = jnp.where(c < state.cursor, 2.0,
                      jnp.where(c == state.cursor, 3.0, 1.0))
    codes = jnp.where(state.comp_valid, codes, 0.0)
    # after the last component is placed there is no "current" (cursor == C)
    return codes.astype(F32)


def pin_grid_obs(params: EnvParams, state: EnvState) -> jnp.ndarray:
    """pin_grid f32[H, W, max_num_nets + 1] (draw_pins,
    dummy_env_rectangular_pin_spatial.py:1663-1676): occupancy grid with pin
    cells overwritten by net_id + 2, one-hot over depth max_nets + 2 with
    channel 0 (empty) dropped."""
    n = params.max_num_nets
    vals = state.grid
    placed = state.pin_valid & (state.pin_abs_x >= 0) & (state.pin_abs_y >= 0)
    xi = jnp.where(placed, state.pin_abs_x, params.height)
    yi = jnp.where(placed, state.pin_abs_y, params.width)
    vals = jnp.pad(vals, ((0, 1), (0, 1)))
    vals = vals.at[xi, yi].set(jnp.where(placed, state.pin_net + 2, 0))
    vals = vals[:params.height, :params.width]
    return jax.nn.one_hot(vals, n + 2, dtype=F32)[:, :, 1:]


def component_grid_obs(params: EnvParams, state: EnvState,
                       orig_rel_x, orig_rel_y) -> jnp.ndarray:
    """component_grid f32[C, max_h, max_w, max_nets + 1] (draw_components,
    dummy_env_rectangular_pin_spatial.py:1677-1698): channel 0 is an all-ones
    stencil for every existing component; channels 1.. one-hot the reset-time
    (unrotated) pin positions by net.

    Shape note: the reference emits a DATA-DEPENDENT leading dim
    (len(self.components), :1679-1686), contradicting its own declared
    observation space (max_num_components, :500-510). This fixed-shape build
    pads to ``max_components`` with all-zero rows; the parity suite asserts
    row-exact equality on the valid prefix and zero padding beyond it."""
    c = params.max_components
    mh, mw = params.max_component_h, params.max_component_w
    n = params.max_num_nets
    grid = jnp.zeros((c + 1, mh + 1, mw + 1, n + 1), F32)
    ok = state.pin_valid & (orig_rel_x >= 0)
    ci = jnp.where(ok, state.pin_comp, c)
    xi = jnp.where(ok, jnp.clip(orig_rel_x, 0, mh - 1), mh)
    yi = jnp.where(ok, jnp.clip(orig_rel_y, 0, mw - 1), mw)
    ni = jnp.where(ok, jnp.clip(state.pin_net + 1, 0, n), 0)
    grid = grid.at[ci, xi, yi, ni].set(1.0)
    grid = grid[:c, :mh, :mw, :]
    stencil = state.comp_valid[:, None, None].astype(F32)
    grid = grid.at[:, :, :, 0].set(jnp.broadcast_to(stencil, (c, mh, mw)))
    return grid


def observe(params: EnvParams, state: EnvState) -> Dict[str, jnp.ndarray]:
    """Build the reference observation dict for the given variant."""
    grid = state.grid.astype(F32)
    if params.variant == Variant.SQUARE:
        return {"grid": grid,
                "action_mask": state.action_mask[0].astype(F32)}

    obs = {
        "grid": grid,
        "action_mask": state.action_mask.astype(F32),
        "all_components_feature": components_feature(params, state),
        "placement_mask": placement_mask(params, state),
    }
    if params.variant == Variant.RECT:
        obs["component_mask"] = state.comp_valid.astype(F32)
        return obs

    if params.variant == Variant.PIN:
        num, cat = pins_feature(params, state)
        obs["all_pins_num_feature"] = num
        obs["all_pins_cat_feature"] = cat
        return obs

    # PIN_SPATIAL (dummy_env_rectangular_pin_spatial.py obs space :494-546)
    c, ppc = params.max_components, params.max_num_pins_per_component
    rows = c * ppc + 1
    valid = state.pin_valid
    gi = jnp.where(valid, jnp.clip(state.pin_local, 0, rows - 2), rows - 1)
    num = jnp.zeros((rows, 4), F32)
    num = num.at[gi].set(jnp.where(valid[:, None], jnp.stack(
        [state.pin_rel_x, state.pin_rel_y,
         state.pin_abs_x, state.pin_abs_y], axis=1).astype(F32), 0.0))
    cat = jnp.zeros((rows, 2), jnp.int32).at[rows - 1].set(-1)
    cat = cat.at[gi].set(jnp.where(valid[:, None], jnp.stack(
        [state.pin_net, state.pin_comp], axis=1), cat[gi]))
    # guard: sentinel row stays [-1, -1]
    cat = cat.at[rows - 1].set(-1)

    # component feature extended with the sorted global pin-id list
    base_feat = components_feature(params, state)
    pin_ids = jnp.full((c + 1, ppc + 1), -1, I32)
    ci = jnp.where(valid, state.pin_comp, c)
    # rank of pin within component (table order == global id order)
    same = (state.pin_comp[None, :] == state.pin_comp[:, None]) \
        & valid[None, :] & valid[:, None]
    rank = jnp.sum(jnp.tril(same, k=-1), axis=1)
    ri = jnp.where(valid, jnp.clip(rank, 0, ppc - 1), ppc)
    pin_ids = pin_ids.at[ci, ri].set(
        jnp.where(valid, state.pin_local, -1))
    feat = jnp.concatenate(
        [base_feat, pin_ids[:c, :ppc].astype(F32)], axis=1)
    feat = jnp.where(state.comp_valid[:, None], feat, 0.0)

    obs["all_components_feature"] = feat
    obs["all_pins_num_feature"] = num
    obs["all_pins_cat_feature"] = cat
    obs["pin_grid"] = pin_grid_obs(params, state)
    # component_grid is frozen at reset in the reference (draw_components only
    # runs in reset), so it uses the reset-time pre-rotation coords.
    obs["component_grid"] = component_grid_obs(
        params, state, state.pin_rel_x0, state.pin_rel_y0)
    return obs


# ---------------------------------------------------------------------------
# Auto-reset batched stepping
# ---------------------------------------------------------------------------

def step_autoreset(params: EnvParams, state: EnvState, action) -> tuple:
    """Step; boards that finish are transparently re-seeded with a fresh
    instance (the returned obs is the first obs of the new episode, gym
    AutoReset convention). Pure function of (state, action)."""
    stepped, reward, done, info = step(params, state, action)
    key_next, key_reset = jax.random.split(stepped.key)
    fresh = reset(params, key_reset)
    fresh = fresh.replace(key=key_next)
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, a, b),
        fresh, stepped.replace(key=key_next))
    return new_state, reward, done, info


def make_batched(params: EnvParams) -> tuple:
    """Jitted batched (reset, step, observe) closures."""
    reset_b = jax.jit(jax.vmap(lambda k: reset(params, k)))
    step_b = jax.jit(jax.vmap(lambda s, a: step_autoreset(params, s, a)))
    obs_b = jax.jit(jax.vmap(lambda s: observe(params, s)))
    return reset_b, step_b, obs_b


import functools


@functools.lru_cache(maxsize=64)
def make_jitted(params: EnvParams) -> tuple:
    """Jitted single-board (reset, step, observe) closures, cached per
    params. ``step`` here is the raw transition (no auto-reset), the shape
    used by the parity test-suites."""
    reset_j = jax.jit(lambda k: reset(params, k))
    step_j = jax.jit(lambda s, a: step(params, s, a))
    obs_j = jax.jit(lambda s: observe(params, s))
    return reset_j, step_j, obs_j
