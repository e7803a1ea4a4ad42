"""Tests for the row-layout routing-reward bodies (ops/fused_routing.py).

The fused Pallas kernel computes terminal rewards on ``[B, P]`` row tables;
these tests pin that arithmetic to the reference-parity ``routing`` module
(beam_search, dummy_env_rectangular_pin.py:1356-1423; find_reward:832-975)
on real terminal pin tables produced by the pure-JAX stepper — for all
three reward types, several beam widths, and a variable-pins-per-net
configuration where net counts differ per board.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.agent.random_policy import random_action
from placement_tpu.env import core, routing
from placement_tpu.ops import fused_routing
from placement_tpu.utils.config import load_experiment

# slow tier: Pallas TPU-interpreter runs
pytestmark = pytest.mark.slow

FLAGSHIP, _, _ = load_experiment("rectangle_pin")
# nets with 2..6 pins: exercises 2-pin direct centroid segments, variable
# beam path lengths, and per-board freeze points
VARIED = dataclasses.replace(FLAGSHIP, min_num_pins_per_net=2,
                             min_num_nets=2)


def _terminal_tables(params, batch, seed=0):
    """Random legal episodes to completion on the pure-JAX stepper; returns
    int32 (pax, pay, pnet, npin[B,1]) tables."""
    step_b = jax.jit(jax.vmap(lambda s, a: core.step(params, s, a)))
    reset_b = jax.jit(jax.vmap(lambda k: core.reset(params, k)))
    states = reset_b(jax.random.split(jax.random.PRNGKey(seed), batch))
    key = jax.random.PRNGKey(seed + 1)
    for _ in range(5):  # five 2x2 components => exactly 5 placements
        key, k = jax.random.split(key)
        states, _, done, _ = step_b(
            states, random_action(k, params, states.action_mask))
    assert bool(jnp.all(states.done))
    return (states.pin_abs_x.astype(jnp.int32),
            states.pin_abs_y.astype(jnp.int32),
            states.pin_net.astype(jnp.int32),
            states.num_pins.reshape(-1, 1).astype(jnp.int32))


def _routing_wl_int(params, pax, pay, pnet):
    """Reference-parity beam wl/crossings via routing.beam_route, one board."""
    pos, mask, _ = routing.net_pin_table(
        params, pax.astype(jnp.float32), pay.astype(jnp.float32), pnet)
    segs, valid = routing.beam_route(params, pos, mask,
                                     params.reward_beam_width)
    return (routing.wirelength(segs, valid),
            routing.count_crossings(segs, valid))


@pytest.mark.parametrize("bw", [2, 4])   # trace cost grows ~bw^3; 2 is the
def test_beam_rows_matches_routing(bw):  # reference default (configs/*.json)
    """beam_wl_int == routing.beam_route wirelength/crossings on 48 real
    terminal boards (same heapq ordering, same arithmetic)."""
    params = dataclasses.replace(FLAGSHIP, reward_type="beam",
                                 reward_beam_width=bw)
    pax, pay, pnet, npin = _terminal_tables(params, 48, seed=bw)
    wl, ints = jax.jit(lambda *a: fused_routing.beam_wl_int(params, *a))(
        pax, pay, pnet, npin)
    ref = jax.jit(jax.vmap(lambda x, y, n: _routing_wl_int(params, x, y, n)))(
        pax, pay, pnet)
    np.testing.assert_allclose(np.asarray(wl).ravel(), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ints).ravel().astype(int),
                                  np.asarray(ref[1]))


@pytest.mark.parametrize("reward_type", ["beam", "both", "centroid"])
def test_reward_rows_matches_terminal_reward(reward_type):
    """reward_rows == routing.terminal_reward for every reward type on the
    flagship config."""
    params = dataclasses.replace(FLAGSHIP, reward_type=reward_type)
    pax, pay, pnet, npin = _terminal_tables(params, 48, seed=11)
    got = jax.jit(lambda *a: fused_routing.reward_rows(params, *a))(
        pax, pay, pnet, npin)
    ref = jax.jit(jax.vmap(lambda x, y, n: routing.terminal_reward(
        params, x.astype(jnp.float32), y.astype(jnp.float32), n,
        jnp.asarray(True))[0]))(pax, pay, pnet)
    np.testing.assert_allclose(np.asarray(got).ravel(), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reward_type", ["beam", "both"])
def test_reward_rows_varied_net_sizes(reward_type):
    """Variable pins-per-net (2..6) and nets-per-board (2..3): per-board
    freeze points, 2-pin beam paths, and empty trailing nets."""
    params = dataclasses.replace(VARIED, reward_type=reward_type)
    pax, pay, pnet, npin = _terminal_tables(params, 48, seed=29)
    got = jax.jit(lambda *a: fused_routing.reward_rows(params, *a))(
        pax, pay, pnet, npin)
    ref = jax.jit(jax.vmap(lambda x, y, n: routing.terminal_reward(
        params, x.astype(jnp.float32), y.astype(jnp.float32), n,
        jnp.asarray(True))[0]))(pax, pay, pnet)
    np.testing.assert_allclose(np.asarray(got).ravel(), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_centroid_wl_int_exposed_for_both():
    """'both' picks the route with fewer crossings, tie -> beam
    (find_reward:951-965): verify the selection logic on real tables."""
    params = dataclasses.replace(FLAGSHIP, reward_type="both")
    pax, pay, pnet, npin = _terminal_tables(params, 32, seed=5)
    c_wl, c_int = fused_routing.centroid_wl_int(params, pax, pay, pnet, npin)
    b_wl, b_int = fused_routing.beam_wl_int(params, pax, pay, pnet, npin)
    r = fused_routing.reward_rows(params, pax, pay, pnet, npin)
    use_beam = np.asarray(b_int <= c_int)
    wl = np.where(use_beam, np.asarray(b_wl), np.asarray(c_wl))
    ints = np.where(use_beam, np.asarray(b_int), np.asarray(c_int))
    expect = -(params.weight_wirelength * wl / params.wirelength_normalizer
               + params.weight_num_intersections * ints
               / params.intersections_normalizer)
    np.testing.assert_allclose(np.asarray(r), expect, rtol=1e-6)
