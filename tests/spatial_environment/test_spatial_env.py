"""Parity checks for the pin-spatial observation builders
(dummy_env_rectangular_pin_spatial.py: draw_pins:1663, draw_components:1677,
extended component features :229-238, flat pin tables :560-574)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.env import EnvParams, Variant
from placement_tpu.env.core import make_jitted
from placement_tpu.env.testing import ComponentSpec, PinSpec, set_components

PARAMS = EnvParams(
    variant=Variant.PIN_SPATIAL, height=6, width=6,
    net_distribution=1, pin_spread=1,
    min_component_w=2, max_component_w=3,
    min_component_h=2, max_component_h=3,
    max_num_components=3, min_num_components=2,
    min_num_nets=2, max_num_nets=2,
    min_num_pins_per_net=2, max_num_pins_per_net=2)


def fixture():
    comps = [
        ComponentSpec(2, 3, 0, [PinSpec(0, 0, 0, 0, 0),
                                PinSpec(1, 2, 1, 0, 1)]),
        ComponentSpec(2, 2, 1, [PinSpec(0, 1, 2, 1, 0),
                                PinSpec(1, 0, 3, 1, 1)]),
    ]
    reset_j, step_j, obs_j = make_jitted(PARAMS)
    s = set_components(PARAMS, reset_j(jax.random.PRNGKey(0)), comps)
    return s, step_j, obs_j


def test_obs_shapes():
    s, _, obs_j = fixture()
    obs = obs_j(s)
    c, ppc, n = 3, 9, 2
    assert obs["pin_grid"].shape == (6, 6, n + 1)
    assert obs["component_grid"].shape == (c, 3, 3, n + 1)
    assert obs["all_components_feature"].shape == (c, 5 + ppc)
    assert obs["all_pins_num_feature"].shape == (c * ppc + 1, 4)
    assert obs["all_pins_cat_feature"].shape == (c * ppc + 1, 2)
    assert obs["all_pins_cat_feature"].dtype == jnp.int32


def test_sentinel_row():
    # :563-574 — last pin row is all zeros (num) / [-1, -1] (cat)
    s, _, obs_j = fixture()
    obs = obs_j(s)
    np.testing.assert_array_equal(np.asarray(obs["all_pins_num_feature"])[-1],
                                  [0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(obs["all_pins_cat_feature"])[-1],
                                  [-1, -1])


def test_flat_pin_tables():
    s, _, obs_j = fixture()
    obs = obs_j(s)
    num = np.asarray(obs["all_pins_num_feature"])
    cat = np.asarray(obs["all_pins_cat_feature"])
    # rows are indexed by the fixture's pin_id (creation order): comp0 pins
    # got ids 0,1 and comp1 pins ids 2,3
    np.testing.assert_array_equal(num[0], [0, 0, -1, -1])
    np.testing.assert_array_equal(cat[0], [0, 0])
    np.testing.assert_array_equal(num[1], [1, 2, -1, -1])
    np.testing.assert_array_equal(cat[1], [1, 0])
    np.testing.assert_array_equal(num[2], [0, 1, -1, -1])
    np.testing.assert_array_equal(cat[2], [0, 1])
    np.testing.assert_array_equal(num[3], [1, 0, -1, -1])
    np.testing.assert_array_equal(cat[3], [1, 1])
    assert not num[4:].any()


def test_component_feature_pin_ids():
    # feature = [h, w, x, y, area_ratio, pin ids..., -1 pad]
    s, _, obs_j = fixture()
    obs = obs_j(s)
    feat = np.asarray(obs["all_components_feature"])
    np.testing.assert_allclose(feat[0][:5], [2, 3, -1, -1, 6 / 36])
    np.testing.assert_array_equal(feat[0][5:], [0, 1] + [-1] * 7)
    np.testing.assert_array_equal(feat[1][5:], [2, 3] + [-1] * 7)
    assert not feat[2].any()  # absent component row is zero


def test_pin_grid_after_placement():
    s, step_j, obs_j = fixture()
    s, *_ = step_j(s, jnp.array([0, 4, 3], jnp.int32))  # comp0 2x3 at (4,3)
    obs = obs_j(s)
    pg = np.asarray(obs["pin_grid"])
    # channel 0 = occupied-no-pin; channel 1+k = net k pin
    # comp0 pins: (0,0)->abs(4,3) net0 ; (1,2)->abs(5,5) net1
    assert pg[4, 3, 1] == 1 and pg[4, 3, 0] == 0
    assert pg[5, 5, 2] == 1
    # other occupied cells of the 2x3 footprint are channel 0
    assert pg[4, 4, 0] == 1 and pg[5, 4, 0] == 1
    # empty cell -> all zeros
    assert not pg[0, 0].any()


def test_component_grid_channels():
    s, step_j, obs_j = fixture()
    obs0 = obs_j(s)
    cg = np.asarray(obs0["component_grid"])
    # channel 0: ones stencil over the full max_h x max_w for existing comps
    assert cg[0, :, :, 0].all() and cg[1, :, :, 0].all()
    assert not cg[2, :, :, 0].any()
    # pin channels at reset-time relative coords
    assert cg[0, 0, 0, 1] == 1      # comp0 pin net0 at (0,0)
    assert cg[0, 1, 2, 2] == 1      # comp0 pin net1 at (1,2)
    assert cg[1, 0, 1, 1] == 1
    assert cg[1, 1, 0, 2] == 1
    # frozen after a rotated placement (draw_components only runs at reset)
    s, *_ = step_j(s, jnp.array([1, 0, 0], jnp.int32))
    cg2 = np.asarray(obs_j(s)["component_grid"])
    np.testing.assert_array_equal(cg2, cg)


def test_rotated_pin_positions_in_num_features():
    s, step_j, obs_j = fixture()
    # place comp0 (2x3) rotated 90° at (0,0): footprint 3x2
    s, *_ = step_j(s, jnp.array([1, 0, 0], jnp.int32))
    num = np.asarray(obs_j(s)["all_pins_num_feature"])
    # pin (0,0): rel -> (0, h-0-1) = (0,1), abs (0,1)
    np.testing.assert_array_equal(num[0], [0, 1, 0, 1])
    # pin (1,2): rel -> (2, h-1-1) = (2,0), abs (2,0); row = its pin_id 1
    np.testing.assert_array_equal(num[1], [2, 0, 2, 0])


def test_spatial_reward_normalization():
    # spatial max_wirelength is pre-normalized by (h+w) (:746) and then
    # normalized again inside find_reward — reproduce the double division
    p = PARAMS
    import math
    expected = (0.5 * math.hypot(6, 6) * (2 * 2)) / 12
    assert np.isclose(p.max_wirelength, expected)
    from placement_tpu.env import routing
    fn = jax.jit(lambda: routing.terminal_reward(
        p, jnp.full((p.max_pins,), -1, jnp.int32),
        jnp.full((p.max_pins,), -1, jnp.int32),
        jnp.full((p.max_pins,), -1, jnp.int32), jnp.asarray(False)))
    r, wl, ni = fn()
    inorm = min((2.5 * 2.5 * 2.5), (2.0 * 2.0))
    assert np.isclose(float(r),
                      -(0.5 * expected / 12 + 0.5 * p.max_num_intersections
                        / inorm), rtol=1e-5)


def test_generated_reset_roundtrip():
    reset_j, step_j, obs_j = make_jitted(PARAMS)
    s = reset_j(jax.random.PRNGKey(7))
    obs = obs_j(s)
    assert np.isfinite(np.asarray(obs["pin_grid"])).all()
    n = int(s.num_components)
    cg = np.asarray(obs["component_grid"])
    assert cg[:n, :, :, 0].all()


def test_spatial_pin_local_is_creation_index():
    """Spatial pins keep their creation-order pin_id: base block (min_ppn per
    net, net-grouped) first, extras appended per net afterwards
    (generate_pins:977-981, allocate_pins_to_nets:1096-1127; the spatial env
    drops the pin env's per-chunk pin_id rewrite)."""
    params = EnvParams(
        variant=Variant.PIN_SPATIAL, height=10, width=10,
        net_distribution=2, pin_spread=2,
        min_component_w=2, max_component_w=3,
        min_component_h=2, max_component_h=3,
        max_num_components=5, min_num_components=4,
        min_num_nets=2, max_num_nets=3,
        min_num_pins_per_net=2, max_num_pins_per_net=5)  # extras occur
    reset_j, _, _ = make_jitted(params)
    min_ppn = params.min_num_pins_per_net
    saw_extras = False
    for seed in range(20):
        s = reset_j(jax.random.PRNGKey(seed))
        net = np.asarray(s.pin_net)
        local = np.asarray(s.pin_local)
        num_nets = int(s.num_nets)
        num_pins = int(s.num_pins)
        valid = net >= 0
        # ids are a permutation of range(num_pins)
        assert sorted(local[valid].tolist()) == list(range(num_pins))
        counts = [int((net == n).sum()) for n in range(num_nets)]
        saw_extras |= any(c > min_ppn for c in counts)
        extras_before = 0
        pos = 0
        for n in range(num_nets):
            for r in range(counts[n]):
                expect = (n * min_ppn + r if r < min_ppn else
                          num_nets * min_ppn + extras_before + r - min_ppn)
                assert local[pos] == expect, (seed, n, r)
                pos += 1
            extras_before += max(counts[n] - min_ppn, 0)
    assert saw_extras  # config must actually exercise the extras path
