"""Pin-environment parity: golden rewards, pin rotation, feature arrays,
and step dynamics ported from the reference tests/pin_environment/."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.env import EnvParams, Variant, routing
from placement_tpu.env.core import make_jitted, pins_feature
from placement_tpu.env.testing import ComponentSpec, PinSpec, set_components


def key(i=0):
    return jax.random.PRNGKey(i)


# Mirrors env_10_10_reward (conftest.py:266-283) except max_num_pins_per_net
# is widened to 4 so the hand-built fixture nets (3 and 4 pins) fit the
# padded tables; the expected values below recompute the normalizers from
# these params with the reference formulas (find_reward:879-896).
REWARD_PARAMS = EnvParams(
    variant=Variant.PIN, height=10, width=10,
    net_distribution=1, pin_spread=1,
    min_component_w=2, max_component_w=4,
    min_component_h=2, max_component_h=4,
    max_num_components=5, min_num_components=2,
    min_num_nets=4, max_num_nets=4,
    min_num_pins_per_net=2, max_num_pins_per_net=4,
    reward_type="both")

# exact replica of env_10_10_reward for the penalty test (no injected pins)
PENALTY_PARAMS = REWARD_PARAMS.replace(max_num_pins_per_net=2)

# env_low_complexity / env_fixed_components_reset (conftest.py:127-145)
LOW_PARAMS = EnvParams(
    variant=Variant.PIN, height=6, width=6,
    net_distribution=1, pin_spread=1,
    min_component_w=2, max_component_w=4,
    min_component_h=2, max_component_h=4,
    max_num_components=4, min_num_components=2,
    min_num_nets=4, max_num_nets=4,
    min_num_pins_per_net=2, max_num_pins_per_net=2)


def reward_fixture_components():
    """The five engineered components of conftest.py:67-117 (absolute pin
    positions pre-set; all placed)."""
    return [
        ComponentSpec(3, 3, 0, [  # component_3x3_2_pins_reward_1 (comp_id 1->0)
            PinSpec(0, 2, 0, 0, 1, absolute_x=0, absolute_y=2),
            PinSpec(2, 0, 0, 0, 2, absolute_x=2, absolute_y=0)]),
        ComponentSpec(3, 3, 1, [  # component_3x3_2_pins_reward_2
            PinSpec(0, 2, 0, 1, 2, absolute_x=3, absolute_y=4),
            PinSpec(2, 0, 0, 1, 1, absolute_x=5, absolute_y=3)]),
        ComponentSpec(2, 1, 2, [  # component_2x1_1_pin_reward_1
            PinSpec(0, 0, 0, 2, 2, absolute_x=4, absolute_y=1)]),
        ComponentSpec(2, 1, 3, [  # component_2x1_1_pin_reward_2
            PinSpec(0, 0, 0, 3, 2, absolute_x=7, absolute_y=5)]),
        ComponentSpec(2, 2, 4, [  # component_2x2_1_pin_reward
            PinSpec(0, 1, 0, 4, 1, absolute_x=8, absolute_y=1)]),
    ]


def _reward(params):
    comps = reward_fixture_components()
    reset_j, _, _ = make_jitted(params)
    s = set_components(params, reset_j(key()), comps)
    fn = jax.jit(lambda st: routing.terminal_reward(
        params, st.pin_abs_x, st.pin_abs_y, st.pin_net,
        jnp.asarray(True)))
    r, wl, ni = fn(s)
    return float(r), float(wl), float(ni)


def _normalizers(params):
    avg_comp = (np.mean([params.min_component_h, params.max_component_h])
                * np.mean([params.min_component_w, params.max_component_w])
                * np.mean([params.min_num_components,
                           params.max_num_components]))
    avg_net = (np.mean([params.min_num_pins_per_net,
                        params.max_num_pins_per_net])
               * np.mean([params.min_num_nets, params.max_num_nets]))
    return params.height + params.width, min(avg_comp, avg_net)


BEAM_WL = (np.sqrt(26) + np.sqrt(13) + np.sqrt(17) + np.sqrt(10)
           + np.sqrt(5))
CENTROID_WL = (13 / 3 + np.sqrt(13) / 3 + np.sqrt(130) / 3 + np.sqrt(41) / 2
               + 3 / 2 + np.sqrt(61) / 2 + np.sqrt(13) / 2)


def test_find_reward_beam():
    # reference test_env.py:199-255 (wirelength/crossings are golden)
    params = REWARD_PARAMS.replace(reward_type="beam")
    r, wl, ni = _reward(params)
    wn, inorm = _normalizers(params)
    assert np.isclose(r, -0.5 * (BEAM_WL / wn + 1 / inorm), rtol=1e-5)
    assert np.isclose(wl, BEAM_WL / wn, rtol=1e-5)
    assert np.isclose(ni, 1 / inorm, rtol=1e-5)


def test_find_reward_centroid():
    # reference test_env.py:258-321
    params = REWARD_PARAMS.replace(reward_type="centroid")
    r, wl, ni = _reward(params)
    wn, inorm = _normalizers(params)
    assert np.isclose(r, -0.5 * (CENTROID_WL / wn + 2 / inorm), rtol=1e-5)


def test_find_reward_both():
    # reference test_env.py:324-379 — beam has fewer crossings and wins
    params = REWARD_PARAMS.replace(reward_type="both")
    r, wl, ni = _reward(params)
    wn, inorm = _normalizers(params)
    assert np.isclose(r, -0.5 * (BEAM_WL / wn + 1 / inorm), rtol=1e-5)


def test_find_reward_not_all_placed():
    # reference test_env.py:382-391: exact env_10_10_reward params ->
    # reward = -0.5 * 2*sqrt(2) - 0.5 * 24/8
    params = PENALTY_PARAMS
    fn = jax.jit(lambda: routing.terminal_reward(
        params, jnp.full((params.max_pins,), -1, jnp.int32),
        jnp.full((params.max_pins,), -1, jnp.int32),
        jnp.full((params.max_pins,), -1, jnp.int32), jnp.asarray(False)))
    r, wl, ni = fn()
    assert np.isclose(float(r), -0.5 * 2 * math.sqrt(2) - 0.5 * 24 / 8,
                      rtol=1e-5)
    # info carries the raw upper bounds (find_reward:906-908)
    assert np.isclose(float(wl), params.max_wirelength, rtol=1e-5)
    assert float(ni) == params.max_num_intersections


# ---------------------------------------------------------------------------
# Pin rotation (test_component.py:1-34; Component 4x3, pins (0,0) & (0,2))
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("orientation,at,expected", [
    (0, (2, 0), [(2, 0), (2, 2)]),
    (1, (0, 0), [(0, 3), (2, 3)]),
    (2, (0, 0), [(3, 2), (3, 0)]),
    (3, (0, 0), [(2, 0), (0, 0)]),
])
def test_place_component_rotations(orientation, at, expected):
    params = EnvParams(variant=Variant.PIN, height=6, width=6,
                       min_component_w=2, max_component_w=4,
                       min_component_h=2, max_component_h=4,
                       max_num_components=4, min_num_components=2,
                       min_num_nets=2, max_num_nets=2,
                       min_num_pins_per_net=2, max_num_pins_per_net=2)
    comps = [ComponentSpec(4, 3, 0, [PinSpec(0, 0, 0, 0, 0),
                                     PinSpec(0, 2, 1, 0, 0)])]
    reset_j, step_j, _ = make_jitted(params)
    s = set_components(params, reset_j(key()), comps)
    s, *_ = step_j(s, jnp.array([orientation, at[0], at[1]], jnp.int32))
    got = sorted(zip(np.asarray(s.pin_abs_x)[:2].tolist(),
                     np.asarray(s.pin_abs_y)[:2].tolist()))
    assert got == sorted(expected)


# ---------------------------------------------------------------------------
# Feature arrays (test_env.py:787-827, 30x30 env)
# ---------------------------------------------------------------------------

def test_update_all_pins_feature():
    params = EnvParams(variant=Variant.PIN, height=30, width=30,
                       net_distribution=1, pin_spread=1,
                       min_component_w=2, max_component_w=5,
                       min_component_h=2, max_component_h=5,
                       max_num_components=6, min_num_components=1,
                       min_num_nets=2, max_num_nets=4,
                       min_num_pins_per_net=2, max_num_pins_per_net=5)
    comps = [
        ComponentSpec(1, 3, 0, [PinSpec(0, 0, 0, 0, 0), PinSpec(0, 2, 1, 0, 1)]),
        ComponentSpec(4, 2, 1, [PinSpec(3, 1, 0, 1, 1), PinSpec(1, 0, 1, 1, 2)]),
        ComponentSpec(5, 5, 2, [PinSpec(2, 0, 0, 2, 2), PinSpec(2, 2, 1, 2, 0)]),
    ]
    reset_j, step_j, _ = make_jitted(params)
    s = set_components(params, reset_j(key()), comps)

    s, *_ = step_j(s, jnp.array([0, 28, 26], jnp.int32))
    num, cat = jax.jit(lambda st: pins_feature(params, st))(s)
    num, cat = np.asarray(num), np.asarray(cat)
    np.testing.assert_array_equal(num[0, 0], [0, 0, 28, 26])
    assert cat[0, 0, 0] == 0
    np.testing.assert_array_equal(num[0, 1], [0, 2, 28, 28])
    assert cat[0, 1, 0] == 1
    assert not num[0, 2:].any() and not cat[0, 2:].any()
    assert not num[3:].any() and not cat[3:].any()

    s, *_ = step_j(s, jnp.array([1, 0, 0], jnp.int32))
    num, cat = jax.jit(lambda st: pins_feature(params, st))(s)
    num, cat = np.asarray(num), np.asarray(cat)
    np.testing.assert_array_equal(num[1, 0], [1, 0, 1, 0])
    assert cat[1, 0, 0] == 1
    np.testing.assert_array_equal(num[1, 1], [0, 2, 0, 2])
    assert cat[1, 1, 0] == 2
    # unplaced component keeps rel coords, abs -1
    np.testing.assert_array_equal(num[2, 0], [2, 0, -1, -1])
    assert cat[2, 0, 0] == 2
    np.testing.assert_array_equal(num[2, 1], [2, 2, -1, -1])
    assert cat[2, 1, 0] == 0


# ---------------------------------------------------------------------------
# Step dynamics (test_env.py:563-785)
# ---------------------------------------------------------------------------

def simple_fixture(params):
    comps = [ComponentSpec(2, 2, 0, [PinSpec(0, 0, 0, 0, 0)]),
             ComponentSpec(3, 3, 1, [PinSpec(0, 1, 0, 1, 0)])]
    reset_j, step_j, obs_j = make_jitted(params)
    s = set_components(params, reset_j(key()), comps)
    return s, step_j, obs_j


def test_step(snapshot=None):
    # reference test_env.py:626-657
    params = LOW_PARAMS
    s, step_j, obs_j = simple_fixture(params)
    s, r, done, info = step_j(s, jnp.array([0, 0, 0], jnp.int32))
    obs = obs_j(s)
    assert np.asarray(obs["grid"])[:2, :2].all()
    np.testing.assert_array_equal(obs["placement_mask"], [2, 3, 0, 0])
    np.testing.assert_allclose(
        np.asarray(obs["all_components_feature"])[0], [2, 2, 0, 0, 4 / 36])
    assert float(r) == 0.0
    assert not bool(done)


def test_validate_action():
    # reference test_env.py:660-679
    params = LOW_PARAMS
    s, _, _ = simple_fixture(params)
    mask = np.asarray(s.action_mask)
    assert mask[0, 0, 0] == 1
    assert mask[0, 4, 5] == 0   # 2x2 cannot start at col 5
    assert mask[2, 3, 1] == 1
    assert mask[1, 5, 4] == 0


def test_action_mask_planes_are_copies():
    # compute_action_mask:1866-1869 — planes 2,3 copy 0,1
    params = LOW_PARAMS
    s, _, _ = simple_fixture(params)
    mask = np.asarray(s.action_mask)
    np.testing.assert_array_equal(mask[2], mask[0])
    np.testing.assert_array_equal(mask[3], mask[1])


def test_compute_if_done_mask_dead():
    # reference test_env.py:756-784: after 2x2@(0,0) and 3x3 rotated@(3,0),
    # no further component fits... second placement leaves no room info
    params = LOW_PARAMS
    s, step_j, _ = simple_fixture(params)
    s, r, done, _ = step_j(s, jnp.array([0, 0, 0], jnp.int32))
    s, r, done, _ = step_j(s, jnp.array([2, 3, 0], jnp.int32))
    assert bool(done)


def test_invalid_action_gives_penalty():
    # dummy_env_rectangular_pin.py:1696-1710
    params = LOW_PARAMS
    s, step_j, _ = simple_fixture(params)
    s2, r, done, info = step_j(s, jnp.array([0, 5, 5], jnp.int32))
    assert bool(done)
    wn, inorm = _normalizers(params)
    expected = -(0.5 * params.max_wirelength / wn
                 + 0.5 * params.max_num_intersections / inorm)
    assert np.isclose(float(r), expected, rtol=1e-5)
    assert np.isclose(float(info["wirelength"]), params.max_wirelength,
                      rtol=1e-5)
    assert float(info["num_intersections"]) == params.max_num_intersections
    np.testing.assert_array_equal(np.asarray(s2.grid), np.asarray(s.grid))


def test_terminal_reward_on_last_placement():
    # placing every component yields the routed reward, not the penalty
    params = LOW_PARAMS.replace(reward_type="centroid")
    comps = [ComponentSpec(2, 2, 0, [PinSpec(0, 0, 0, 0, 0),
                                     PinSpec(1, 1, 1, 0, 0)])]
    reset_j, step_j, _ = make_jitted(params)
    s = set_components(params, reset_j(key()), comps)
    s, r, done, info = step_j(s, jnp.array([0, 0, 0], jnp.int32))
    assert bool(done)
    # single 2-pin net routed directly: wirelength sqrt(2)/12, 0 crossings
    wn, _ = _normalizers(params)
    assert np.isclose(float(r), -0.5 * math.sqrt(2) / wn, rtol=1e-5)


# ---------------------------------------------------------------------------
# Generator property tests (test_env.py:394-560)
# ---------------------------------------------------------------------------

def test_generator_properties():
    params = EnvParams(variant=Variant.PIN, height=10, width=10,
                       net_distribution=1, pin_spread=1,
                       min_component_w=2, max_component_w=4,
                       min_component_h=2, max_component_h=4,
                       max_num_components=6, min_num_components=1,
                       min_num_nets=2, max_num_nets=4,
                       min_num_pins_per_net=2, max_num_pins_per_net=5)
    from placement_tpu.env.generator import generate_instance
    gen = jax.jit(lambda k: generate_instance(k, params))
    for i in range(12):
        inst = gen(key(i))
        n = int(inst["num_components"])
        assert params.min_num_components <= n <= params.max_num_components
        hs = np.asarray(inst["comp_h"])[:n]
        ws = np.asarray(inst["comp_w"])[:n]
        assert ((hs >= 2) & (hs <= 4)).all()
        assert ((ws >= 2) & (ws <= 4)).all()
        area = int((hs * ws).sum())

        nn = int(inst["num_nets"])
        assert 1 <= nn <= min(params.max_num_nets, area // 2)
        np_total = int(inst["num_pins"])
        assert (np_total == area
                or (nn * params.min_num_pins_per_net <= np_total
                    <= nn * params.max_num_pins_per_net))

        pin_net = np.asarray(inst["pin_net"])
        pin_comp = np.asarray(inst["pin_comp"])
        valid = pin_net >= 0
        assert valid.sum() == np_total
        # every net has >= min_ppn pins, <= max_ppn pins
        for net in range(nn):
            cnt = int((pin_net == net).sum())
            assert params.min_num_pins_per_net <= cnt
            assert cnt <= params.max_num_pins_per_net
        # every pin allocated to an existing component
        assert ((pin_comp[valid] >= 0) & (pin_comp[valid] < n)).all()
        # pins per component <= component area, distinct cells
        rel = list(zip(np.asarray(inst["pin_rel_x"])[valid].tolist(),
                       np.asarray(inst["pin_rel_y"])[valid].tolist(),
                       pin_comp[valid].tolist()))
        assert len(set(rel)) == len(rel)
        for c in range(n):
            mine = pin_comp[valid] == c
            assert mine.sum() <= hs[c] * ws[c]
            rx = np.asarray(inst["pin_rel_x"])[valid][mine]
            ry = np.asarray(inst["pin_rel_y"])[valid][mine]
            assert ((rx >= 0) & (rx < hs[c])).all()
            assert ((ry >= 0) & (ry < ws[c])).all()
