"""Parity suite for the rectangular variant.

Semantics and expected values ported from the reference
tests/rectangular_environment/test_env.py + test_components.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.env import EnvParams, Variant
from placement_tpu.env.core import components_feature, make_jitted
from placement_tpu.env.testing import ComponentSpec, set_components


def key(i=0):
    return jax.random.PRNGKey(i)


@pytest.fixture
def env_6():
    # DummyPlacementEnv(6, 6, 2, 4, 2, 4, 4, 1)
    return EnvParams(variant=Variant.RECT, height=6, width=6,
                     min_component_w=2, max_component_w=4,
                     min_component_h=2, max_component_h=4,
                     max_num_components=4, min_num_components=1).validate()


@pytest.fixture
def env_1x1():
    return EnvParams(variant=Variant.RECT, height=6, width=6,
                     min_component_w=1, max_component_w=1,
                     min_component_h=1, max_component_h=1,
                     max_num_components=3, min_num_components=1).validate()


def fixed(params, comps, k=0):
    reset_j, _, _ = make_jitted(params)
    s = reset_j(key(k))
    return set_components(params, s, comps)


def do(params, s, o, x, y):
    _, step_j, _ = make_jitted(params)
    return step_j(s, jnp.array([o, x, y], jnp.int32))


def test_instance_generation(env_6):
    # reference test_env.py:32-44
    reset_j, _, _ = make_jitted(env_6)
    for i in range(8):
        s = reset_j(key(i))
        n = int(s.num_components)
        assert 1 <= n <= 4
        hs = np.asarray(s.comp_h)[:n]
        ws = np.asarray(s.comp_w)[:n]
        assert hs.min() >= 2 and hs.max() <= 4
        assert ws.min() >= 2 and ws.max() <= 4


def test_component_feature():
    # reference test_components.py: feature = [h, w, x, y, area_ratio]
    params = EnvParams(variant=Variant.RECT, height=6, width=6,
                       max_num_components=4, min_num_components=1,
                       min_component_h=2, max_component_h=4,
                       min_component_w=2, max_component_w=4)
    s = fixed(params, [ComponentSpec(3, 4, 0)])
    feat = np.asarray(components_feature(params, s))
    np.testing.assert_allclose(feat[0], [3, 4, -1, -1, 12 / 36])
    assert not feat[1:].any()


def test_component_and_placement_masks(env_6):
    # reference test_env.py:47-63
    comps = [ComponentSpec(2, 2, 0), ComponentSpec(2, 3, 1),
             ComponentSpec(3, 2, 2)]
    s = fixed(env_6, comps)
    _, _, obs_j = make_jitted(env_6)
    obs = obs_j(s)
    np.testing.assert_array_equal(obs["component_mask"], [1, 1, 1, 0])
    np.testing.assert_array_equal(obs["placement_mask"], [0, 0, 0, 0])
    s, *_ = do(env_6, s, 0, 0, 0)
    obs = obs_j(s)
    np.testing.assert_array_equal(obs["placement_mask"], [1, 0, 0, 0])


def test_update_grid_orientations(env_6):
    # reference test_env.py:66-105
    comps = [ComponentSpec(1, 2, 0), ComponentSpec(3, 2, 1)]
    s = fixed(env_6, comps)
    s0, *_ = do(env_6, s, 0, 0, 0)          # original orientation 1x2
    assert int(s0.grid[0, 0]) == 1 and int(s0.grid[0, 1]) == 1
    assert int(s0.grid[1, 0]) == 0

    s1, *_ = do(env_6, s, 1, 0, 0)          # rotated 2x1
    assert int(s1.grid[0, 0]) == 1 and int(s1.grid[1, 0]) == 1
    assert int(s1.grid[0, 1]) == 0


def test_compute_done_place_all(env_6):
    # reference test_env.py:108-128
    comps = [ComponentSpec(1, 2, 0), ComponentSpec(3, 2, 1)]
    s = fixed(env_6, comps)
    s, r, done, _ = do(env_6, s, 0, 0, 0)
    assert not bool(done)
    s, r, done, _ = do(env_6, s, 0, 1, 0)
    assert bool(done)


def test_compute_done_action_mask_full(env_6):
    # reference test_env.py:131-149
    comps = [ComponentSpec(1, 2, 0), ComponentSpec(3, 4, 1),
             ComponentSpec(4, 3, 2), ComponentSpec(4, 4, 3)]
    s = fixed(env_6, comps)
    s, r, done, _ = do(env_6, s, 1, 0, 0)
    s, r, done, _ = do(env_6, s, 0, 2, 2)
    # a 4x3 component no longer fits anywhere
    assert bool(done)


def test_reset_state(env_6):
    # reference test_env.py:152-179
    reset_j, _, obs_j = make_jitted(env_6)
    s = reset_j(key(3))
    obs = obs_j(s)
    n = int(s.num_components)
    assert obs["grid"].shape == (6, 6)
    assert not np.asarray(obs["grid"]).any()
    np.testing.assert_array_equal(obs["placement_mask"], np.zeros(4))
    np.testing.assert_array_equal(
        obs["component_mask"], [1] * n + [0] * (4 - n))
    # feature rows for existing components: [h, w, -1, -1, area/36]
    feat = np.asarray(obs["all_components_feature"])
    for i in range(n):
        h, w = int(s.comp_h[i]), int(s.comp_w[i])
        np.testing.assert_allclose(feat[i], [h, w, -1, -1, h * w / 36.0])
    assert not feat[n:].any()
    assert obs["action_mask"].shape == (2, 6, 6)


def test_validate_action(env_6):
    # reference test_env.py:183-201
    comps = [ComponentSpec(1, 2, 0), ComponentSpec(3, 2, 1)]
    s = fixed(env_6, comps)
    mask = np.asarray(s.action_mask)
    assert mask[0, 0, 0] == 1
    assert mask[0, 4, 5] == 0
    assert mask[1, 2, 3] == 1
    assert mask[1, 5, 4] == 0


def test_compute_action_mask_after_placements(env_6):
    # reference test_env.py:204-230
    comps = [ComponentSpec(1, 2, 0), ComponentSpec(3, 2, 1),
             ComponentSpec(2, 2, 2)]
    s = fixed(env_6, comps)
    s, *_ = do(env_6, s, 0, 0, 0)
    s, *_ = do(env_6, s, 0, 2, 3)
    # now mask is for the 2x2 component
    mask = np.asarray(s.action_mask)
    assert mask[0, 2, 3] == 0
    assert mask[0, 4, 0] == 1


def test_compute_action_mask_orientation(env_6):
    # reference test_env.py:233-257: after placing 1x2@ (0,0) and 3x2 @ (1,2),
    # a 4x2 component rotated (2x4) cannot sit at (1,4) but fits at (4,1).
    comps = [ComponentSpec(1, 2, 0), ComponentSpec(3, 2, 1),
             ComponentSpec(4, 2, 2)]
    s = fixed(env_6, comps)
    s, *_ = do(env_6, s, 0, 0, 0)
    s, *_ = do(env_6, s, 0, 1, 2)
    mask = np.asarray(s.action_mask)
    assert mask[1, 1, 4] == 0
    assert mask[1, 4, 1] == 1


def test_step_integration(env_6):
    # reference test_env.py:281-312
    comps = [ComponentSpec(1, 2, 0), ComponentSpec(3, 2, 1)]
    s = fixed(env_6, comps)
    _, _, obs_j = make_jitted(env_6)
    s, r, done, _ = do(env_6, s, 0, 0, 0)
    obs = obs_j(s)
    assert np.asarray(obs["grid"])[:1, :2].all()
    np.testing.assert_array_equal(obs["placement_mask"], [1, 0, 0, 0])
    np.testing.assert_array_equal(obs["component_mask"], [1, 1, 0, 0])
    np.testing.assert_allclose(
        obs["all_components_feature"][0], [1, 2, 0, 0, 2 / 36])
    assert float(r) == 1.0
    assert not bool(done)


def test_invalid_action_semantics(env_6):
    # dummy_env_rectangular.py:424-432 — invalid => (same obs, 0.0, True)
    comps = [ComponentSpec(4, 4, 0), ComponentSpec(4, 4, 1)]
    s = fixed(env_6, comps)
    s1, r, done, _ = do(env_6, s, 0, 0, 0)
    s2, r, done, _ = do(env_6, s1, 0, 1, 1)   # overlap
    assert float(r) == 0.0 and bool(done)
    np.testing.assert_array_equal(np.asarray(s2.grid), np.asarray(s1.grid))


def test_observation_replacement(env_1x1):
    # reference test_env.py:315-355
    reset_j, step_j, obs_j = make_jitted(env_1x1)
    s = reset_j(key(0))
    o0 = obs_j(s)
    s, *_ = do(env_1x1, s, 0, 0, 0)
    o1 = obs_j(s)
    assert not np.array_equal(o0["grid"], o1["grid"])
    assert not np.array_equal(o0["action_mask"], o1["action_mask"])
    assert not np.array_equal(o0["placement_mask"], o1["placement_mask"])
