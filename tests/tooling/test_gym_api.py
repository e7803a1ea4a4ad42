"""Gym-style adapter tests: old-gym semantics over the functional stepper
(environment/dummy_env_*.py reset/step contracts)."""

import numpy as np
import pytest

from placement_tpu.env.gym_api import PlacementEnv, make
from placement_tpu.env.types import EnvParams, Variant


def test_square_episode():
    env = PlacementEnv(EnvParams(variant=Variant.SQUARE, height=6, width=6,
                                 component_n=2), seed=0)
    obs = env.reset()
    assert obs["grid"].shape == (6, 6)
    assert obs["action_mask"].shape == (6, 6)
    total, done, steps = 0.0, False, 0
    while not done:
        valid = np.argwhere(env.action_mask == 1)
        x, y = valid[0]
        obs, r, done, info = env.step((int(x), int(y)))
        total += r
        steps += 1
        assert steps <= 9
    # 6x6 grid greedily packed with 2x2 -> 9 placements, +1 reward each
    assert total == 9.0


def test_pin_episode_terminal_info():
    env = make("rectangle_pin", seed=1)
    obs = env.reset()
    assert set(obs) >= {"grid", "action_mask", "all_components_feature",
                        "placement_mask", "all_pins_num_feature",
                        "all_pins_cat_feature"}
    done, last_info, r = False, {}, 0.0
    while not done:
        valid = np.argwhere(env.action_mask == 1)
        o, x, y = valid[np.random.default_rng(0).integers(len(valid))]
        assert env.validate_action((int(o), int(x), int(y)))
        obs, r, done, last_info = env.step((int(o), int(x), int(y)))
    assert "wirelength" in last_info and "num_intersections" in last_info
    assert r <= 0.0  # routing penalty reward


def test_invalid_action_square_semantics():
    env = PlacementEnv(EnvParams(variant=Variant.SQUARE, height=5, width=5,
                                 component_n=2), seed=0)
    env.reset()
    # out-of-bounds corner is invalid: (4,4) can't fit a 2x2
    obs, r, done, info = env.step((4, 4))
    assert r == 0.0 and done  # dummy_env_square.py:134-140
    assert info == {}


def test_flat_action_wrapper_parity():
    env = make("rectangle_pin", seed=3, flatten_actions=True)
    obs = env.reset()
    a = int(np.argwhere(obs["action_mask"].reshape(-1) == 1)[0][0])
    obs2, r, done, _ = env.step(a)
    assert obs2["action_mask"].ndim == 1  # flattened obs mask
    assert obs2["action_mask"].shape[0] == env.action_size


def test_seed_determinism():
    e1 = make("rectangle_pin", seed=7)
    e2 = make("rectangle_pin", seed=7)
    o1, o2 = e1.reset(), e2.reset()
    for k in o1:
        np.testing.assert_array_equal(o1[k], o2[k])


def test_make_overrides():
    env = make("rectangle_pin", height=12, width=11)
    assert env.params.height == 12 and env.params.width == 11
    with pytest.raises(ValueError):
        make("rectangle_pin", height=-1)
