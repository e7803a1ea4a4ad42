"""Parity suite for the square variant.

Golden arrays are ported from the reference unit tests
(tests/square_environment/test_env.py) — the action-mask and grid values
there are the correctness oracle for the batched stepper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.env import EnvParams, Variant
from placement_tpu.env.core import make_jitted


def make(height, width, n):
    return EnvParams(variant=Variant.SQUARE, height=height, width=width,
                     component_n=n).validate()


def key():
    return jax.random.PRNGKey(0)


def reset(params, k):
    return make_jitted(params)[0](k)


def observe(params, s):
    return make_jitted(params)[2](s)


def do(params, state, x, y):
    return make_jitted(params)[1](state, jnp.array([0, x, y], jnp.int32))


@pytest.fixture
def env_4_2():
    return make(4, 4, 2)


@pytest.fixture
def env_5_2():
    return make(5, 5, 2)


@pytest.fixture
def env_11_10_3():
    return make(11, 10, 3)


def test_compute_if_done(env_4_2):
    # reference test_env.py:6-26
    s = reset(env_4_2, key())
    s, r, done, _ = do(env_4_2, s, 0, 0)
    assert not bool(done)
    s, r, done, _ = do(env_4_2, s, 0, 2)
    s, r, done, _ = do(env_4_2, s, 2, 1)
    assert bool(done)


def test_update_grid(env_4_2):
    # reference test_env.py:29-41
    s = reset(env_4_2, key())
    s, *_ = do(env_4_2, s, 0, 0)
    expected = np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                         [0, 0, 0, 0], [0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(s.grid), expected)
    s, *_ = do(env_4_2, s, 2, 2)
    expected = np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                         [0, 0, 1, 1], [0, 0, 1, 1]])
    np.testing.assert_array_equal(np.asarray(s.grid), expected)


def test_validate_action_overlap_and_bounds(env_4_2):
    # reference test_env.py:44-77
    s = reset(env_4_2, key())
    s, *_ = do(env_4_2, s, 0, 0)
    # overlap -> invalid: step ends episode with 0 reward
    s2, r, done, _ = do(env_4_2, s, 1, 1)
    assert bool(done) and float(r) == 0.0
    np.testing.assert_array_equal(np.asarray(s2.grid), np.asarray(s.grid))
    # out of bounds -> invalid
    _, r, done, _ = do(env_4_2, s, 4, 4)
    assert bool(done) and float(r) == 0.0
    # legal placement -> reward 1
    _, r, done, _ = do(env_4_2, s, 2, 2)
    assert float(r) == 1.0


def test_action_mask_reset_and_origin(env_5_2):
    # reference test_env.py:80-107
    s = reset(env_5_2, key())
    before = np.array([
        [1, 1, 1, 1, 0],
        [1, 1, 1, 1, 0],
        [1, 1, 1, 1, 0],
        [1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(s.action_mask[0]), before)
    s, *_ = do(env_5_2, s, 0, 0)
    after = np.array([
        [0, 0, 1, 1, 0],
        [0, 0, 1, 1, 0],
        [1, 1, 1, 1, 0],
        [1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(s.action_mask[0]), after)


def test_action_mask_left_border(env_5_2):
    # reference test_env.py:110-127
    s = reset(env_5_2, key())
    s, *_ = do(env_5_2, s, 1, 0)
    after = np.array([
        [0, 0, 1, 1, 0],
        [0, 0, 1, 1, 0],
        [0, 0, 1, 1, 0],
        [1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(s.action_mask[0]), after)


def test_action_mask_top_border(env_5_2):
    # reference test_env.py:130-147
    s = reset(env_5_2, key())
    s, *_ = do(env_5_2, s, 0, 2)
    after = np.array([
        [1, 0, 0, 0, 0],
        [1, 0, 0, 0, 0],
        [1, 1, 1, 1, 0],
        [1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(s.action_mask[0]), after)


def test_action_mask_top_left_corner(env_11_10_3):
    # reference test_env.py:150-192
    s = reset(env_11_10_3, key())
    before = np.ones((11, 10))
    before[-2:, :] = 0
    before[:, -2:] = 0
    np.testing.assert_array_equal(np.asarray(s.action_mask[0]), before)
    s, *_ = do(env_11_10_3, s, 1, 1)
    after = before.copy()
    after[0:4, 0:4] = 0
    np.testing.assert_array_equal(np.asarray(s.action_mask[0]), after)


def test_action_mask_middle(env_11_10_3):
    # reference test_env.py:195-221
    s = reset(env_11_10_3, key())
    s, *_ = do(env_11_10_3, s, 3, 3)
    after = np.ones((11, 10))
    after[-2:, :] = 0
    after[:, -2:] = 0
    after[1:6, 1:6] = 0
    np.testing.assert_array_equal(np.asarray(s.action_mask[0]), after)


def test_env_step_valid_actions(env_4_2):
    # reference test_env.py:224-234
    s = reset(env_4_2, key())
    for a in [(0, 0), (0, 2), (2, 0), (2, 2)]:
        s, r, done, _ = do(env_4_2, s, *a)
    assert bool(done)
    obs = observe(env_4_2, s)
    assert float(obs["grid"].sum()) == 16
    assert float(obs["action_mask"].sum()) == 0
    assert obs["grid"].dtype == jnp.float32
    assert obs["action_mask"].shape == (4, 4)


def test_env_reset(env_4_2):
    # reference test_env.py:252-258
    s = reset(env_4_2, key())
    obs = observe(env_4_2, s)
    assert float(obs["grid"].sum()) == 0
    assert float(obs["action_mask"].sum()) == 9


def test_observation_changes(env_11_10_3):
    # reference test_env.py:261-285
    s = reset(env_11_10_3, key())
    o0 = observe(env_11_10_3, s)
    s, *_ = do(env_11_10_3, s, 0, 0)
    o1 = observe(env_11_10_3, s)
    assert not np.array_equal(o0["grid"], o1["grid"])
    assert not np.array_equal(o0["action_mask"], o1["action_mask"])


def test_batched_random_rollout(env_4_2):
    """vmap + jit end-to-end sanity: random legal actions until done."""
    from placement_tpu.env.core import make_batched
    params = env_4_2
    b = 32
    reset_b, step_b, obs_b = make_batched(params)
    states = reset_b(jax.random.split(key(), b))
    rng = jax.random.PRNGKey(1)
    total = jnp.zeros((b,))
    for _ in range(6):
        rng, k = jax.random.split(rng)
        mask = states.action_mask[:, 0].reshape(b, -1)
        logits = jnp.where(mask > 0, 0.0, -jnp.inf)
        flat = jax.random.categorical(k, logits, axis=-1)
        acts = jnp.stack(
            [jnp.zeros((b,), jnp.int32),
             (flat // params.width).astype(jnp.int32),
             (flat % params.width).astype(jnp.int32)], axis=1)
        states, r, done, _ = step_b(states, acts)
        total = total + r
    # every board placed at least the trivially-feasible 2 components
    assert (np.asarray(total) >= 2).all()
