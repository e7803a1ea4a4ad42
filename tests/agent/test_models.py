"""Model-zoo smoke + shape tests: every preset initializes, produces masked
logits (or factorized encodings) and a value, and invalid actions get
-inf-ish logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.agent.policy import Policy, model_config_for
from placement_tpu.env import EnvParams, Variant
from placement_tpu.env.core import make_batched
from placement_tpu.models import MODEL_REGISTRY

SQUARE = EnvParams(variant=Variant.SQUARE, height=6, width=6, component_n=2)
RECT = EnvParams(variant=Variant.RECT, height=6, width=6,
                 min_component_w=2, max_component_w=3,
                 min_component_h=2, max_component_h=3,
                 max_num_components=3, min_num_components=2)
PIN = EnvParams(variant=Variant.PIN, height=6, width=6,
                min_component_w=2, max_component_w=3,
                min_component_h=2, max_component_h=3,
                max_num_components=3, min_num_components=2,
                min_num_nets=2, max_num_nets=2,
                min_num_pins_per_net=2, max_num_pins_per_net=3)
SPATIAL = PIN.replace(variant=Variant.PIN_SPATIAL)

ENV_FOR = {
    "square": SQUARE,
    "rectangle": RECT, "rectangle_factorized": RECT,
    "rectangle_pin": PIN, "rectangle_pin_attn_component": PIN,
    "rectangle_pin_attn_all": PIN, "rectangle_factorized_pin": PIN,
    "rectangle_pin_all_attn_factorized": PIN,
    "rectangle_pin_attn_all_no_grid": PIN,
    "rectangle_spatial_pin": SPATIAL,
}


def batch_obs(params, b=4, seed=0):
    reset_b, _, obs_b = make_batched(params)
    states = reset_b(jax.random.split(jax.random.PRNGKey(seed), b))
    return states, obs_b(states)


@pytest.mark.parametrize("model_type", MODEL_REGISTRY)
def test_model_forward(model_type):
    params = ENV_FOR[model_type]
    cfg = model_config_for(params, model_type)
    pol = Policy(params, cfg)
    states, obs = batch_obs(params)
    variables = pol.init(jax.random.PRNGKey(0), obs)
    act_fn = jax.jit(lambda v, o, k: pol.act(v, o, k))
    action, logp, value, dist_inputs = act_fn(
        variables, obs, jax.random.PRNGKey(1))
    b = 4
    assert action.shape == (b, 3)
    assert logp.shape == (b,) and value.shape == (b,)
    assert np.isfinite(np.asarray(logp)).all()
    # sampled actions are always valid under the mask
    mask = np.asarray(obs["action_mask"])
    a = np.asarray(action)
    for i in range(b):
        if params.variant == Variant.SQUARE:
            assert mask[i, a[i, 1], a[i, 2]] == 1
        else:
            assert mask[i, a[i, 0], a[i, 1], a[i, 2]] == 1


@pytest.mark.parametrize("model_type", ["rectangle_pin",
                                        "rectangle_factorized_pin"])
def test_evaluate(model_type):
    params = ENV_FOR[model_type]
    cfg = model_config_for(params, model_type)
    pol = Policy(params, cfg)
    states, obs = batch_obs(params)
    variables = pol.init(jax.random.PRNGKey(0), obs)
    action, logp, value, dist_inputs = jax.jit(
        lambda v, o, k: pol.act(v, o, k))(variables, obs,
                                          jax.random.PRNGKey(1))
    ev = jax.jit(lambda v, o, a, d, k: pol.evaluate(v, o, a, d, k))
    logp2, entropy, value2, kl, updates = ev(
        variables, obs, action, dist_inputs, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2),
                               rtol=2e-4, atol=2e-5)
    # KL of a distribution against itself is ~0
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-4)
    assert np.isfinite(np.asarray(entropy)).all()


def test_factorization_coordinates():
    params = PIN
    cfg = model_config_for(params, "rectangle_factorized_pin",
                           factorization="coordinates")
    pol = Policy(params, cfg)
    states, obs = batch_obs(params)
    variables = pol.init(jax.random.PRNGKey(0), obs)
    action, logp, value, enc = jax.jit(
        lambda v, o, k: pol.act(v, o, k))(variables, obs,
                                          jax.random.PRNGKey(1))
    mask = np.asarray(obs["action_mask"])
    a = np.asarray(action)
    for i in range(a.shape[0]):
        assert mask[i, a[i, 0], a[i, 1], a[i, 2]] == 1
