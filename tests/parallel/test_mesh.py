"""Multi-device mesh tests on the 8-device virtual CPU mesh (conftest.py).

Covers what the driver's dryrun validates, in-repo: a data-parallel Mesh
over all 8 devices, the full PPO train step jitted over it with the
production shardings (boards on ``dp``, replicated params, psum-reduced
metrics/grads), env-batch sharding round-trips, and the
``__graft_entry__.dryrun_multichip`` path itself.
"""

import sys
import pathlib

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from placement_tpu.agent.policy import Policy, model_config_for
from placement_tpu.agent.ppo import PPOConfig, PPOLearner
from placement_tpu.env import EnvParams, Variant, core
from placement_tpu.parallel import mesh as pmesh

PIN = EnvParams(variant=Variant.PIN, height=6, width=6,
                min_component_w=2, max_component_w=3,
                min_component_h=2, max_component_h=3,
                max_num_components=3, min_num_components=2,
                min_num_nets=2, max_num_nets=2,
                min_num_pins_per_net=2, max_num_pins_per_net=3,
                reward_type="centroid")

CFG = PPOConfig(num_envs=16, unroll_length=8, minibatch_size=16,
                num_sgd_iter=2)


def _learner():
    pol = Policy(PIN, model_config_for(PIN, "rectangle_pin"))
    return PPOLearner(PIN, pol, CFG)


def test_make_mesh_spans_devices():
    mesh = pmesh.make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == (pmesh.DATA_AXIS,)


def test_env_batch_sharding_roundtrip():
    mesh = pmesh.make_mesh(8)
    reset_b = jax.jit(jax.vmap(lambda k: core.reset(PIN, k)))
    states = reset_b(jax.random.split(jax.random.PRNGKey(0), 16))
    host = jax.tree_util.tree_map(np.asarray, states)

    sharded = pmesh.shard_env_batch(mesh, states)
    grid_sharding = sharded.grid.sharding
    assert grid_sharding.is_equivalent_to(
        NamedSharding(mesh, P(pmesh.DATA_AXIS)), sharded.grid.ndim)
    # values untouched by the relayout
    np.testing.assert_array_equal(np.asarray(sharded.grid), host.grid)

    # a vmapped step runs on the sharded batch and keeps the layout
    step_b = jax.jit(jax.vmap(lambda s, a: core.step_autoreset(PIN, s, a)))
    from placement_tpu.agent.random_policy import random_action
    actions = random_action(jax.random.PRNGKey(1), PIN, sharded.action_mask)
    out, reward, done, _ = step_b(sharded, actions)
    assert out.grid.sharding.is_equivalent_to(
        NamedSharding(mesh, P(pmesh.DATA_AXIS)), out.grid.ndim)
    assert np.isfinite(np.asarray(reward)).all()


def test_sharded_train_step_matches_unsharded():
    """The dp-sharded train step computes the same metrics as the
    single-device step from the same initial state (f32 reduction-order
    tolerance only)."""
    learner = _learner()
    state = learner.init(jax.random.PRNGKey(42))

    # unsharded baseline
    base_step = jax.jit(learner.train_step)
    _, base_metrics = base_step(state)

    mesh = pmesh.make_mesh(8)
    place, train_step = pmesh.shard_learner(learner, mesh)
    sharded_state = place(learner.init(jax.random.PRNGKey(42)))
    assert sharded_state.env_states.grid.sharding.is_equivalent_to(
        NamedSharding(mesh, P(pmesh.DATA_AXIS)),
        sharded_state.env_states.grid.ndim)
    new_state, metrics = train_step(sharded_state)

    for k in ("episode_reward_mean", "episodes_this_iter", "policy_loss",
              "vf_loss", "kl", "normalized_wirelengths_mean"):
        np.testing.assert_allclose(
            np.asarray(metrics[k]), np.asarray(base_metrics[k]),
            rtol=2e-3, atol=1e-5, err_msg=k)

    # a second step still runs (state pytree keeps consistent shardings)
    _, metrics2 = train_step(new_state)
    assert np.isfinite(float(metrics2["policy_loss"]))


def test_dryrun_multichip_entrypoint():
    """The driver's multichip dryrun must never regress silently."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_trainer_with_mesh_and_profiler(tmp_path):
    """The Trainer's mesh + profiling wiring (experiments/ppo.py
    --data-parallel / --profile-dir): 2 iterations on the 8-device mesh
    produce finite metrics, and the jax.profiler trace lands on disk."""
    from placement_tpu.agent.trainer import Trainer

    mesh = pmesh.make_mesh(8)
    trainer = Trainer(
        "rectangle_pin",
        results_root=str(tmp_path),
        ppo_config=PPOConfig(num_envs=16, unroll_length=8,
                             minibatch_size=16, num_sgd_iter=2),
        env_overrides=dict(height=6, width=6,
                           min_component_w=2, max_component_w=3,
                           min_component_h=2, max_component_h=3,
                           max_num_components=3, min_num_components=2,
                           min_num_nets=2, max_num_nets=2,
                           min_num_pins_per_net=2, max_num_pins_per_net=3,
                           reward_type="centroid"),
        use_tensorboard=False,
        mesh=mesh,
        profile_dir=str(tmp_path / "trace"))
    rows = []
    trainer.run(num_iterations=3, seed=0,
                on_iteration=lambda it, row: rows.append(row))
    trainer.close()
    assert len(rows) == 3
    assert np.isfinite(rows[-1]["episode_reward_mean"])
    trace_files = list((tmp_path / "trace").rglob("*"))
    assert any(f.is_file() for f in trace_files), trace_files
