"""Web-app data layer tests (run listing + comparison curves), headless —
the Streamlit pages are thin shells over this module."""

import numpy as np

from placement_tpu.agent.ppo import PPOConfig
from placement_tpu.agent.trainer import Trainer
from placement_tpu.viz.rollout import generate_rollouts
from placement_tpu.webapp.data import (comparison_curves, list_runs,
                                       load_run)

TINY = PPOConfig(num_envs=4, unroll_length=4, minibatch_size=8,
                 num_sgd_iter=2)


def test_list_runs_and_curves(tmp_path):
    root = str(tmp_path)
    t1 = Trainer("rectangle_pin", results_root=root, ppo_config=TINY,
                 run_name="PPO_rectangle_pin_a", use_tensorboard=False)
    r1 = t1.run(num_iterations=2)
    generate_rollouts(t1, state=r1.state, num_samples=1)
    t1.close()
    t2 = Trainer("square", results_root=root, ppo_config=TINY,
                 run_name="PPO_square_b", use_tensorboard=False)
    t2.run(num_iterations=3)
    t2.close()

    runs = list_runs(root)
    assert [r.name for r in runs] == ["PPO_square_b", "PPO_rectangle_pin_a"]
    by_name = {r.name: r for r in runs}
    pin = by_name["PPO_rectangle_pin_a"]
    assert pin.model_type == "rectangle_pin"
    assert pin.num_iterations == 2
    assert pin.has_rollouts
    assert pin.final_reward_mean is not None
    assert pin.input_params  # the 1-row config CSV
    sq = by_name["PPO_square_b"]
    assert sq.num_iterations == 3 and not sq.has_rollouts

    curves = comparison_curves([r.path for r in runs])
    assert set(curves) == {"PPO_square_b", "PPO_rectangle_pin_a"}
    c = curves["PPO_rectangle_pin_a"]
    assert len(c["episode_reward_mean"]) == 2
    assert "custom_metrics/normalized_wirelengths_mean" in c
    np.testing.assert_array_equal(c["training_iteration"], [1.0, 2.0])


def test_list_runs_empty(tmp_path):
    assert list_runs(str(tmp_path)) == []
