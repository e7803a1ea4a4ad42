"""On-device actor-learner (replaces Ray RLlib PPO + TF in the reference)."""

from placement_tpu.agent.ppo import PPOConfig, PPOLearner  # noqa: F401
from placement_tpu.agent.policy import Policy  # noqa: F401
