"""Batched pure-functional placement environments (all four variants)."""

from placement_tpu.env.types import EnvParams, EnvState, Variant  # noqa: F401
from placement_tpu.env.core import (  # noqa: F401
    make_batched,
    observe,
    reset,
    step,
    step_autoreset,
)
from placement_tpu.env.gym_api import PlacementEnv, make  # noqa: F401
