"""Rollout export + board visualization (reference L9:
utils/visualization/csv_utils.py, web_app/visualization_grid.py)."""

from placement_tpu.viz.rollout import (ComponentRecord, PinRecord,
                                       sample_rollout, generate_rollouts,
                                       save_to_file, save_config_to_csv,
                                       load_pickle)
from placement_tpu.viz.grid import render

__all__ = ["ComponentRecord", "PinRecord", "sample_rollout",
           "generate_rollouts", "save_to_file", "save_config_to_csv",
           "load_pickle", "render"]
