"""Run metrics: TensorBoard events + progress.csv (SURVEY §5.5).

The reference gets both for free from Ray Tune (TensorBoard event files and
``progress.csv`` in every run dir) plus a custom callback that injects
``normalized_wirelengths`` / ``num_intersections`` episode metrics
(``utils/agent/callbacks.py:8-42``). Here the env emits those in the jitted
train step's metrics pytree (placement_tpu/agent/ppo.py) and this logger
writes the same two sinks so the comparison tooling
(``web_app/pages/3_…Comparison analysis.py:31-80``) reads identical columns:
``training_iteration``, ``timesteps_total``, ``episode_reward_mean``,
``custom_metrics/normalized_wirelengths_mean``,
``custom_metrics/num_intersections_mean``.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any, Dict

import jax
import numpy as np

# Columns promoted to the "custom_metrics/" namespace for parity with the
# RLlib callback output (utils/agent/callbacks.py:35-42).
_CUSTOM = ("normalized_wirelengths_mean", "num_intersections_mean")


def _scalar(v: Any) -> float:
    return float(np.asarray(jax.device_get(v)))


class MetricsLogger:
    """Writes one row per training iteration to progress.csv + TensorBoard."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        self.logdir = os.path.abspath(logdir)
        os.makedirs(self.logdir, exist_ok=True)
        self._csv_path = os.path.join(self.logdir, "progress.csv")
        self._csv_file = None
        self._csv_writer = None
        self._fieldnames = None
        self._t0 = time.time()
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(self.logdir)
            except Exception:  # pragma: no cover - tensorboardX optional
                self._tb = None

    def _row(self, iteration: int, timesteps_total: int,
             metrics: Dict[str, Any]) -> Dict[str, float]:
        row: Dict[str, float] = {
            "training_iteration": iteration,
            "timesteps_total": timesteps_total,
            "time_total_s": time.time() - self._t0,
        }
        for k, v in metrics.items():
            name = f"custom_metrics/{k}" if k in _CUSTOM else k
            row[name] = _scalar(v)
        return row

    def log(self, iteration: int, timesteps_total: int,
            metrics: Dict[str, Any]) -> Dict[str, float]:
        row = self._row(iteration, timesteps_total, metrics)

        if self._csv_writer is None:
            self._fieldnames = list(row)
            self._csv_file = open(self._csv_path, "w", newline="")
            self._csv_writer = csv.DictWriter(self._csv_file,
                                              fieldnames=self._fieldnames)
            self._csv_writer.writeheader()
        self._csv_writer.writerow({k: row.get(k, "") for k in self._fieldnames})
        self._csv_file.flush()

        if self._tb is not None:
            for k, v in row.items():
                if k != "training_iteration":
                    self._tb.add_scalar(k, v, iteration)
            self._tb.flush()
        return row

    def close(self) -> None:
        if self._csv_file is not None:
            self._csv_file.close()
            self._csv_file = None
            self._csv_writer = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None


class NullMetricsLogger(MetricsLogger):
    """Identical row computation (shared ``_row``), zero file output — used
    by non-primary processes in multi-host runs (only process 0 writes
    progress.csv / TensorBoard; metrics are replicated, so one writer
    suffices and every process's callbacks see identical row keys)."""

    def __init__(self) -> None:
        self._t0 = time.time()
        self._tb = None
        self._csv_file = None
        self._csv_writer = None

    def log(self, iteration: int, timesteps_total: int,
            metrics: Dict[str, Any]) -> Dict[str, float]:
        return self._row(iteration, timesteps_total, metrics)


def read_progress(logdir: str) -> Dict[str, np.ndarray]:
    """Load progress.csv back as column arrays (comparison-page reader)."""
    path = os.path.join(logdir, "progress.csv")
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return {}
    return {k: np.array([float(r[k]) if r[k] != "" else np.nan for r in rows])
            for k in rows[0]}
