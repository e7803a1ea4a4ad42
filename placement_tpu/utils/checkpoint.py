"""Orbax checkpointing of PPO train state (SURVEY §5.4).

Replaces Ray Tune's checkpointing (``tune.run(..., checkpoint_freq=1,
checkpoint_at_end=True, keep_checkpoints_num=5)``,
``experiments/PPO/PPO.py:43-45``) with an Orbax ``CheckpointManager`` over
the full ``TrainState`` pytree (params, optimizer state, adaptive KL
coefficient, batched env states, PRNG key, step counter), so a restored run
continues bit-identically. On-disk layout mirrors the reference's documented
``checkpoint_00000N/`` directories (``docs/source/usage.rst:284-311``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Keep-N checkpointing of an arbitrary pytree (the TrainState)."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval,
                step_prefix="checkpoint",
                create=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``target`` (e.g. ``learner.init(k)``).

        ``step=None`` restores the latest checkpoint, mirroring
        ``PPO.restore(checkpoint_path)`` (utils/agent/utils.py:218-219).
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          target)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        return list(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def find_latest_run(results_root: str, prefix: str = "") -> str:
    """Newest run directory under ``results_root`` by mtime — the analogue of
    generate_rollouts' newest-``~/ray_results/PPO/*`` lookup
    (utils/agent/utils.py:165-178)."""
    entries = [os.path.join(results_root, d) for d in os.listdir(results_root)
               if d.startswith(prefix)
               and os.path.isdir(os.path.join(results_root, d))]
    if not entries:
        raise FileNotFoundError(
            f"no run directories under {results_root!r} with prefix {prefix!r}")
    return max(entries, key=os.path.getmtime)
