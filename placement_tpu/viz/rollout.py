"""Deterministic rollout sampling + export.

The reference's ``sample_rollout`` restores a PPO checkpoint, plays
``num_samples=5`` greedy episodes, and records each episode's component list
and action sequence (``utils/agent/utils.py:188-259``); ``generate_rollouts``
finds the newest run, pickles ``components.pkl``/``actions.pkl``, and writes
the run config to CSV (``:154-185``, ``utils/visualization/csv_utils.py``).

Here episodes are played through the jitted functional stepper; the padded
device arrays are decoded back into small host-side records
(:class:`ComponentRecord`/:class:`PinRecord`) that the renderer and the web
app consume — the only host↔device traffic is one state fetch per step.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from placement_tpu.env import core
from placement_tpu.env.types import EnvParams, EnvState


@dataclasses.dataclass
class PinRecord:
    """Host-side mirror of the reference ``Pin``
    (dummy_env_rectangular_pin.py:13-55)."""

    relative_x: int
    relative_y: int
    pin_id: int
    component_id: int
    net_id: int
    absolute_x: int = -1
    absolute_y: int = -1


@dataclasses.dataclass
class ComponentRecord:
    """Host-side mirror of the reference ``Component``
    (dummy_env_rectangular_pin.py:122-155)."""

    h: int
    w: int
    comp_id: int
    pins: List[PinRecord] = dataclasses.field(default_factory=list)
    position: Tuple[int, int] = (-1, -1)
    orientation: int = 0


def components_from_state(params: EnvParams,
                          state: EnvState) -> List[ComponentRecord]:
    """Decode the padded component/pin tables into reset-time records
    (unrotated relative pin positions, as the reference stores them after
    ``generate_instances``)."""
    get = lambda x: np.asarray(jax.device_get(x))
    n = int(get(state.num_components))
    comp_h, comp_w = get(state.comp_h), get(state.comp_w)
    pin_net, pin_comp = get(state.pin_net), get(state.pin_comp)
    pin_local = get(state.pin_local)
    rel_x0, rel_y0 = get(state.pin_rel_x0), get(state.pin_rel_y0)
    comps = [ComponentRecord(h=int(comp_h[i]), w=int(comp_w[i]), comp_id=i)
             for i in range(n)]
    for p in range(len(pin_net)):
        c = int(pin_comp[p])
        if pin_net[p] >= 0 and 0 <= c < n:
            comps[c].pins.append(PinRecord(
                relative_x=int(rel_x0[p]), relative_y=int(rel_y0[p]),
                pin_id=int(pin_local[p]), component_id=c,
                net_id=int(pin_net[p])))
    return comps


def sample_rollout(params: EnvParams, policy, variables,
                   num_samples: int = 5, seed: int = 0,
                   explore: bool = False,
                   max_steps: Optional[int] = None
                   ) -> Tuple[List[List[ComponentRecord]],
                              List[List[Tuple[int, int, int]]],
                              List[Dict[str, float]]]:
    """Play ``num_samples`` episodes (greedy when ``explore=False``, matching
    ``compute_single_action(..., explore=False)``,
    utils/agent/utils.py:243). Returns per-episode (components, actions,
    terminal info)."""
    reset1 = jax.jit(lambda k: core.reset(params, k))
    obs1 = jax.jit(lambda s: core.observe(params, s))
    step1 = jax.jit(lambda s, a: core.step(params, s, a))

    def act1(variables, obs, key):
        obs_b = jax.tree_util.tree_map(lambda x: x[None], obs)
        a, _, _, _ = policy.act(variables, obs_b, key,
                                deterministic=not explore)
        return a[0]

    act1 = jax.jit(act1)
    limit = max_steps or params.max_components + 1

    key = jax.random.PRNGKey(seed)
    all_components, all_actions, all_infos = [], [], []
    for _ in range(num_samples):
        key, k_env = jax.random.split(key)
        state = reset1(k_env)
        all_components.append(components_from_state(params, state))
        actions: List[Tuple[int, int, int]] = []
        info_out: Dict[str, float] = {}
        for _ in range(limit):
            key, k_act = jax.random.split(key)
            action = act1(variables, obs1(state), k_act)
            a = np.asarray(jax.device_get(action))
            # store un-flattened (orientation, x, y), cf. utils.py:246-253
            actions.append((int(a[0]), int(a[1]), int(a[2])))
            state, reward, done, info = step1(state, action)
            if bool(jax.device_get(done)):
                info_out = {k: float(jax.device_get(v))
                            for k, v in info.items()}
                info_out["reward"] = float(jax.device_get(reward))
                break
        all_actions.append(actions)
        all_infos.append(info_out)
    return all_components, all_actions, all_infos


def save_to_file(dir_path: str, components, actions) -> None:
    """Pickle components/actions for replay
    (utils/visualization/csv_utils.py:11-25)."""
    os.makedirs(dir_path, exist_ok=True)
    with open(os.path.join(dir_path, "components.pkl"), "wb") as f:
        pickle.dump(components, f)
    with open(os.path.join(dir_path, "actions.pkl"), "wb") as f:
        pickle.dump(actions, f)


def load_pickle(dir_path: str) -> Tuple[Optional[dict], Any, Any]:
    """(params, actions, components) loader with missing-file tolerance
    (web_app/visualization_grid.py:13-69)."""
    def _load(name):
        path = os.path.join(dir_path, name)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    params = None
    params_path = os.path.join(dir_path, "params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            params = json.load(f)
    return params, _load("actions.pkl"), _load("components.pkl")


def save_config_to_csv(path: str, env_config: Dict[str, Any],
                       model_config: Dict[str, Any]) -> None:
    """Flatten env+model config into a 1-row CSV
    (utils/visualization/csv_utils.py:28-77)."""
    row = {f"env/{k}": v for k, v in sorted(env_config.items())}
    row.update({f"model/{k}": v for k, v in sorted(model_config.items())})
    import csv
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        w.writeheader()
        w.writerow(row)


def generate_rollouts(trainer, state=None, num_samples: int = 5,
                      seed: int = 0) -> str:
    """Export rollouts for a trained run (utils/agent/utils.py:154-185):
    restore (or reuse) the train state, sample episodes, pickle them and the
    config CSV into the run dir. Returns the run dir."""
    if state is None:
        state = trainer.restore()
    variables = state.variables
    if jax.process_count() > 1:
        # Multi-host: variables are fully-replicated global arrays; pull the
        # local replica to host so the single-process greedy rollout below
        # compiles a purely local program (a lone process computing on a
        # multi-process global array would raise or deadlock).
        variables = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), variables)
    comps, actions, _ = sample_rollout(
        trainer.env_params, trainer.policy, variables,
        num_samples=num_samples, seed=seed)
    save_to_file(trainer.run_dir, comps, actions)
    env_cfg = trainer.raw_config.get("env_config", {})
    model_cfg = trainer.raw_config.get("model", {}).get(
        "custom_model_config", {})
    save_config_to_csv(
        os.path.join(trainer.run_dir, f"{trainer.model_type}.csv"),
        env_cfg, model_cfg)
    return trainer.run_dir
