"""Record exact-seed reference trajectories into tests/parity/fixtures/.

Runs the four reference environments (/root/reference/environment/*.py —
needs that mount plus scipy; `gym` is shimmed with gymnasium, which is
API-compatible for the spaces the reference constructs) under fixed seeds
with a deterministic legal-action policy, and saves, per variant:

  s{seed}/comp_h, comp_w                      instance component table
  s{seed}/pin_rel_x, pin_rel_y, pin_id, pin_comp, pin_net   (self.pins order)
  s{seed}/mask0                               reset-time action mask
  s{seed}/actions, rewards, dones             the episode
  s{seed}/grid{t}, mask{t}                    post-step grid / action mask
  s{seed}/wirelength, intersections           terminal info (pin variants)
  s{seed}/<obs_key>@reset, <obs_key>@{t}      every non-grid/mask entry of
                                              the obs dict _get_obs emits
                                              (all_components_feature, pin
                                              num/cat features,
                                              component_mask, placement_mask,
                                              pin_grid, component_grid)

The parity suite (tests/parity/) replays these against the JAX stepper and
against env/compat.py. Regenerate with:

    python tools/record_reference.py
"""

import pathlib
import random
import sys

import numpy as np

sys.modules.setdefault("gym", __import__("gymnasium"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests/parity/fixtures"
N_SEEDS = 25


def legal_actions(mask):
    return np.argwhere(mask == 1)


# grid/action_mask are captured separately (grid{t}/mask{t}); everything
# else in the obs dict is recorded verbatim for observation-level parity
# (dummy_env_rectangular_pin.py:1679-1686, ..._pin_spatial.py:1622-1631,
# dummy_env_rectangular.py:344-350).
OBS_SKIP = ("grid", "action_mask")


def record_obs(rec, tag, obs):
    for k, v in obs.items():
        if k not in OBS_SKIP:
            rec[f"{k}@{tag}"] = np.asarray(v)


def record_episode(env, seed, n_dims):
    np.random.seed(seed)
    random.seed(seed)
    obs = env.reset()
    rng = np.random.RandomState(100_000 + seed)  # policy RNG, separate stream

    rec = {"mask_reset": np.asarray(obs["action_mask"], np.int8)}
    record_obs(rec, "reset", obs)
    if hasattr(env, "components"):
        comps = env.components
        rec["comp_h"] = np.array([c.h for c in comps], np.int32)
        rec["comp_w"] = np.array([c.w for c in comps], np.int32)
    if hasattr(env, "pins") and env.pins:
        pins = env.pins
        rec["pin_rel_x"] = np.array([p.relative_x for p in pins], np.int32)
        rec["pin_rel_y"] = np.array([p.relative_y for p in pins], np.int32)
        rec["pin_id"] = np.array([p.pin_id for p in pins], np.int32)
        rec["pin_comp"] = np.array([p.component_id for p in pins], np.int32)
        rec["pin_net"] = np.array([p.net_id for p in pins], np.int32)
        rec["num_nets"] = np.int32(env.num_nets)

    actions, rewards, dones = [], [], []
    t = 0
    done = False
    while not done and t < 200:
        acts = legal_actions(np.asarray(obs["action_mask"]))
        if len(acts) == 0:
            break
        a = acts[rng.randint(len(acts))]
        obs, reward, done, info = env.step(tuple(int(v) for v in a))
        actions.append(np.asarray(a, np.int32))
        rewards.append(np.float64(reward))
        dones.append(bool(done))
        rec[f"grid{t}"] = np.asarray(env.grid, np.int8)
        rec[f"mask{t}"] = np.asarray(env.action_mask, np.int8)
        if hasattr(env, "placement_mask"):
            rec[f"pmask{t}"] = np.asarray(env.placement_mask, np.float32)
        record_obs(rec, t, obs)
        t += 1
    rec["actions"] = np.stack(actions).astype(np.int32).reshape(t, n_dims)
    rec["rewards"] = np.array(rewards, np.float64)
    rec["dones"] = np.array(dones, bool)
    if "wirelength" in (info or {}):
        rec["wirelength"] = np.float64(info["wirelength"])
        rec["intersections"] = np.float64(info["num_intersections"])
    return rec


def main():
    from environment import dummy_env_square as sq
    from environment import dummy_env_rectangular as rc
    from environment import dummy_env_rectangular_pin as rp
    from environment import dummy_env_rectangular_pin_spatial as rps

    OUT.mkdir(parents=True, exist_ok=True)

    pin_kw = dict(height=10, width=10, net_distribution=2, pin_spread=2,
                  min_component_w=2, max_component_w=3,
                  min_component_h=1, max_component_h=3,
                  max_num_components=6, min_num_components=3,
                  min_num_nets=2, max_num_nets=4,
                  max_num_pins_per_net=5, min_num_pins_per_net=2,
                  reward_beam_width=2,
                  weight_wirelength=0.5, weight_num_intersections=0.5)

    jobs = {
        "square": (lambda: sq.DummyPlacementEnv(10, 10, 2), 2),
        "rect": (lambda: rc.DummyPlacementEnv(
            height=10, width=10, min_component_w=1, max_component_w=4,
            min_component_h=1, max_component_h=4,
            max_num_components=8, min_num_components=3), 3),
        # 'both' exercises centroid + beam + tie-break (:951-975)
        "pin": (lambda: rp.DummyPlacementEnv(reward_type="both", **pin_kw), 3),
        "pin_centroid": (lambda: rp.DummyPlacementEnv(
            reward_type="centroid", **pin_kw), 3),
        "pin_spatial": (lambda: rps.DummyPlacementEnv(
            reward_type="both", **pin_kw), 3),
        # pure-beam branch of find_reward (:951-975 beam arm) as its own
        # recorded config — beam code was previously only reached through
        # "both" (VERDICT r3 item 5)
        "pin_beam": (lambda: rp.DummyPlacementEnv(
            reward_type="beam", **pin_kw), 3),
        # non-square grid: h != w exercises every (x, y) / (h, w) axis
        # convention in masks, routing normalizers, and upper bounds
        "pin_nonsquare": (lambda: rp.DummyPlacementEnv(
            reward_type="both", **{**pin_kw, "height": 8, "width": 12}), 3),
        # rotation-heavy: 1xk components make orientation change the
        # footprint maximally and exercise the 4-orientation pin-rotation
        # formulas (Component.place_component:156-204) on degenerate rows
        "pin_rot": (lambda: rp.DummyPlacementEnv(
            reward_type="both",
            **{**pin_kw, "min_component_h": 1, "max_component_h": 1,
               "min_component_w": 2, "max_component_w": 4}), 3),
    }

    for name, (make, n_dims) in jobs.items():
        store = {}
        for seed in range(N_SEEDS):
            env = make()
            rec = record_episode(env, seed, n_dims)
            for k, v in rec.items():
                store[f"s{seed}/{k}"] = v
        path = OUT / f"{name}.npz"
        np.savez_compressed(path, **store)
        print(f"{name}: {N_SEEDS} seeds -> {path} "
              f"({path.stat().st_size // 1024} KiB)")


if __name__ == "__main__":
    main()
