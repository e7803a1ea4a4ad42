"""Per-configuration throughput matrix on the real chip (VERDICT r3 item 2).

``bench.py`` proves the headline number on ONE configuration
(``rectangle_pin``, centroid reward, fused kernel). This tool measures
env-steps/s/chip for every env variant and reward type the framework ships,
plus one deliberately out-of-envelope configuration (the web app's slider
maximum: 30x30 grid, 40 components, 10 nets x 10 pins/net,
``web_app/pages/2_Train_new_agent.py:29-44``) where ``fused_rollout
.supports()`` returns False and the pooled pure-JAX path is the only
engine — proving the fallback story instead of asserting it.

Methodology matches bench.py (the batched equivalent of the reference's
random-policy loop, ``agent/random/random_policy_rectangular_pin.py:25-59``):
random legal policy, auto-reset, chained chunks whose outputs feed the next
chunk's inputs, a data-dependent scalar fetched at the end so asynchronous
dispatch cannot hide execution, and a SIGALRM watchdog that bails out of a
phase without losing rows already measured. Rows are flushed to the output
JSON after EVERY config, so a crashed/timed-out run keeps its completed
measurements — rerun the tool to fill in the rest (measured rows are
skipped unless --force).

    python tools/bench_matrix.py                  # all missing rows
    python tools/bench_matrix.py --configs square rect

The committed artifact ``experiments/results/throughput_matrix.json`` is
regression-read by tests/tooling/test_perf_artifacts.py and rendered as the
per-config table in docs/performance.md.
"""

import argparse
import json
import os
import pathlib
import signal
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "520"))
OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "experiments/results/throughput_matrix.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

BASELINE = 100_000.0
BATCH = 4096


def _note(msg):
    print(f"[matrix +{time.monotonic() - T_START:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _remaining():
    return BUDGET_S - (time.monotonic() - T_START)


class PhaseTimeout(Exception):
    pass


def _on_alarm(*_):
    raise PhaseTimeout()


def _phase(seconds):
    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(max(int(min(seconds, _remaining())), 1))


def _configs():
    """name -> (EnvParams, reference anchor note). Built lazily so the tool
    imports fast."""
    from placement_tpu.utils.config import load_experiment

    square, _, _ = load_experiment("square")
    rect, _, _ = load_experiment("rectangle")
    pin, _, _ = load_experiment("rectangle_pin")
    spatial, _, _ = load_experiment("rectangle_spatial_pin")
    web_max = spatial.replace(
        height=30, width=30,
        min_component_h=2, max_component_h=5,
        min_component_w=2, max_component_w=5,
        min_num_components=40, max_num_components=40,
        min_num_nets=10, max_num_nets=10,
        min_num_pins_per_net=2, max_num_pins_per_net=10).validate()
    return {
        "square": (square, "dummy_env_square.py"),
        "rect": (rect, "dummy_env_rectangular.py"),
        "pin_centroid": (pin, "rectangle_pin config (bench.py headline)"),
        "pin_beam": (pin.replace(reward_type="beam"),
                     "find_reward beam arm :951-975"),
        "pin_both": (pin.replace(reward_type="both"),
                     "find_reward 'both' arm :951-975"),
        "spatial": (spatial, "rectangle_spatial_pin config"),
        "web_max_pooled": (web_max,
                           "web-app slider maximum — outside the fused "
                           "envelope; pooled path only"),
    }


# Pooled-path tuning (round 5). The web-app-max row measured 66.5k steps/s
# at the r4 defaults (inner=10, pool_size=4); the committed profile
# (experiments/results/pooled_profile_web_max.json) shows why: pool
# generation was 431ms of the 617ms chunk (a 4-deep pool regenerated every
# 10 steps against ~40-step episodes) and the per-step discarded terminal
# routing another ~104ms. Episodes run one step per component (~40), so a
# 50-step chunk with a 2-deep pool right-sizes generation (8192 fresh
# boards per 204k board-steps — ~60% headroom over expected consumption,
# wrap counter checked), and route_budget gates the O(P^2) routing to
# boards that actually finish (pooled.gated_terminal_rewards).
# batch=1024 for the big-board row: the 30x30 state working set at 4096
# boards overruns on-chip locality (measured 351k @1024 / 337k @2048 /
# 258k @4096 in one session); steps/s/chip is batch-agnostic so the row
# records its best honest configuration, batch included.
POOLED_TUNING = {
    "web_max_pooled": dict(inner=50, pool_size=2, slice_size=2,
                           route_budget=64, batch=1024),
}

# Fused-kernel tuning (round 5, tools/bench_block_sweep.py + matrix
# re-measures on chip): the reduced square/rect kernels gain from bigger
# Pallas blocks (square 52.7M@128 -> 66.2M@256; rect 27.8M@128 ->
# 29.1M@512; blocks > 128 need the raised scoped-VMEM limit); the
# centroid-reward pin kernels gain ~1.3% at 256. The beam/"both" kernels
# REGRESS hard at 256 (beam 6.46M@128 -> 4.04M@256, both 5.25M -> 3.71M
# — the beam rounds' lane-padded frontier work scales with block) and
# keep 128.
FUSED_TUNING = {
    "square": dict(block=256, vmem_mb=64),
    "rect": dict(block=512, vmem_mb=64),
    "pin_centroid": dict(block=256, vmem_mb=64),
    "spatial": dict(block=256, vmem_mb=64),
}


def _dummy_states(env_params, batch):
    from placement_tpu.env import core
    shapes = jax.eval_shape(lambda k: core.reset(env_params, k),
                            jax.random.PRNGKey(0))
    states = jax.tree_util.tree_map(
        lambda s: jnp.zeros((batch,) + s.shape, s.dtype), shapes)
    return states.replace(done=jnp.ones((batch,), bool))


def _throughput(call, state, steps_per_call, batch, budget_frac=0.3):
    t0 = time.perf_counter()
    state, racc = call(state, jnp.zeros(()))
    float(racc)
    per_call = time.perf_counter() - t0
    n_calls = max(2, min(40, int(max(_remaining(), 5.0) * budget_frac
                                 / max(per_call, 1e-4))))
    racc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, racc = call(state, racc)
    float(racc)
    dt = time.perf_counter() - t0
    return batch * steps_per_call * n_calls / dt


def _bench_fused(env_params, batch, block=128, vmem_mb=None):
    from placement_tpu.ops import fused_rollout
    inner = 50
    leaves = fused_rollout.leaves_from_states(
        env_params, _dummy_states(env_params, batch))
    fn = jax.jit(fused_rollout.make_fused_rollout(
        env_params, batch, inner, block=block,
        vmem_limit_bytes=vmem_mb * 2**20 if vmem_mb else None))

    def call(state, racc):
        leaves, counter = state
        leaves, rsum, _ = fn(leaves, counter)
        return (leaves, counter + 1), racc + rsum

    state = (leaves, jnp.asarray(1, jnp.int32))
    state, racc = call(state, jnp.zeros(()))   # warmup + compile + regen
    float(racc)
    return _throughput(call, state, inner, batch)


def _bench_pooled(env_params, batch, inner=50, pool_size=None,
                  slice_size=4, route_budget=None):
    from placement_tpu.agent.random_policy import random_action
    from placement_tpu.env import pooled
    if pool_size is None:
        pool_size = inner // 5 + 2
    chunk = jax.jit(pooled.rollout_chunk(env_params, random_action, inner,
                                         pool_size, slice_size,
                                         route_budget=route_budget))
    wrap_seen = []

    def call(state, racc):
        states, key = state
        states, key, r, _, wrapped = chunk(states, key)
        wrap_seen.append(wrapped)
        return (states, key), racc + r

    state = (_dummy_states(env_params, batch), jax.random.PRNGKey(7))
    state, racc = call(state, jnp.zeros(()))
    float(racc)
    value = _throughput(call, state, inner, batch)
    # pool reuse would silently bias the sample stream — demand zero wraps
    wraps = int(sum(int(w) for w in wrap_seen))
    if wraps:
        _note(f"WARNING: {wraps} pool wrap(s) — enlarge pool_size")
    return value


def measure(name, env_params, anchor, batch, inner=50, pool_size=None,
            slice_size=4, route_budget=None, block=128, vmem_mb=None):
    from placement_tpu.ops import fused_rollout
    use_fused = fused_rollout.supports(env_params)
    engine = "fused_pallas" if use_fused else "pooled_jax"
    _note(f"{name}: engine={engine}")
    t0 = time.monotonic()
    try:
        if use_fused:
            value = _bench_fused(env_params, batch, block, vmem_mb)
        else:
            value = _bench_pooled(env_params, batch, inner, pool_size,
                                  slice_size, route_budget)
    except PhaseTimeout:
        _note(f"{name}: phase timed out")
        return None
    n_chips = max(len(jax.devices()), 1)
    return {
        "engine": engine,
        "steps_per_sec_per_chip": round(value / n_chips, 1),
        "vs_baseline": round(value / n_chips / BASELINE, 3),
        "batch": batch,
        "variant": int(env_params.variant),
        "reward_type": env_params.reward_type if env_params.has_pins else None,
        "grid": [env_params.height, env_params.width],
        "chunk_steps": inner,
        "measure_seconds": round(time.monotonic() - t0, 1),
        "reference_anchor": anchor,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=None)
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--inner", type=int, default=50,
                   help="steps per pooled chunk. NOTE: the rect config at "
                        "batch 4096 crashes the platform's TPU worker "
                        "(kernel fault) when pool_size*batch exceeds "
                        "~16k pooled instances (4096x{50,25} faults, "
                        "4096x10 and 1024x50 are fine; pin configs run "
                        "4096x50 without issue) — the faulting program "
                        "shape is exactly lax.map over THREE 16384-board "
                        "generator slices (slice sizes 2 and 12 both work "
                        "and produce identical values) — use --slice-size "
                        "2 or --inner 10 for such rows")
    p.add_argument("--slice-size", type=int, default=4,
                   help="make_pool generator slice size (boards per "
                        "lax.map iteration = slice_size*batch)")
    p.add_argument("--force", action="store_true",
                   help="re-measure rows already in the artifact")
    p.add_argument("--out", default=str(OUT))
    args = p.parse_args()

    table = _configs()
    names = args.configs or list(table)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    rows = existing.get("rows", {})

    _note(f"devices={jax.devices()}")
    for name in names:
        if name not in table:
            raise SystemExit(f"unknown config {name!r}; "
                             f"one of {sorted(table)}")
        if name in rows and not args.force:
            _note(f"{name}: already measured "
                  f"({rows[name]['steps_per_sec_per_chip']:.0f}/s) — skip")
            continue
        if _remaining() < 60:
            _note("budget exhausted; rerun to measure remaining rows")
            break
        env_params, anchor = table[name]
        tune = POOLED_TUNING.get(name, {})
        ftune = FUSED_TUNING.get(name, {})
        _phase(_remaining() - 20)
        row = measure(name, env_params, anchor,
                      tune.get("batch", args.batch),
                      inner=tune.get("inner", args.inner),
                      pool_size=tune.get("pool_size"),
                      slice_size=tune.get("slice_size", args.slice_size),
                      route_budget=tune.get("route_budget"),
                      block=ftune.get("block", 128),
                      vmem_mb=ftune.get("vmem_mb"))
        signal.alarm(0)
        if row is not None and tune:
            row["pooled_tuning"] = tune
        if row is not None and ftune:
            row["fused_tuning"] = ftune
        if row is not None:
            rows[name] = row
            payload = {
                "metric": "env_steps_per_sec_per_chip",
                "baseline": BASELINE,
                "device": str(jax.devices()[0]),
                "rows": rows,
            }
            with open(args.out, "w") as f:
                json.dump(payload, f, indent=2)
            _note(f"{name}: {row['steps_per_sec_per_chip']:.0f} steps/s/chip"
                  f" ({row['engine']}) -> {args.out}")
    print(json.dumps({n: r["steps_per_sec_per_chip"]
                      for n, r in rows.items()}), flush=True)


if __name__ == "__main__":
    main()
