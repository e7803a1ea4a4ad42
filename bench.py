"""North-star benchmark: env-steps/s/chip, rectangular-pin env, 4096 boards.

Steps the flagship rectangle_pin configuration (configs/
rectangle_pin_model.json: 10x10 grid, five 2x2 components, 3 nets x 6 pins,
centroid reward) under a random legal policy with auto-reset — the batched
equivalent of the reference's random-policy rollout loop
(agent/random/random_policy_rectangular_pin.py:25-59), which is the pure-env
throughput the baseline targets (>= 100k env-steps/s/chip).

Timing is honest: every step feeds an accumulated-reward scalar that is
fetched to the host at the end, so asynchronous dispatch cannot hide
execution.

Wall-clock discipline (round-1 postmortem: BENCH_r01.json timed out): the
dominant cold-start costs on this platform are XLA compile (~25 s) and the
first execution of the chunk, which blows up super-linearly with the reset
pool size (pool=48: ~90 s first call; pool=12: <2 s). So the chunk is kept
small (50 steps, 12-entry pool) and the number of timed calls adapts to a
wall-clock budget (BENCH_BUDGET_S, default 420 s) so a result always prints.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

BASELINE = 100_000.0  # env-steps/s/chip target (BASELINE.md)


def main():
    from placement_tpu.agent.random_policy import random_action
    from placement_tpu.env import core, pooled
    from placement_tpu.utils.config import load_experiment

    env_params, _, _ = load_experiment("rectangle_pin")
    batch = 4096
    inner = 50           # env steps fused per device call

    # Pooled auto-reset (placement_tpu/env/pooled.py): the chunk draws its
    # own fresh-instance pool inside the timed call, so generation cost is
    # fully included in steady-state throughput. Flagship episodes are 5
    # legal placements, so inner/5 resets per board; +2 wrap headroom.
    pool_size = inner // 5 + 2
    pooled_chunk = pooled.rollout_chunk(env_params, random_action, inner,
                                        pool_size)

    def rollout_chunk(states, key, racc):
        states, key, r, _ = pooled_chunk(states, key)
        return states, key, racc + r

    reset_b = jax.jit(jax.vmap(lambda k: core.reset(env_params, k)))
    chunk = jax.jit(rollout_chunk)

    key = jax.random.PRNGKey(0)
    states = reset_b(jax.random.split(key, batch))
    racc = jnp.zeros(())
    # warmup + compile
    states, key, racc = chunk(states, key, racc)
    float(racc)

    # one measured call to calibrate, then as many as fit the budget
    t0 = time.perf_counter()
    states, key, racc = chunk(states, key, racc)
    float(racc)
    per_call = time.perf_counter() - t0
    remaining = BUDGET_S - (time.monotonic() - T_START)
    n_calls = max(2, min(40, int(remaining * 0.5 / max(per_call, 1e-3))))

    t0 = time.perf_counter()
    for _ in range(n_calls):
        states, key, racc = chunk(states, key, racc)
    float(racc)  # forces execution of every step
    dt = time.perf_counter() - t0

    steps = batch * inner * n_calls
    n_chips = max(len(jax.devices()), 1)
    steps_per_s_per_chip = steps / dt / n_chips
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_s_per_chip, 1),
        "unit": "steps/s/chip (rectangle_pin, 4096 boards, auto-reset)",
        "vs_baseline": round(steps_per_s_per_chip / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
