"""North-star benchmark: env-steps/s/chip, rectangular-pin env, 4096 boards.

Steps the flagship rectangle_pin configuration (configs/
rectangle_pin_model.json: 10x10 grid, five 2x2 components, 3 nets x 6 pins,
centroid reward) under a random legal policy with auto-reset — the batched
equivalent of the reference's random-policy rollout loop
(agent/random/random_policy_rectangular_pin.py:25-59), which is the pure-env
throughput the baseline targets (>= 100k env-steps/s/chip).

Two implementations, best-of reported:
  1. the single-kernel Pallas rollout (ops/fused_rollout.py — action
     sampling, placement, routing reward, and in-kernel instance
     regeneration fused into ONE kernel; ~17.8M steps/s/chip), and
  2. the pure-JAX pooled-auto-reset path with gated terminal routing
     (env/pooled.py; ~557k steps/s/chip) as a fallback if the fused
     path fails fast.

Timing is honest: every chunk's output feeds the next chunk's input and an
accumulated-reward scalar is fetched to the host at the end, so asynchronous
dispatch cannot hide execution.

Wall-clock discipline (round-1 postmortem: BENCH_r01.json timed out; the
round-2 rewrite once timed out again when a single XLA compile of the
batched reset took ~2 min on this platform): no separate reset program is
compiled at all — boards start as all-done dummy states that the first
(untimed) chunk replaces with generated instances — and a SIGALRM watchdog
prints the best result measured so far just before the budget
(BENCH_BUDGET_S, default 400 s) expires, so a completed measurement is
never lost to a slow later phase.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import signal
import sys
import time

T_START = time.monotonic()


def _note(msg):
    """Phase timestamps on stderr (the driver parses stdout only)."""
    print(f"[bench +{time.monotonic() - T_START:.0f}s] {msg}",
          file=sys.stderr, flush=True)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "400"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

BASELINE = 100_000.0  # env-steps/s/chip target (BASELINE.md)
BATCH = 4096
RESULTS = {}


def _remaining():
    return BUDGET_S - (time.monotonic() - T_START)


def _emit_and_exit():
    best = {k: v for k, v in RESULTS.items() if v}
    if not best:
        os._exit(3)  # nothing measured; rc!=0 signals a real failure
    best_name, val = max(best.items(), key=lambda kv: kv[1])
    n_chips = max(len(jax.devices()), 1)
    per_chip = val / n_chips
    # every measured engine, per-chip, in the unit string so both the fused
    # and the pooled numbers are driver-captured (VERDICT r2 item 6)
    all_measured = ", ".join(f"{k}={v / n_chips:.0f}"
                             for k, v in sorted(best.items()))
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": (f"steps/s/chip (rectangle_pin, 4096 boards, auto-reset, "
                 f"best: {best_name}; measured: {all_measured})"),
        "vs_baseline": round(per_chip / BASELINE, 3),
    }), flush=True)
    os._exit(0)


class PhaseTimeout(Exception):
    """A single bench phase exceeded its deadline (raised by SIGALRM)."""


_PHASE_DEADLINE = [None]  # monotonic deadline of the current phase, or None


def _on_alarm(*_):
    """One handler, two levels: past the global budget -> emit best-so-far
    and exit; past a phase deadline -> abandon just that phase.

    The JAX host-sync wait loop checks pending Python signals, so this fires
    even while blocked on `float(scalar)` (verified on the tunneled
    platform: the round-2 rc=3 run was interrupted mid-first-call)."""
    if _remaining() <= 20:
        _emit_and_exit()
    _PHASE_DEADLINE[0] = None   # clear before re-arming: the next alarm is
    _arm_alarm()                # the global budget until a new phase starts
    raise PhaseTimeout()


def _arm_alarm():
    nxt = _remaining() - 15
    if _PHASE_DEADLINE[0] is not None:
        nxt = min(nxt, _PHASE_DEADLINE[0] - time.monotonic())
    signal.alarm(max(int(nxt), 1))


def _phase(seconds):
    """Set the current phase's deadline `seconds` from now."""
    _PHASE_DEADLINE[0] = time.monotonic() + min(seconds, _remaining() - 20)
    _arm_alarm()


def _arm_watchdog():
    signal.signal(signal.SIGALRM, _on_alarm)
    _arm_alarm()


def _dummy_states(env_params, batch):
    """All-done zero states (no generator compile): the first step of any
    auto-reset path replaces every board with a generated instance."""
    from placement_tpu.env import core
    shapes = jax.eval_shape(lambda k: core.reset(env_params, k),
                            jax.random.PRNGKey(0))
    states = jax.tree_util.tree_map(
        lambda s: jnp.zeros((batch,) + s.shape, s.dtype), shapes)
    return states.replace(done=jnp.ones((batch,), bool))


def _throughput(call, state, steps_per_call, budget_frac=0.4):
    """Calibrate with one fetched call, then time as many as fit."""
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
    float(racc)  # forces execution of every chained step
    dt = time.perf_counter() - t0
    return BATCH * steps_per_call * n_calls / dt


def bench_fused(env_params, states):
    from placement_tpu.ops import fused_rollout
    if not fused_rollout.supports(env_params):
        return None
    inner = 50
    leaves = fused_rollout.leaves_from_states(env_params, states)
    # block 256 + raised scoped-VMEM: measured +1.3-5% over 128 for the
    # centroid-reward pin kernel (tools/bench_block_sweep.py + matrix
    # re-measures, round 5); beam/both regress at 256 but bench.py's
    # flagship config is centroid.
    fn = jax.jit(fused_rollout.make_fused_rollout(
        env_params, BATCH, inner, block=256, vmem_limit_bytes=64 * 2**20))

    def call(state, racc):
        leaves, counter = state
        leaves, rsum, _ = fn(leaves, counter)
        return (leaves, counter + 1), racc + rsum

    state = ((leaves, jnp.asarray(1, jnp.int32)))
    state, racc = call(state, jnp.zeros(()))   # warmup + compile + regen
    float(racc)
    return _throughput(call, state, inner)


def bench_pooled(env_params, states):
    from placement_tpu.agent.random_policy import random_action
    from placement_tpu.env import pooled
    inner = 50
    pool_size = inner // 5 + 2
    # route_budget (round 5): flagship episodes are exactly 5 placements,
    # so 4 of 5 steps have zero finishers and skip the terminal routing
    # entirely (pooled.gated_terminal_rewards); the all-done step falls
    # back to the full batch. Values match eager to one f32 ulp.
    chunk = jax.jit(pooled.rollout_chunk(env_params, random_action, inner,
                                         pool_size,
                                         route_budget=BATCH // 4))

    def call(state, racc):
        states, key = state
        states, key, r, _, _ = chunk(states, key)
        return (states, key), racc + r

    state = (states, jax.random.PRNGKey(7))
    state, racc = call(state, jnp.zeros(()))   # warmup + compile + regen
    float(racc)
    return _throughput(call, state, inner)


def main():
    from placement_tpu.utils.config import load_experiment

    _arm_watchdog()
    env_params, _, _ = load_experiment("rectangle_pin")
    states = _dummy_states(env_params, BATCH)

    # Fused Pallas kernel FIRST with nearly the whole budget: it is the
    # headline number (~17.5M steps/s), its compiled artifact DOES persist
    # across processes on this platform (cold ~350 s, warm ~20 s), while
    # the pooled XLA program recompiles every process (~330 s, never
    # cached) — so running pooled first only burned budget (measured both
    # orders on-chip, 2026-08-21).
    _note(f"devices={jax.devices()}; starting fused path")
    _phase(_remaining() - 25)
    try:
        RESULTS["fused_pallas"] = bench_fused(env_params, states)
    except PhaseTimeout:
        _note("fused path timed out")
    except Exception as e:
        _note(f"fused path failed: {type(e).__name__}: {e}")
    _note(f"fused done: {RESULTS.get('fused_pallas')}")

    # Pooled pure-JAX path with whatever budget remains: it is the general
    # fallback engine, so its number should be captured too (its ~330 s
    # uncached compile only fits when the fused artifact was warm). The
    # watchdog guarantees the already-banked fused number is emitted even
    # if this phase runs out the clock.
    if _remaining() > 120:
        _note("starting pooled path")
        _phase(_remaining() - 25)
        try:
            RESULTS["pooled_jax"] = bench_pooled(env_params, states)
        except PhaseTimeout:
            _note("pooled path timed out")
        except Exception as e:
            _note(f"pooled path failed: {type(e).__name__}: {e}")
        _note(f"pooled done: {RESULTS.get('pooled_jax')}")
    _emit_and_exit()


if __name__ == "__main__":
    main()
