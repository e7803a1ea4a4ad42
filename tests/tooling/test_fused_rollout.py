"""Tests for the single-kernel Pallas rollout (ops/fused_rollout.py).

Runs the EXACT kernel the benchmark uses under the Pallas TPU interpreter
(``make_fused_rollout(..., interpret=True)``) so CI exercises it on the CPU
mesh. Three layers:

  1. ``centroid_reward_rows`` (the kernel's reward body, shared as plain
     jnp) must agree with the tested ``routing.terminal_reward``
     (find_reward, dummy_env_rectangular_pin.py:832-975) on real terminal
     pin tables.
  2. Episode accounting must be exact: flagship episodes are provably 5
     legal placements, so done-counts are deterministic.
  3. Episode-reward distribution must agree with the pure-JAX pooled path
     (different PRNG streams, same distribution).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.agent.random_policy import random_action
from placement_tpu.env import core, pooled
from placement_tpu.ops import fused_rollout
from placement_tpu.utils.config import load_experiment

# slow tier: Pallas TPU-interpreter runs
pytestmark = pytest.mark.slow

ENV_PARAMS, _, _ = load_experiment("rectangle_pin")


def _terminal_states(batch, seed=0):
    """Play random legal episodes to completion on the pure-JAX stepper."""
    step_b = jax.jit(jax.vmap(lambda s, a: core.step(ENV_PARAMS, s, a)))
    reset_b = jax.jit(jax.vmap(lambda k: core.reset(ENV_PARAMS, k)))
    states = reset_b(jax.random.split(jax.random.PRNGKey(seed), batch))
    key = jax.random.PRNGKey(seed + 1)
    last_reward = jnp.zeros((batch,))
    for _ in range(5):  # flagship episodes are exactly 5 placements
        key, k = jax.random.split(key)
        actions = random_action(k, ENV_PARAMS, states.action_mask)
        states, reward, done, _ = step_b(states, actions)
        last_reward = jnp.where(done, reward, last_reward)
    assert bool(jnp.all(states.done))
    return states, last_reward


def test_centroid_reward_rows_matches_routing():
    """Kernel reward body == routing.terminal_reward on 64 real terminal
    boards (exact same route construction; f32 tolerance only)."""
    states, reward = _terminal_states(64)
    got = fused_rollout.centroid_reward_rows(
        ENV_PARAMS,
        states.pin_abs_x.astype(jnp.int32),
        states.pin_abs_y.astype(jnp.int32),
        states.pin_net.astype(jnp.int32),
        states.num_pins.reshape(-1, 1).astype(jnp.int32))
    np.testing.assert_allclose(np.asarray(got).ravel(),
                               np.asarray(reward).ravel(),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def fused_run():
    batch, steps = 32, 25
    leaves = fused_rollout.init_leaves(ENV_PARAMS, jax.random.PRNGKey(3),
                                       batch)
    fn = fused_rollout.make_fused_rollout(ENV_PARAMS, batch, steps,
                                          block=batch, interpret=True)
    leaves1, rsum1, dcnt1 = fn(leaves, 1001)
    leaves2, rsum2, dcnt2 = fn(leaves1, 1002)
    return (batch, steps, leaves, (leaves1, rsum1, dcnt1),
            (leaves2, rsum2, dcnt2))


def test_fused_episode_accounting(fused_run):
    batch, steps, _, (leaves1, _, dcnt1), (leaves2, _, dcnt2) = fused_run
    # 25 steps = 5 full episodes per board
    assert int(dcnt1) == batch * (steps // 5)
    assert int(dcnt2) == batch * (steps // 5)
    # all boards sit at a fresh episode boundary: empty grid, cursor 0
    for leaves in (leaves1, leaves2):
        assert np.asarray(leaves["grid"]).sum() == 0
        assert (np.asarray(leaves["cursor"]) == 0).all()
        assert (np.asarray(leaves["num_components"]) == 5).all()
        # masks are the fresh-board masks: full interior free
        assert np.asarray(leaves["plane0"]).sum() > 0


def test_fused_state_invariants_midepisode():
    """After a non-multiple-of-5 step count every board is mid-episode with
    cursor == steps % 5 and 4*cursor occupied cells."""
    batch, steps = 16, 7
    leaves = fused_rollout.init_leaves(ENV_PARAMS, jax.random.PRNGKey(5),
                                       batch)
    fn = fused_rollout.make_fused_rollout(ENV_PARAMS, batch, steps,
                                          block=batch, interpret=True)
    out, _, dcnt = fn(leaves, 77)
    assert int(dcnt) == batch  # one reset per board (at step 5)
    assert (np.asarray(out["cursor"]) == steps % 5).all()
    assert (np.asarray(out["grid"]).sum(axis=1) == 4 * (steps % 5)).all()
    # placed components' pins have absolute positions on-board
    pax = np.asarray(out["pin_abs_x"])
    pcomp = np.asarray(out["pin_comp"])
    placed_pins = (pcomp >= 0) & (pcomp < steps % 5)
    assert (pax[placed_pins] >= 0).all()
    assert (pax[placed_pins] < ENV_PARAMS.height).all()


def test_fused_kernel_beam_both_reward():
    """The kernel with reward_type='both' (the reference default,
    dummy_env_rectangular_pin.py:412) runs under the interpreter and its
    mean episode reward agrees with the pure-JAX pooled path on the same
    config (independent PRNG streams)."""
    import dataclasses
    params = dataclasses.replace(ENV_PARAMS, reward_type="both")
    assert fused_rollout.supports(params)
    batch, steps = 32, 25
    leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(13), batch)
    fn = fused_rollout.make_fused_rollout(params, batch, steps,
                                          block=batch, interpret=True)
    _, rsum, dcnt = fn(leaves, 4242)
    assert int(dcnt) == batch * (steps // 5)
    fused_mean = float(rsum) / int(dcnt)

    chunk = jax.jit(pooled.rollout_chunk(params, random_action,
                                         2 * steps, 2 * steps // 5 + 2))
    reset_b = jax.jit(jax.vmap(lambda k: core.reset(params, k)))
    states = reset_b(jax.random.split(jax.random.PRNGKey(14), 64))
    _, _, r, d, wrapped = chunk(states, jax.random.PRNGKey(15))
    assert int(wrapped) == 0
    pooled_mean = float(r) / int(d)
    # ~160 episodes fused vs ~640 pooled; episode-reward std ~0.35
    assert abs(fused_mean - pooled_mean) < 0.15, (fused_mean, pooled_mean)


def test_fused_kernel_pin_spatial_variant():
    """The spatial variant runs the same kernel (identical dynamics/reward;
    observations are not materialized on the rollout path): exact episode
    accounting and reward distribution agreement with the pooled path on
    the flagship spatial config."""
    from placement_tpu.utils.config import load_experiment as _load
    params, _, _ = _load("rectangle_spatial_pin")
    assert fused_rollout.supports(params)
    batch, steps = 32, 25
    leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(21), batch)
    fn = fused_rollout.make_fused_rollout(params, batch, steps,
                                          block=batch, interpret=True)
    _, rsum, dcnt = fn(leaves, 555)
    assert int(dcnt) == batch * (steps // 5)
    fused_mean = float(rsum) / int(dcnt)

    chunk = jax.jit(pooled.rollout_chunk(params, random_action,
                                         2 * steps, 2 * steps // 5 + 2))
    reset_b = jax.jit(jax.vmap(lambda k: core.reset(params, k)))
    states = reset_b(jax.random.split(jax.random.PRNGKey(22), 64))
    _, _, r, d, wrapped = chunk(states, jax.random.PRNGKey(23))
    assert int(wrapped) == 0
    pooled_mean = float(r) / int(d)
    assert abs(fused_mean - pooled_mean) < 0.15, (fused_mean, pooled_mean)


def test_envelope_accepts_validated_configs():
    """Every shipped pin config sits inside the fused-kernel envelope with
    headroom (flagship + parity-harness geometry)."""
    import dataclasses
    ok, reasons = fused_rollout.envelope_report(ENV_PARAMS)
    assert ok, reasons
    # the parity-fixture geometry (tools/record_reference.py pin_kw)
    parity = dataclasses.replace(
        ENV_PARAMS, min_component_h=1, max_component_h=3,
        min_component_w=2, max_component_w=3,
        min_num_components=3, max_num_components=6,
        min_num_nets=2, max_num_nets=4,
        min_num_pins_per_net=2, max_num_pins_per_net=5,
        reward_type="both")
    ok, reasons = fused_rollout.envelope_report(parity)
    assert ok, reasons


def test_envelope_rejects_webapp_max_config():
    """The web app's maximum slider config (30x30 grid, 40 components,
    10 nets x 10 pins) is far outside the envelope: supports() must answer
    False and make_fused_rollout must raise a clean ValueError naming the
    violated limits — never a Mosaic trace/compile error."""
    import dataclasses
    big = dataclasses.replace(
        ENV_PARAMS, height=30, width=30,
        min_component_h=1, max_component_h=5,
        min_component_w=1, max_component_w=5,
        min_num_components=10, max_num_components=40,
        min_num_nets=2, max_num_nets=10,
        min_num_pins_per_net=2, max_num_pins_per_net=10)
    assert not fused_rollout.supports(big)
    ok, reasons = fused_rollout.envelope_report(big)
    assert not ok
    joined = " ".join(reasons)
    assert "area" in joined and "components" in joined and "pins" in joined
    with pytest.raises(ValueError, match="envelope"):
        fused_rollout.make_fused_rollout(big, 128, 10)
    # the pooled fallback covers the same config (tiny smoke)
    chunk = jax.jit(pooled.rollout_chunk(big, random_action, 3, 2))
    states = jax.jit(jax.vmap(lambda k: core.reset(big, k)))(
        jax.random.split(jax.random.PRNGKey(0), 4))
    _, _, r, d, _ = chunk(states, jax.random.PRNGKey(1))
    assert np.isfinite(float(r))


def test_envelope_rejects_each_axis():
    """Each envelope axis triggers independently with a named reason."""
    import dataclasses
    cases = {
        "area": dict(height=13, width=13),
        "components": dict(max_num_components=9),
        "pins": dict(max_num_nets=5, max_num_pins_per_net=10,
                     min_num_pins_per_net=2),
        "pins_per_component": dict(max_component_h=5, max_component_w=5),
        "beam_width": dict(reward_type="beam", reward_beam_width=5,
                           min_num_pins_per_net=5),
    }
    for axis, overrides in cases.items():
        p = dataclasses.replace(ENV_PARAMS, **overrides)
        ok, reasons = fused_rollout.envelope_report(p)
        assert not ok and any(r.startswith(axis + "=") for r in reasons), (
            axis, reasons)


def test_fused_reward_distribution_matches_pooled(fused_run):
    """Mean episode reward of the fused kernel agrees with the pure-JAX
    pooled path within sampling error (independent PRNG streams)."""
    batch, steps, leaves0, (l1, rsum1, dcnt1), (l2, rsum2, dcnt2) = fused_run
    fused_mean = (float(rsum1) + float(rsum2)) / (int(dcnt1) + int(dcnt2))

    chunk = jax.jit(pooled.rollout_chunk(ENV_PARAMS, random_action,
                                         2 * steps, 2 * steps // 5 + 2))
    reset_b = jax.jit(jax.vmap(lambda k: core.reset(ENV_PARAMS, k)))
    states = reset_b(jax.random.split(jax.random.PRNGKey(9), 64))
    _, _, r, d, wrapped = chunk(states, jax.random.PRNGKey(10))
    assert int(wrapped) == 0
    pooled_mean = float(r) / int(d)

    # ~320 episodes per side; episode-reward std is ~0.35 on this config
    assert abs(fused_mean - pooled_mean) < 0.12, (fused_mean, pooled_mean)


def test_interpreter_matches_hardware_goldens():
    """CI anchored to the chip: the interpreter kernel must reproduce the
    hardware-measured reward sums committed by tools/validate_fused_hw.py
    (experiments/results/fused_hw_validation.json; batch=128, 25 steps,
    seed 1234, init key 7). The in-kernel counter-hash PRNG is platform-
    identical, so centroid — integer coordinates, exact crossing predicate
    — matches BIT-EXACTLY; beam/'both' involve an f32 centroid division
    whose last-bit rounding differs between Mosaic and the interpreter,
    measured |delta| = 0.167 over ~640 episodes (0.02%). A kernel edit
    that shifts these values beyond tolerance must be revalidated on
    hardware before updating the artifact."""
    import dataclasses
    import json
    import pathlib
    art = (pathlib.Path(__file__).resolve().parents[2] / "experiments"
           / "results" / "fused_hw_validation.json")
    hw = json.loads(art.read_text())
    assert hw["ok"]
    for rt, exact in (("centroid", True), ("beam", False), ("both", False)):
        params = dataclasses.replace(ENV_PARAMS, reward_type=rt)
        leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(7),
                                           128)
        fn = fused_rollout.make_fused_rollout(params, 128, 25, block=128,
                                              interpret=True)
        _, rsum, dcnt = fn(leaves, 1234)
        assert int(dcnt) == hw[rt]["episodes"], rt
        got = float(rsum)
        want = hw[rt]["reward_sum"]
        tol = 5e-4 if exact else 0.5
        assert abs(got - want) <= tol, (rt, got, want)
    # SQUARE/RECT reduced kernels: dense integer rewards -> bit-exact
    for name, steps in (("square", 60), ("rectangle", 30)):
        params, _, _ = load_experiment(name)
        leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(7),
                                           128)
        fn = fused_rollout.make_fused_rollout(params, 128, steps, block=128,
                                              interpret=True)
        _, rsum, dcnt = fn(leaves, 1234)
        assert int(dcnt) == hw[name]["episodes"], name
        assert float(rsum) == hw[name]["reward_sum"], name


# ---------------------------------------------------------------------------
# SQUARE / RECT variants in the fused kernel (round 4): dense +1 reward,
# 1/2-orientation sampling, pin machinery skipped at trace time.
# ---------------------------------------------------------------------------

def _pooled_mean_reward(params, batch, steps, pool, seed):
    chunk = jax.jit(pooled.rollout_chunk(params, random_action, steps, pool))
    reset_b = jax.jit(jax.vmap(lambda k: core.reset(params, k)))
    states = reset_b(jax.random.split(jax.random.PRNGKey(seed), batch))
    _, _, r, d, _ = chunk(states, jax.random.PRNGKey(seed + 1))
    return float(r) / max(int(d), 1), int(d)


def test_fused_kernel_square_variant():
    """Square env in the kernel: unlimited 2x2 supply, one orientation
    plane, +1 per placement; mean episode reward (= episode length) agrees
    with the pure-JAX pooled path (random baseline ~17.5 on this config,
    experiments/random_policy/run_policy_square.py)."""
    params, _, _ = load_experiment("square")
    assert fused_rollout.supports(params)
    batch, steps = 32, 80
    leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(11), batch)
    fn = fused_rollout.make_fused_rollout(params, batch, steps,
                                          block=batch, interpret=True)
    l1, rsum, dcnt = fn(leaves, 501)
    assert int(dcnt) > batch  # several episodes completed per board
    fused_mean = float(rsum) / int(dcnt)
    pooled_mean, d = _pooled_mean_reward(params, 64, steps, steps // 15 + 2,
                                         21)
    assert d > 64
    # both estimators share the same window-truncation construction;
    # episode-length std ~1.1 on this config
    assert abs(fused_mean - pooled_mean) < 1.0, (fused_mean, pooled_mean)
    # square state invariants: every occupied cell count is a multiple of 4
    cells = np.asarray(l1["grid"]).sum(axis=1)
    assert ((cells % 4) == 0).all()
    assert (np.asarray(l1["num_pins"]) == 0).all()


def test_fused_kernel_rect_variant():
    """Rect env in the kernel: sampled component lists (C=20 > the pin
    envelope's component cap — allowed via the no-pin limit), two
    orientation planes, +1 per placement."""
    params, _, _ = load_experiment("rectangle")
    assert params.max_components > fused_rollout.ENVELOPE["components"]
    assert fused_rollout.supports(params)
    batch, steps = 16, 30
    leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(13), batch)
    fn = fused_rollout.make_fused_rollout(params, batch, steps,
                                          block=batch, interpret=True)
    l1, rsum, dcnt = fn(leaves, 601)
    assert int(dcnt) >= batch
    fused_mean = float(rsum) / int(dcnt)
    pooled_mean, d = _pooled_mean_reward(params, 64, steps, steps // 5 + 2,
                                         23)
    assert d > 64
    assert abs(fused_mean - pooled_mean) < 0.8, (fused_mean, pooled_mean)
    assert (np.asarray(l1["num_pins"]) == 0).all()
    # placed area on the grid equals the painted components' area
    cur = np.asarray(l1["cursor"]).ravel()
    ch = np.asarray(l1["comp_h"])
    cw = np.asarray(l1["comp_w"])
    cells = np.asarray(l1["grid"]).sum(axis=1)
    for b in range(batch):
        expect = sum(int(ch[b, i]) * int(cw[b, i]) for i in range(cur[b]))
        assert cells[b] == expect, (b, cells[b], expect)
