"""Generator fidelity in cap-bound regimes (VERDICT r1 item 6).

The production generator uses vectorized capped multinomials that equal the
reference's samplers only when no cap binds. ``EnvParams.exact_sampling``
switches to sequential samplers reproducing the reference's exact process
(sample_truncated_multinomial, dummy_env_rectangular_pin.py:258-295;
allocate_pins_to_components_for_net:1176-1264). These tests quantify both
against the reference process on a deliberately cap-bound configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np

from placement_tpu.env import EnvParams, Variant, compat, generator
from placement_tpu.env.core import make_jitted

# Cap-bound sampler setting: 6 trials over skewed probs with per-bin cap 3
# means the 0.7-bin saturates ~40% of the time.
PROBS = np.array([0.7, 0.2, 0.1])
TRIALS, CAP, BINS = 6, 3, 3
N_SAMPLES = 4000


def _hist(counts_iter):
    h = {}
    for c in counts_iter:
        key = tuple(int(v) for v in c)
        h[key] = h.get(key, 0) + 1
    return h


def _tvd(h1, h2, n):
    keys = set(h1) | set(h2)
    return 0.5 * sum(abs(h1.get(k, 0) - h2.get(k, 0)) for k in keys) / n


def _reference_hist(seed=0):
    np.random.seed(seed)
    return _hist(compat._truncated_multinomial(BINS, TRIALS, PROBS, CAP)
                 for _ in range(N_SAMPLES))


def _jax_hist(sampler, seed=1):
    probs = jnp.asarray(PROBS, jnp.float32)
    caps = jnp.full((BINS,), CAP, jnp.int32)
    fn = jax.jit(jax.vmap(
        lambda k: sampler(k, TRIALS, probs, caps, TRIALS)))
    out = fn(jax.random.split(jax.random.PRNGKey(seed), N_SAMPLES))
    return _hist(np.asarray(out))


def test_exact_sampler_matches_reference_process():
    """Chi-square: the exact sampler's outcome distribution is statistically
    indistinguishable from the reference's per-trial renormalizing sampler."""
    from scipy import stats
    ref = _reference_hist()
    exact = _jax_hist(generator._capped_multinomial_exact)
    keys = sorted(set(ref) | set(exact))
    table = np.array([[ref.get(k, 0) + 1 for k in keys],
                      [exact.get(k, 0) + 1 for k in keys]])
    _, p, _, _ = stats.chi2_contingency(table)
    assert p > 1e-3, (p, _tvd(ref, exact, N_SAMPLES))
    assert _tvd(ref, exact, N_SAMPLES) < 0.05


def test_fast_sampler_deviation_is_bounded():
    """The vectorized sampler redistributes cap overflow deterministically
    (water-fill) rather than re-drawing, so it deviates where caps bind —
    the deviation must stay bounded so throughput configs remain sane."""
    ref = _reference_hist()
    fast = _jax_hist(generator._capped_multinomial)
    # marginal per-bin means must agree closely even when joint shape differs
    def mean(h):
        tot = np.zeros(BINS)
        for k, c in h.items():
            tot += np.array(k) * c
        return tot / N_SAMPLES
    np.testing.assert_allclose(mean(fast), mean(ref), atol=0.15)
    assert _tvd(ref, fast, N_SAMPLES) < 0.35


CAP_BOUND = EnvParams(
    variant=Variant.PIN, height=10, width=10,
    net_distribution=0,                    # high variance -> skewed nets
    pin_spread=0,                          # start with 1 component per net
    min_component_w=2, max_component_w=2,
    min_component_h=2, max_component_h=2,  # area 4 binds often
    max_num_components=5, min_num_components=5,
    min_num_nets=2, max_num_nets=2,
    min_num_pins_per_net=2, max_num_pins_per_net=8,
    reward_type="centroid", exact_sampling=True)


def test_exact_sampling_reset_invariants():
    reset_j, _, _ = make_jitted(CAP_BOUND)
    min_ppn = CAP_BOUND.min_num_pins_per_net
    max_ppn = CAP_BOUND.max_num_pins_per_net
    for seed in range(30):
        s = reset_j(jax.random.PRNGKey(seed))
        net = np.asarray(s.pin_net)
        comp = np.asarray(s.pin_comp)
        rx, ry = np.asarray(s.pin_rel_x), np.asarray(s.pin_rel_y)
        num_pins = int(s.num_pins)
        valid = net >= 0
        assert valid.sum() == num_pins
        for n in range(int(s.num_nets)):
            assert min_ppn <= (net == n).sum() <= max_ppn
        # component capacity respected + all pin cells distinct per component
        for c in range(int(s.num_components)):
            cells = {(int(a), int(b))
                     for a, b in zip(rx[comp == c], ry[comp == c])}
            assert len(cells) == (comp == c).sum() <= 4


def test_exact_sampling_same_distribution_as_compat_pipeline():
    """Full-pipeline check on the cap-bound config: the per-net pin-count
    histogram of exact_sampling resets matches the reference-process
    (compat) pipeline."""
    import random as pyrandom
    from scipy import stats
    reset_j, _, _ = make_jitted(CAP_BOUND)
    jax_counts = []
    for seed in range(400):
        s = reset_j(jax.random.PRNGKey(seed))
        net = np.asarray(s.pin_net)
        jax_counts.append(tuple(sorted(
            int((net == n).sum()) for n in range(int(s.num_nets)))))
    ref_counts = []
    for seed in range(400):
        np.random.seed(10_000 + seed)
        pyrandom.seed(10_000 + seed)
        inst = compat.generate_pin_instance(CAP_BOUND)
        nets = [q.net_id for q in inst.pins]
        ref_counts.append(tuple(sorted(
            nets.count(n) for n in range(inst.num_nets))))
    hj, hr = _hist(jax_counts), _hist(ref_counts)
    keys = sorted(set(hj) | set(hr))
    table = np.array([[hj.get(k, 0) + 1 for k in keys],
                      [hr.get(k, 0) + 1 for k in keys]])
    _, p, _, _ = stats.chi2_contingency(table)
    assert p > 1e-3, (p, keys, table)


# ---------------------------------------------------------------------------
# Production configs: the exact_sampling=False default is justified per
# config (VERDICT r2 item 7), not by folklore — the fast generator's reset
# distribution must be statistically indistinguishable from the exact
# (reference-process) generator on every shipped pin configuration.
# ---------------------------------------------------------------------------

def _reset_signatures(params, seed, n):
    """Per-reset allocation signature: sorted per-component pin counts +
    per-net pin counts (the only quantities the capped multinomials touch)."""
    import dataclasses
    from placement_tpu.env import core
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    states = jax.jit(jax.vmap(lambda k: core.reset(params, k)))(keys)
    comp = np.asarray(states.pin_comp)
    net = np.asarray(states.pin_net)
    c = params.max_components
    n_nets = params.max_num_nets
    sigs = []
    for b in range(n):
        pc = tuple(sorted(int((comp[b] == i).sum()) for i in range(c)))
        nc = tuple(int((net[b] == i).sum()) for i in range(n_nets))
        sigs.append(pc + nc)
    return _hist(sigs)


def _shipped_pin_params():
    import dataclasses
    from placement_tpu.utils.config import MODEL_TYPES, load_experiment
    uniq = {}
    for mt in sorted(MODEL_TYPES):
        p, _, _ = load_experiment(mt)
        if p.has_pins:
            uniq.setdefault(p, mt)
    return sorted(uniq.items(), key=lambda kv: kv[1])


def test_shipped_configs_fast_sampler_is_faithful():
    import dataclasses
    n = 2048
    configs = _shipped_pin_params()
    assert len(configs) >= 2          # PIN + PIN_SPATIAL flagship geometries
    for params, mt in configs:
        fast = dataclasses.replace(params, exact_sampling=False)
        exact = dataclasses.replace(params, exact_sampling=True)
        h_fast = _reset_signatures(fast, 0, n)
        h_exact = _reset_signatures(exact, 1, n)
        h_exact2 = _reset_signatures(exact, 2, n)
        noise = _tvd(h_exact, h_exact2, n)      # same-distribution floor
        dev = _tvd(h_fast, h_exact, n)
        assert dev <= noise + 0.03, (
            f"{mt}: fast-vs-exact TVD {dev:.4f} exceeds sampling noise "
            f"{noise:.4f} — the fast sampler deviates on a SHIPPED config; "
            f"flip its default to exact_sampling=True or fix the sampler")


# ---------------------------------------------------------------------------
# Override-path guard (VERDICT r3 item 6): user-supplied generation params
# (web-app sliders / Trainer env_overrides) are measured for cap-bound
# sampling deviation, so no silently biased regime is reachable from
# shipped UIs (placement_tpu/env/fidelity.py).
# ---------------------------------------------------------------------------

def test_fidelity_estimator_accepts_shipped_and_probe_configs():
    """The empirical detector's measured conclusion: pipeline-level
    deviation stays within the detection margin on the shipped flagship AND
    on deliberately cap-bound probes (tiny areas, skewed nets, spread-0) —
    clip+waterfill tracks the reference's redraw process closely everywhere
    probed; near saturation both are forced into the same allocations."""
    import dataclasses

    from placement_tpu.env import fidelity

    probes = {
        "flagship": _shipped_pin_params()[0][0],
        "cap_bound": dataclasses.replace(CAP_BOUND, exact_sampling=False),
        "tiny_areas": EnvParams(
            variant=Variant.PIN, height=12, width=12, reward_type="centroid",
            min_component_w=1, max_component_w=2,
            min_component_h=1, max_component_h=2,
            min_num_components=4, max_num_components=10,
            net_distribution=0, pin_spread=0,
            min_num_nets=2, max_num_nets=6,
            min_num_pins_per_net=2, max_num_pins_per_net=10),
        "skewed_nets": EnvParams(
            variant=Variant.PIN, height=12, width=12, reward_type="centroid",
            min_component_w=3, max_component_w=3,
            min_component_h=3, max_component_h=3,
            min_num_components=4, max_num_components=4,
            net_distribution=0, pin_spread=9,
            min_num_nets=6, max_num_nets=6,
            min_num_pins_per_net=2, max_num_pins_per_net=6),
    }
    for name, params in probes.items():
        tvd, noise, deviates = fidelity.deviation_report(params,
                                                         n_samples=1024)
        assert 0.0 <= tvd <= 1.0 and 0.0 <= noise <= 1.0, (name, tvd, noise)
        assert not deviates, (
            f"{name}: measured deviation {tvd:.3f} vs noise {noise:.3f} — "
            f"regression in the fast sampler (was within margin)")


def test_trainer_override_runs_fidelity_guard(tmp_path, monkeypatch):
    """Trainer(env_overrides=...) touching a generation field consults the
    guard; a deviating report surfaces as a UserWarning, a clean one stays
    silent (the web-app Train page constructs Trainer exactly this way,
    web_app/pages/2_Train_new_agent.py)."""
    import warnings

    from placement_tpu.agent.trainer import Trainer
    from placement_tpu.env import fidelity

    calls = []

    def fake_report(params, n_samples=512, seed=0):
        calls.append(params)
        return 0.5, 0.01, True

    monkeypatch.setattr(fidelity, "deviation_report", fake_report)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Trainer("rectangle_pin", results_root=str(tmp_path),
                env_overrides={"max_num_pins_per_net": 6},
                use_tensorboard=False).close()
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, UserWarning)]
    assert calls, "override did not reach the fidelity guard"
    assert any("cap-bound" in m and "exact_sampling=True" in m
               for m in msgs), msgs


def test_trainer_override_guard_silent_on_faithful_config(tmp_path):
    import warnings

    from placement_tpu.agent.trainer import Trainer

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # shipped flagship geometry, one benign override touching a
        # generation field (same value -> same measured-faithful regime)
        Trainer("rectangle_pin", results_root=str(tmp_path),
                env_overrides={"max_num_pins_per_net": 6},
                use_tensorboard=False).close()
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, UserWarning) and "cap-bound" in str(w.message)]
    assert not msgs, msgs


def test_exact_sampling_override_skips_guard(tmp_path, monkeypatch):
    """exact_sampling=True configs never warn (they ARE the reference
    process), even if the estimator would flag the geometry."""
    import warnings

    from placement_tpu.agent.trainer import Trainer
    from placement_tpu.env import fidelity

    monkeypatch.setattr(fidelity, "deviation_report",
                        lambda *a, **k: (0.9, 0.0, True))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Trainer("rectangle_pin", results_root=str(tmp_path),
                env_overrides={"max_num_pins_per_net": 6,
                               "exact_sampling": True},
                use_tensorboard=False).close()
    msgs = [str(w.message) for w in caught if "cap-bound" in str(w.message)]
    assert not msgs, msgs
