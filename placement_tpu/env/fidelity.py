"""Empirical sampling-fidelity guard for user-supplied pin configurations.

The production generator (``env/generator.py``) replaces the reference's
per-trial renormalizing capped multinomials (``sample_truncated_multinomial``,
dummy_env_rectangular_pin.py:258-295; the redraw loop of
``allocate_pins_to_components_for_net:1176-1264``) with vectorized
draw-clip-waterfill rounds. The two processes agree exactly whenever no cap
binds, and every SHIPPED config is locked cap-faithful by
``tests/pin_environment/test_generator_fidelity.py`` — but a user-supplied
override (web-app sliders, ``Trainer(env_overrides=...)``) can enter a
cap-bound regime where the fast sampler's allocation distribution deviates,
silently biasing instance sampling.

Whether a config deviates is NOT statically decidable from the parameter
bounds alone: the flagship configs are area-tight (18 pins over 20 cells)
yet measurably faithful, because near-saturation both processes are forced
into almost the same allocation. So this module measures it: a NumPy Monte
Carlo draws the per-reset allocation signature (per-net pin counts + sorted
per-component pin counts — the only quantities the capped samplers touch)
from (a) the reference process (``env/compat.py``, the parity oracle) and
(b) a NumPy emulation of the fast path's distribution, and compares total
variation distance against an exact-vs-exact noise floor. ``Trainer``
consults this when env overrides touch generation fields and warns when the
fast sampler would deviate (see ``check_sampling_fidelity``).
"""

from __future__ import annotations

import functools
import warnings
from typing import Dict, Tuple

import numpy as np

from placement_tpu.env import compat
from placement_tpu.env.types import EnvParams, Variant

#: EnvParams fields that feed the instance generator's capped samplers.
#: Overriding any of these can move a config into a new sampling regime.
GENERATION_FIELDS = frozenset({
    "variant", "height", "width",
    "min_component_w", "max_component_w",
    "min_component_h", "max_component_h",
    "min_num_components", "max_num_components",
    "net_distribution", "pin_spread",
    "min_num_nets", "max_num_nets",
    "min_num_pins_per_net", "max_num_pins_per_net",
})


def _waterfill(amount: int, capacity: np.ndarray) -> np.ndarray:
    before = np.concatenate([[0], np.cumsum(capacity)[:-1]])
    return np.clip(amount - before, 0, capacity)


def _fast_capped_multinomial(rng, n_trials: int, probs: np.ndarray,
                             caps: np.ndarray) -> np.ndarray:
    """Distributional mirror of ``generator._capped_multinomial``: three
    vectorized rounds of clipped draws, then a deterministic water-fill."""
    counts = np.zeros(len(probs), dtype=np.int64)
    for _ in range(3):
        remaining = int(n_trials - counts.sum())
        if remaining <= 0:
            break
        free = caps - counts
        open_ = (free > 0) & (probs > 0)
        if not open_.any():
            break
        p = np.where(open_, probs, 0.0)
        add = rng.multinomial(remaining, p / p.sum())
        counts += np.minimum(add, free)
    counts += _waterfill(int(n_trials - counts.sum()), caps - counts)
    return counts


def _fast_signature(rng, params: EnvParams) -> Tuple[int, ...]:
    """One allocation signature drawn from the FAST path's distribution
    (mirrors generator.generate_instance stage by stage; streams differ,
    distributions match)."""
    num_components = int(rng.integers(params.min_num_components,
                                      params.max_num_components + 1))
    comp_h = rng.integers(params.min_component_h,
                          params.max_component_h + 1, num_components)
    comp_w = rng.integers(params.min_component_w,
                          params.max_component_w + 1, num_components)
    areas = (comp_h * comp_w).astype(np.int64)
    total_area = int(areas.sum())

    num_nets = int(rng.integers(params.min_num_nets, params.max_num_nets + 1))
    num_nets = max(min(num_nets, total_area // 2), 1)
    total_pins = int(rng.integers(params.min_num_pins_per_net * num_nets,
                                  params.max_num_pins_per_net * num_nets + 1))
    total_pins = min(total_pins, total_area)

    # stage 1: pins -> nets (generator._allocate_pins_to_nets)
    min_ppn = params.min_num_pins_per_net
    net_counts = np.full(num_nets, min_ppn, dtype=np.int64)
    extra = total_pins - min_ppn * num_nets
    if params.max_num_pins_per_net > min_ppn and extra > 0:
        samples = rng.normal(1.0 / num_nets,
                             1.0 / (params.net_distribution + 1.0), num_nets)
        probs = np.exp(samples - samples.max())
        probs = probs / probs.sum()
        cap_each = min(params.max_num_pins_per_net - min_ppn, extra)
        caps = np.full(num_nets, cap_each, dtype=np.int64)
        net_counts += _fast_capped_multinomial(rng, extra, probs, caps)

    # stage 2: pins -> components (generator._allocate_pins_to_components)
    if params.variant == Variant.PIN_SPATIAL:
        k0 = (params.pin_spread * num_components) // 10 + 1
    else:
        k0 = max(((params.pin_spread + 1) * num_components) // 10, 1)
    k0 = min(k0, num_components)

    space = areas.copy()
    comp_counts = np.zeros(num_components, dtype=np.int64)
    for n in range(num_nets):
        m = int(net_counts[n])
        order = np.argsort(-space, kind="stable")
        sorted_space = space[order]
        csum = np.cumsum(sorted_space)
        enough = csum >= m
        k = max(k0, int(np.argmax(enough)) + 1 if enough.any()
                else num_components)
        w = np.where(np.arange(num_components) < k,
                     sorted_space.astype(float), 0.0)
        counts = (rng.multinomial(m, w / w.sum()) if w.sum() > 0
                  else np.zeros(num_components, dtype=np.int64))
        counts = np.minimum(counts, sorted_space)
        counts += _waterfill(m - int(counts.sum()), sorted_space - counts)
        space[order] = sorted_space - counts
        comp_counts[order] += counts

    return (tuple(sorted(int(v) for v in comp_counts))
            + tuple(int(v) for v in sorted(net_counts)))


def _exact_signature(params: EnvParams, seed: int) -> Tuple[int, ...]:
    """One allocation signature from the reference process (env/compat.py)."""
    import random as pyrandom
    np.random.seed(seed)
    pyrandom.seed(seed)
    inst = compat.generate_pin_instance(params)
    comps = [q.comp_id for q in inst.pins]
    nets = [q.net_id for q in inst.pins]
    comp_counts = sorted(comps.count(c) for c in range(inst.num_components))
    net_counts = sorted(nets.count(n) for n in range(inst.num_nets))
    return tuple(comp_counts) + tuple(net_counts)


def _hist(sigs) -> Dict[tuple, int]:
    h: Dict[tuple, int] = {}
    for s in sigs:
        h[s] = h.get(s, 0) + 1
    return h


def _tvd(h1: Dict[tuple, int], h2: Dict[tuple, int], n: int) -> float:
    keys = set(h1) | set(h2)
    return 0.5 * sum(abs(h1.get(k, 0) - h2.get(k, 0)) for k in keys) / n


@functools.lru_cache(maxsize=32)
def deviation_report(params: EnvParams, n_samples: int = 512,
                     seed: int = 0) -> "tuple[float, float, bool]":
    """Estimate the fast sampler's allocation deviation for ``params``.

    Returns ``(tvd, noise, deviates)``: total variation distance between the
    fast and exact (reference-process) allocation-signature distributions,
    the exact-vs-exact same-distribution noise floor at the same sample
    count, and whether the deviation exceeds the floor by more than the
    detection margin (0.06 at the default 512 samples — the committed
    shipped-config evidence uses 0.03 at 2048 samples,
    tests/pin_environment/test_generator_fidelity.py).

    Cost: ~1-2 s of host NumPy at the default sample count; results are
    cached per ``EnvParams``. Only meaningful for pin variants.
    """
    if not params.has_pins:
        return 0.0, 0.0, False
    rng = np.random.default_rng(seed)
    fast = _hist(_fast_signature(rng, params) for _ in range(n_samples))
    exact1 = _hist(_exact_signature(params, 50_000 + i)
                   for i in range(n_samples))
    exact2 = _hist(_exact_signature(params, 90_000 + i)
                   for i in range(n_samples))
    noise = _tvd(exact1, exact2, n_samples)
    tvd = _tvd(fast, exact1, n_samples)
    return tvd, noise, tvd > noise + 0.06


def check_sampling_fidelity(params: EnvParams, *, context: str = "config",
                            n_samples: int = 512) -> bool:
    """Warn (``UserWarning`` + return False) when ``params`` sits in a
    cap-bound regime where the fast generator's instance distribution
    measurably deviates from the reference process.

    Callers on user-supplied configuration paths (``Trainer`` with
    ``env_overrides``, the web app's sliders) invoke this so no silently
    biased sampling regime is reachable from shipped UIs; the fix is
    ``exact_sampling=True`` (reference-process sampling via sequential
    per-trial draws), whose cost is measured, not guessed: 1.2-1.3x on a
    full pooled rollout at training scale on the area-tight flagship
    config, ~1.0x at the web-app maximum (``tools/price_exact_sampling.py``
    on the real chip — the sequential trial scans vectorize fine under
    ``vmap``; artifact ``experiments/results/exact_sampling_price.json``).
    """
    if not params.has_pins or params.exact_sampling:
        return True
    tvd, noise, deviates = deviation_report(params, n_samples=n_samples)
    if deviates:
        warnings.warn(
            f"{context}: this environment configuration is cap-bound — the "
            f"fast instance sampler's allocation distribution deviates from "
            f"the reference process (TVD {tvd:.3f} vs sampling-noise floor "
            f"{noise:.3f} over {n_samples} resets). Set exact_sampling=True "
            f"on the environment config to sample with the reference's "
            f"exact process (measured cost: ~1.2-1.3x rollout time at "
            f"training scale, see docs/performance.md), or widen component "
            f"areas / reduce pins per net.", UserWarning, stacklevel=3)
    return not deviates
