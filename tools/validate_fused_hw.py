"""Hardware validation of the fused kernel's beam/'both' reward paths.

CI exercises the kernel only under the Pallas TPU interpreter; Mosaic's
real lowering has known gaps the interpreter doesn't (i1-vector selects —
see ops/fused_routing.py `vis`/`_colsel`). This script compiles and runs
the NON-interpreted kernel on the real backend for every reward type and
checks episode accounting + reward sanity, so the "kernel covers all three
reward types" claim is hardware-verified (ADVICE r2 medium).

    python tools/validate_fused_hw.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from placement_tpu.ops import fused_rollout
    from placement_tpu.utils.config import load_experiment

    base, _, _ = load_experiment("rectangle_pin")
    batch, steps = 128, 25
    out = {"device": str(jax.devices()[0])}
    ok = True
    for rt in ("centroid", "beam", "both"):
        params = dataclasses.replace(base, reward_type=rt)
        t0 = time.perf_counter()
        leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(7),
                                           batch)
        fn = jax.jit(fused_rollout.make_fused_rollout(
            params, batch, steps, block=batch))
        _, rsum, dcnt = fn(leaves, 1234)
        rsum, dcnt = float(rsum), int(dcnt)
        dt = time.perf_counter() - t0
        # flagship episodes are exactly 5 placements; rewards in [-2, 0]
        good = (dcnt == batch * (steps // 5)
                and -2.0 * dcnt <= rsum <= 0.0)
        out[rt] = {"reward_sum": round(rsum, 3), "episodes": dcnt,
                   "mean_reward": round(rsum / max(dcnt, 1), 4),
                   "seconds": round(dt, 1), "ok": good}
        ok = ok and good
        print(f"[{rt}] {out[rt]}", file=sys.stderr, flush=True)

    # SQUARE / RECT reduced kernels (dense +1 reward): reward_sum equals
    # the number of successful placements, so mean episode reward is the
    # mean episode length — anchored against the known random baselines
    # (~17.5 for square 10x10/2x2, ~7 for the rect config).
    for name, steps_v, lo, hi in (("square", 60, 12.0, 25.0),
                                  ("rectangle", 30, 4.0, 11.0)):
        params, _, _ = load_experiment(name)
        t0 = time.perf_counter()
        leaves = fused_rollout.init_leaves(params, jax.random.PRNGKey(7),
                                           batch)
        fn = jax.jit(fused_rollout.make_fused_rollout(
            params, batch, steps_v, block=batch))
        _, rsum, dcnt = fn(leaves, 1234)
        rsum, dcnt = float(rsum), int(dcnt)
        dt = time.perf_counter() - t0
        mean = rsum / max(dcnt, 1)
        good = dcnt > batch // 2 and lo <= mean <= hi
        out[name] = {"reward_sum": round(rsum, 3), "episodes": dcnt,
                     "mean_reward": round(mean, 4),
                     "seconds": round(dt, 1), "ok": good}
        ok = ok and good
        print(f"[{name}] {out[name]}", file=sys.stderr, flush=True)
    out["ok"] = ok
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
