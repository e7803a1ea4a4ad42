"""Fused-kernel block-size sweep on the real chip (perf exploration).

Times the benchmark configuration (rectangle_pin, 4096 boards, 50-step
chunks) at several Pallas block sizes, raising the scoped-VMEM limit where
the default 16 MB budget is too small. Chained-call timing with a final
host fetch, same discipline as bench.py.

    python tools/bench_block_sweep.py --blocks 128 256 512
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", type=int, nargs="+", default=[128, 256])
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--calls", type=int, default=20)
    p.add_argument("--vmem-mb", type=int, default=64)
    p.add_argument("--type", default="rectangle_pin")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from placement_tpu.ops import fused_rollout
    from placement_tpu.utils.config import load_experiment

    params, _, _ = load_experiment(args.type)
    leaves0 = fused_rollout.init_leaves(params, jax.random.PRNGKey(3),
                                        args.batch)
    out = {}
    for block in args.blocks:
        limit = args.vmem_mb * 2**20 if block > 128 else None
        try:
            t0 = time.perf_counter()
            fn = jax.jit(fused_rollout.make_fused_rollout(
                params, args.batch, args.steps, block=block,
                vmem_limit_bytes=limit))
            leaves, rsum, _ = fn(leaves0, 1)
            float(rsum)
            warm = time.perf_counter() - t0
            racc = jnp.zeros(())
            t0 = time.perf_counter()
            for i in range(args.calls):
                leaves, rsum, _ = fn(leaves, 2 + i)
                racc = racc + rsum
            float(racc)
            dt = time.perf_counter() - t0
            rate = args.batch * args.steps * args.calls / dt
            out[block] = {"steps_per_sec": round(rate),
                          "warmup_s": round(warm, 1),
                          "timed_s": round(dt, 3)}
        except Exception as e:
            out[block] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"[block {block}] {out[block]}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
