"""Test configuration: force an 8-device virtual CPU mesh so logic and
sharding tests run deterministically without TPU hardware (the real chip is
exercised by bench.py / __graft_entry__.py instead).

Note: a pytest plugin imports jax before this conftest executes, so
environment variables are too late — ``jax.config.update`` still works
because the backend only initializes on first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: compile cost dominates test wall-clock.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
