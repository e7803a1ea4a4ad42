"""Config, checkpointing, metrics, rendering, and rollout-export utilities."""
