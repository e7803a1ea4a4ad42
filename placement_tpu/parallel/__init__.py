"""Mesh sharding and multi-host scale-out."""

from placement_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_learner,
    initialize_distributed,
)
