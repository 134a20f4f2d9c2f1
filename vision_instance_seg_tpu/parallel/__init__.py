"""SPMD parallelism: mesh construction, sharding rules, host comm."""

from vision_instance_seg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicated, shard_batch)
