"""Parallelism: device mesh, shardings, spatial halo tiling.

The reference is strictly single-device (SURVEY.md §2.7) — this package is
where the TPU rebuild adds data parallelism over a `jax.sharding.Mesh`
(gradient all-reduce compiled to `psum` over ICI by XLA) and spatial
halo-exchange tiling for very large inference frames.
"""

from fast_srgan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
