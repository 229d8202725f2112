"""Mesh parallelism: data-parallel training + view-sharded CT physics
+ spatially-partitioned UNet evaluation."""

from ipdm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    make_sharded_train_step,
                                    make_spatial_sharded_apply,
                                    make_view_sharded_fbp,
                                    make_view_sharded_fp, replicated,
                                    shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "make_sharded_train_step", "make_spatial_sharded_apply",
           "make_view_sharded_fbp", "make_view_sharded_fp"]
