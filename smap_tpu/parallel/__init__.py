from smap_tpu.parallel.mesh import (DATA_AXIS, batch_sharding, make_mesh,
                                    replicated, shard_batch)

__all__ = ["DATA_AXIS", "batch_sharding", "make_mesh", "replicated",
           "shard_batch"]
