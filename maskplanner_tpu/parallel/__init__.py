"""Device mesh / sharding utilities (new design surface — the reference is
single-GPU with no distributed layer, SURVEY.md §2.10).

Strategy: single-program ``jit`` over a 1-D ``data`` mesh axis. Batches are
sharded on the leading axis across ICI; parameters/optimizer state are
replicated; XLA inserts the gradient all-reduce. BatchNorm statistics are
computed over the *global* batch automatically (the reduction over a
sharded axis lowers to a psum), giving cross-replica BN without SyncBN
machinery. Multi-slice DP over DCN falls out of the same annotations when
the mesh spans slices.
"""
from .mesh import (make_mesh, shard_batch, replicate, data_sharding,
                   make_multislice_mesh, shard_batch_multislice,
                   multislice_data_sharding)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "make_multislice_mesh", "shard_batch_multislice",
           "multislice_data_sharding"]
