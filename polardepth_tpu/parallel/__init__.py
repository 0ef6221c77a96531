"""Device-mesh parallelism: sharding layouts and collective helpers.

The reference has no distributed support of any kind (single CUDA device,
SURVEY §2.8).  Here scaling is data-parallel-first: a 1-D Mesh('data') with
batches split along the axis and parameters replicated; XLA inserts the
gradient all-reduce (psum over ICI) when the train step is jit-compiled with
these shardings.  Mesh axes beyond 'data' are reserved for future model axes.
"""

from polardepth_tpu.parallel.mesh import (
    create_mesh, batch_sharding, replicated_sharding, shard_batch,
)
