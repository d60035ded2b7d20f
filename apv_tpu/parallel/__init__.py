"""Parallelism layer: mesh + shardings (SURVEY.md §2.6).

The workload's one first-class strategy is **data parallelism over ICI**
(the reference is single-device; DP is the north-star-mandated TPU
addition). IWAE evaluation additionally shards the importance-sample axis.
TP/PP/SP/EP are N/A for this model family (SURVEY.md §2.6) — documented,
not built.
"""

from apv_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, stacked_data_sharding, replicated,
    shard_batch_spec)
from apv_tpu.parallel.multihost import (  # noqa: F401
    initialize_from_env, local_rows, put_batch)
