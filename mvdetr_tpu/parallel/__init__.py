from mvdetr_tpu.parallel.mesh import make_mesh
from mvdetr_tpu.parallel.multihost import (
    global_batch_from_local,
    initialize_distributed,
    process_batch_slice,
)
from mvdetr_tpu.parallel.sharding import (
    batch_shardings,
    make_sharded_eval_step,
    make_sharded_train_step,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_shardings",
    "global_batch_from_local",
    "initialize_distributed",
    "make_mesh",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "process_batch_slice",
    "replicate_state",
    "replicated",
    "shard_batch",
]
