from mvdetr_tpu.parallel.mesh import make_mesh
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
    "make_mesh",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "replicate_state",
    "replicated",
    "shard_batch",
]
