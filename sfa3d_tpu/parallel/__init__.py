"""Parallelism layer: device mesh + sharded train/eval steps.

This is the TPU-native replacement for the reference's entire distributed
stack (SURVEY.md section 2.8): torch DDP/NCCL process groups, DistributedSampler,
gradient all-reduce, and `nn.DataParallel` all collapse into a
`jax.sharding.Mesh` with a 'data' axis plus jit sharding annotations — XLA
inserts the collectives, and they ride ICI.
"""

from sfa3d_tpu.parallel.mesh import (
    make_mesh,
    maybe_init_distributed,
    replicate,
    shard_batch,
)
from sfa3d_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)

__all__ = [
    "make_mesh",
    "maybe_init_distributed",
    "shard_batch",
    "replicate",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
