from gpvae_tpu.parallel.mesh import (
    fit_data_parallel,
    make_mesh,
    shard_batch,
    shard_batch_stack,
    replicate,
    make_parallel_train_step,
    make_parallel_multi_step,
)

__all__ = [
    "fit_data_parallel",
    "make_mesh",
    "shard_batch",
    "shard_batch_stack",
    "replicate",
    "make_parallel_train_step",
    "make_parallel_multi_step",
]
