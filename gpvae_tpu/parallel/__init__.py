from gpvae_tpu.parallel.mesh import (
    fit_data_parallel,
    make_mesh,
    shard_batch,
    replicate,
    make_parallel_train_step,
)

__all__ = [
    "fit_data_parallel",
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_parallel_train_step",
]
