"""Data layer: synthetic GP-draw generator, MovingMNIST pipeline, and the
fixed-shape mask-based batcher that replaces the reference's ragged
flatten/pad/slice machinery (src/Models/DataHandler.py)."""
from gpvae_tpu.data.synthetic import (
    generate_toy_data,
    load_toy_file,
    toy_to_masked_batch,
    TOY_TIME_GRID,
)
from gpvae_tpu.data.batching import Batcher
from gpvae_tpu.data.healing import (
    make_healing_batch,
    random_pixel_mask,
    synthetic_healing_sequences,
)
from gpvae_tpu.data.moving_mnist import MovingMNIST, synthetic_moving_mnist

__all__ = [
    "generate_toy_data",
    "load_toy_file",
    "toy_to_masked_batch",
    "TOY_TIME_GRID",
    "Batcher",
    "MovingMNIST",
    "synthetic_moving_mnist",
    "make_healing_batch",
    "random_pixel_mask",
    "synthetic_healing_sequences",
]
