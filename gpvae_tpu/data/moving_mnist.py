"""MovingMNIST pipeline.

Re-implements the reference ``DataHandler`` (src/Models/DataHandler.py:4-95):
loads ``mnist_test_seq.npy`` ``(20, N, 64, 64)``, normalizes /255 (:78),
binarizes at 0.498 (:68-70), splits 80/10/10 (:85-95), and emits batches with
a uniform ``0..T-1`` time grid when times are requested (:41-49).

Batch format is the framework's static-shape convention:
``x [B, T, 64, 64, 1]``, ``times [B, T]``, ``mask [B, T]`` (all-True — the
MNIST grids are always full; the reference's ``batch_lengths = [20]*B``).

Since the 1 GB ``mnist_test_seq.npy`` is not distributable,
:func:`synthetic_moving_mnist` generates bouncing-sprite videos with the same
shape/dtype contract for tests and benchmarks.
"""
from __future__ import annotations

import numpy as np

from gpvae_tpu.data import native
from gpvae_tpu.data.batching import Batcher

BINARIZE_THRESHOLD = 0.498  # src/Models/DataHandler.py:68-70


def synthetic_moving_mnist(
    num_seqs: int,
    *,
    t: int = 20,
    size: int = 64,
    sprite: int = 12,
    seed: int = 0,
) -> np.ndarray:
    """Bouncing-square videos ``[T, N, size, size]`` in [0, 1] — the same
    layout as the reference's ``mnist_test_seq.npy`` after /255."""
    rng = np.random.default_rng(seed)
    out = np.zeros((t, num_seqs, size, size), np.float32)
    pos = rng.uniform(0, size - sprite, (num_seqs, 2))
    vel = rng.uniform(-4, 4, (num_seqs, 2))
    patch = np.ones((sprite, sprite), np.float32)
    patch[1:-1, 1:-1] = rng.uniform(0.6, 1.0, (sprite - 2, sprite - 2))
    for step in range(t):
        for i in range(num_seqs):
            r, c = int(pos[i, 0]), int(pos[i, 1])
            out[step, i, r:r + sprite, c:c + sprite] = patch
        pos += vel
        for d in range(2):
            over = pos[:, d] > size - sprite
            under = pos[:, d] < 0
            vel[over | under, d] *= -1
            pos[over, d] = 2 * (size - sprite) - pos[over, d]
            pos[under, d] = -pos[under, d]
    return out


class MovingMNIST:
    """Train/valid/test splits + batchers over MovingMNIST-format data."""

    def __init__(
        self,
        path: str | None = None,
        *,
        data: np.ndarray | None = None,
        batch_size: int = 5,
        train_fraction: float = 0.8,
        binarize: bool = True,
        seed: int = 0,
    ):
        if data is None:
            if path is None:
                raise ValueError("need path or data")
            data = np.load(path)  # (T, N, 64, 64) uint8
            if binarize:
                # fused /255 + threshold in the C++ runtime (:68-78)
                data = native.binarize(data, BINARIZE_THRESHOLD)
                binarize = False
            else:
                data = data.astype(np.float32) / 255.0  # :78
        data = np.asarray(data, np.float32)
        if binarize:
            data = native.binarize(data, BINARIZE_THRESHOLD)
        t, n = data.shape[:2]
        self.t = t
        x = np.moveaxis(data, 0, 1)[..., None]  # [N, T, H, W, 1]
        times = np.broadcast_to(
            np.arange(t, dtype=np.float32), (n, t)
        ).copy()
        mask = np.ones((n, t), bool)

        n_train = int(train_fraction * n)  # :85-95
        n_valid = (n - n_train) // 2
        self.splits = {}
        bounds = {
            "train": (0, n_train),
            "valid": (n_train, n_train + n_valid),
            "test": (n_train + n_valid, n),
        }
        self.batchers = {}
        for name, (lo, hi) in bounds.items():
            arrays = {
                "x": x[lo:hi], "times": times[lo:hi], "mask": mask[lo:hi]
            }
            self.splits[name] = arrays
            if hi - lo >= batch_size:
                self.batchers[name] = Batcher(
                    arrays, batch_size, seed=seed, shuffle=(name == "train")
                )

    def data_batch(self, name: str) -> dict:
        return next(self.batchers[name])

    def make_shuffled_dataset(self, seed: int = 0) -> None:
        """'mixed_train': training frames shuffled across time and sequence
        (destroys temporal structure — the reference's ablation control,
        src/Models/DataHandler.py:53-57)."""
        x = self.splits["train"]["x"]
        n, t = x.shape[:2]
        flat = x.reshape((n * t,) + x.shape[2:]).copy()
        np.random.default_rng(seed).shuffle(flat)
        arrays = {
            "x": flat.reshape(x.shape),
            "times": self.splits["train"]["times"],
            "mask": self.splits["train"]["mask"],
        }
        self.splits["mixed_train"] = arrays
        self.batchers["mixed_train"] = Batcher(
            arrays, self.batchers["train"].batch_size, seed=seed
        )

    def make_cropped_dataset(self, y0: int = 18, x0: int = 18,
                             size: int = 28) -> None:
        """'cropped_train': center-crop of the frames (reference
        src/Models/DataHandler.py:59-61)."""
        src = self.splits["train"]
        arrays = {
            "x": src["x"][:, :, y0:y0 + size, x0:x0 + size, :],
            "times": src["times"],
            "mask": src["mask"],
        }
        self.splits["cropped_train"] = arrays
        self.batchers["cropped_train"] = Batcher(
            arrays, self.batchers["train"].batch_size
        )
