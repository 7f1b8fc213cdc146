"""Cyclic shuffling batcher over fixed-shape array dicts.

Replaces the reference's per-dataset counter + reshuffle-on-wrap logic
(``DataHandler.data_batch``, src/Models/DataHandler.py:22-51;
``SyntheticDataHandler.data_batch``, :111-124) with one generic host-side
iterator.  All arrays are fixed-shape (ragged sequences are carried as
masks), so every batch feeds a single compiled train step — no retraces.
"""
from __future__ import annotations

import numpy as np

from gpvae_tpu.data import native


class Batcher:
    """Cycles over ``arrays`` (dict of same-leading-dim numpy arrays) in
    batches of ``batch_size``, reshuffling whenever a batch would run past
    the end (the reference's wrap semantics)."""

    def __init__(self, arrays: dict, batch_size: int, *, seed: int = 0,
                 shuffle: bool = True):
        self.arrays = {k: np.asarray(v) for k, v in arrays.items()}
        sizes = {k: v.shape[0] for k, v in self.arrays.items()}
        if len(set(sizes.values())) != 1:
            raise ValueError(f"inconsistent leading dims: {sizes}")
        self.n = next(iter(sizes.values()))
        if batch_size > self.n:
            raise ValueError(f"batch_size {batch_size} > dataset size {self.n}")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(self.n)
        self._pos = 0
        if shuffle:
            self._rng.shuffle(self._order)

    def __iter__(self):
        return self

    def next_indices(self) -> np.ndarray:
        """The next batch's row indices (same wrap/reshuffle semantics as
        ``__next__``).  Lets a device-resident training loop gather batches
        on-chip: only these [batch_size] ints cross the host boundary."""
        if self._pos + self.batch_size > self.n:
            if self.shuffle:
                self._rng.shuffle(self._order)
            self._pos = 0
        idx = self._order[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        # A *copy*, not a view: callers (train.fit's sampled multi-step path)
        # collect several index batches before stacking, and a wrap-reshuffle
        # in a later call would mutate previously returned views in place —
        # silently duplicating batches for any dataset smaller than
        # steps_per_call * batch_size.
        return idx.copy()

    def __next__(self) -> dict:
        idx = self.next_indices()
        out = {}
        for k, v in self.arrays.items():
            if v.dtype == np.float32 and native.have_native():
                out[k] = native.gather_batch(v, idx)  # threaded C++ gather
            else:
                out[k] = v[idx]
        return out

    @property
    def steps_per_epoch(self) -> int:
        return self.n // self.batch_size
