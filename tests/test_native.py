"""Native C++ data pipeline vs numpy fallbacks (parity + prefetcher)."""
import numpy as np
import pytest

from gpvae_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.have_native(), reason="native library not built"
)


def test_binarize_u8_matches_numpy():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 20, 64, 64), dtype=np.uint8)
    got = native.binarize(frames)
    want = ((frames.astype(np.float32) / 255.0) >= 0.498).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_binarize_f32_matches_numpy():
    rng = np.random.default_rng(1)
    frames = rng.random((5, 64, 64)).astype(np.float32)
    got = native.binarize(frames)
    want = (frames >= 0.498).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_gather_batch_matches_numpy():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((50, 12, 15)).astype(np.float32)
    idx = rng.integers(0, 50, 8)
    got = native.gather_batch(data, idx)
    np.testing.assert_array_equal(got, data[idx])


def test_pack_ragged_matches_numpy():
    rng = np.random.default_rng(3)
    x = (rng.random((10, 45, 15)) < 0.4).astype(np.float32)
    hidden = rng.random((10, 45)) < 0.5
    x[hidden] = -1.0
    x_clean, mask, lengths = native.pack_ragged(x)
    np.testing.assert_array_equal(mask, ~hidden)
    np.testing.assert_array_equal(lengths, (~hidden).sum(-1))
    np.testing.assert_array_equal(x_clean[hidden], 0.0)
    np.testing.assert_array_equal(x_clean[~hidden], x[~hidden])


def test_prefetcher_cycles_and_shuffles():
    rng = np.random.default_rng(4)
    data = np.arange(20, dtype=np.float32)[:, None] * np.ones(
        (1, 3), np.float32
    )
    pf = native.NativePrefetcher(data, batch_size=8, seed=1, depth=3)
    seen = []
    for _ in range(10):  # 4 epochs worth with wrap
        b = next(pf)
        assert b.shape == (8, 3)
        seen.extend(b[:, 0].astype(int).tolist())
    pf.close()
    # every item appears; batches are permutations without replacement
    assert set(seen) <= set(range(20))
    assert len(set(seen)) == 20


def test_prefetcher_epoch_is_permutation():
    data = np.arange(16, dtype=np.float32)[:, None]
    pf = native.NativePrefetcher(data, batch_size=8, seed=2, depth=2)
    epoch = np.concatenate([next(pf)[:, 0], next(pf)[:, 0]])
    pf.close()
    assert sorted(epoch.astype(int).tolist()) == list(range(16))
