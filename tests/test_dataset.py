"""Dataset/loader tests: pairing, crop/pad semantics, process sharding."""

import os

import numpy as np
import pytest

from cmgan_tpu.data import write_wav
from cmgan_tpu.data.dataset import BatchLoader, DemandDataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("demand")
    rng = np.random.default_rng(0)
    for sub in ("clean", "noisy"):
        os.makedirs(root / sub)
    # 10 tracks: some shorter than cut_len (tile-pad path), some longer
    for i, n in enumerate([1000, 3000, 4000, 5000, 8000, 2500, 4100, 900, 6000, 7000]):
        x = (rng.standard_normal(n) * 0.1).astype(np.float32)
        write_wav(str(root / "clean" / f"p{i}_1.wav"), x, 16000)
        write_wav(str(root / "noisy" / f"p{i}_1.wav"), x + 0.01, 16000)
    return str(root)


def test_pairing_and_lengths(data_dir):
    ds = DemandDataset(data_dir, cut_len=4000)
    assert len(ds) == 10
    clean, noisy, length = ds[0]
    assert clean.shape == noisy.shape == (4000,)


def test_tile_pad_short_clip(data_dir):
    ds = DemandDataset(data_dir, cut_len=4000)
    # p7_1 is 900 samples -> tiled 4x + 400-sample prefix
    idx = ds.names.index("p7_1.wav")
    clean, _, length = ds[idx]
    assert length == 900
    np.testing.assert_array_equal(clean[:900], clean[900:1800])
    np.testing.assert_array_equal(clean[3600:4000], clean[:400])


def test_crop_alignment(data_dir):
    # clean and noisy must be cropped at the SAME offset
    ds = DemandDataset(data_dir, cut_len=4000)
    idx = ds.names.index("p4_1.wav")  # 8000 samples
    rng = np.random.default_rng(3)
    clean, noisy, _ = ds.__getitem__(idx, rng=rng)
    np.testing.assert_allclose(noisy - clean, 0.01, atol=1e-4)  # PCM16 quantization


def test_process_sharding_partitions_epoch(data_dir):
    ds = DemandDataset(data_dir, cut_len=4000)
    seen = []
    for rank in range(2):
        loader = BatchLoader(
            ds, batch_size=2, shuffle=True, drop_last=True, seed=7,
            num_processes=2, process_index=rank, prefetch=0,
        )
        idxs = loader._epoch_indices()
        assert len(idxs) == 5  # 10 tracks / 2 processes
        seen.append(set(int(i) for i in idxs))
    # together the two processes cover the whole epoch, without overlap
    assert seen[0] | seen[1] == set(range(10))
    assert not (seen[0] & seen[1])


def test_epoch_reshuffles(data_dir):
    ds = DemandDataset(data_dir, cut_len=4000)
    loader = BatchLoader(ds, batch_size=2, seed=0, prefetch=0)
    first = list(loader._epoch_indices())
    loader.epoch += 1
    second = list(loader._epoch_indices())
    assert first != second  # epoch-seeded shuffle

def test_loader_batches(data_dir):
    ds = DemandDataset(data_dir, cut_len=4000)
    loader = BatchLoader(ds, batch_size=3, drop_last=True, prefetch=2)
    batches = list(loader)
    assert len(batches) == 3  # 10 // 3
    for clean, noisy in batches:
        assert clean.shape == noisy.shape == (3, 4000)


def test_sharding_equal_when_fewer_tracks_than_processes(data_dir):
    """With n < num_processes the order must tile so every process gets
    the same (nonzero) shard length — unequal shards desync collectives
    across hosts."""
    ds = DemandDataset(data_dir, cut_len=4000)  # 10 tracks
    lengths = []
    for rank in range(16):
        loader = BatchLoader(
            ds, batch_size=1, shuffle=False, drop_last=False,
            num_processes=16, process_index=rank, prefetch=0,
        )
        idxs = loader._epoch_indices()
        lengths.append(len(idxs))
        assert all(0 <= int(i) < 10 for i in idxs)
    assert len(set(lengths)) == 1 and lengths[0] == 1
