"""Dataset + native loader tests (spec: reference training/dataset.py and
the DataLoader feed path of training_loop.py:53-67)."""

import os

import numpy as np
import pytest
from PIL import Image

from morphganformer_tpu.data.dataset import ImageFolderDataset, infinite_batches


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    folder = root / "32"
    folder.mkdir()
    rng = np.random.RandomState(0)
    for i in range(20):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(folder / f"{i:04d}.png")
    return str(root)


def test_image_folder_dataset(png_dir):
    ds = ImageFolderDataset(png_dir, 32)
    assert len(ds) == 20
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert label.shape == (0,)


def test_mirror_augment_doubles(png_dir):
    ds = ImageFolderDataset(png_dir, 32, mirror_augment=True)
    assert len(ds) == 40
    a, _ = ds[0]
    b, _ = ds[20]
    np.testing.assert_array_equal(b, a[:, ::-1, :])


def test_max_items(png_dir):
    ds = ImageFolderDataset(png_dir, 32, max_items=5)
    assert len(ds) == 5


def test_infinite_batches_sharded(png_dir):
    ds = ImageFolderDataset(png_dir, 32)
    it0 = infinite_batches(ds, 4, shard_index=0, num_shards=2, seed=1)
    x, labels = next(it0)
    assert x.shape == (4, 32, 32, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_missing_folder_raises(png_dir):
    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(png_dir, 64)


# ---------------- native C++ loader ----------------

native = pytest.importorskip("morphganformer_tpu.data.native_loader")


@pytest.mark.skipif(not native.native_available(),
                    reason="no C++ toolchain")
def test_native_decode_matches_pil(png_dir):
    files = sorted(os.listdir(os.path.join(png_dir, "32")))
    for name in files[:5]:
        path = os.path.join(png_dir, "32", name)
        want = np.asarray(Image.open(path).convert("RGB"))
        got = native.decode_png(path, 32, 32, 3)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.native_available(),
                    reason="no C++ toolchain")
def test_native_decode_grayscale_and_rgba(tmp_path):
    rng = np.random.RandomState(1)
    gray = (rng.rand(16, 16) * 255).astype(np.uint8)
    Image.fromarray(gray, "L").save(tmp_path / "g.png")
    got = native.decode_png(str(tmp_path / "g.png"), 16, 16, 3)
    np.testing.assert_array_equal(got, np.stack([gray] * 3, axis=-1))

    rgba = (rng.rand(16, 16, 4) * 255).astype(np.uint8)
    Image.fromarray(rgba, "RGBA").save(tmp_path / "a.png")
    got = native.decode_png(str(tmp_path / "a.png"), 16, 16, 3)
    np.testing.assert_array_equal(got, rgba[:, :, :3])


@pytest.mark.skipif(not native.native_available(),
                    reason="no C++ toolchain")
def test_native_batch_loader(png_dir):
    import glob

    files = sorted(glob.glob(os.path.join(png_dir, "32", "*.png")))
    loader = native.NativeBatchLoader(files, 32, 32, 3, batch_size=4,
                                      num_threads=2, seed=0)
    seen = []
    for i, batch in enumerate(loader):
        assert batch.shape == (4, 32, 32, 3)
        seen.append(batch.copy())
        if i >= 9:
            break
    loader.close()
    assert loader.error_count == 0
    # Shuffling: not all batches identical.
    assert any(not np.array_equal(seen[0], s) for s in seen[1:])


@pytest.mark.skipif(not native.native_available(),
                    reason="no C++ toolchain")
def test_native_infinite_batches_drange(png_dir):
    it = native.native_infinite_batches(png_dir, 32, batch_size=4)
    x, labels = next(it)
    assert x.shape == (4, 32, 32, 3)
    assert x.dtype == np.float32
    assert -1.0 <= x.min() and x.max() <= 1.0


def test_raw_cache_roundtrip_and_sharding(tmp_path):
    """data/raw_cache.py: decode-once memmap cache returns the same
    pixels as the PNG dataset, shards partition the index space, and a
    changed source rebuilds (digest key)."""
    import time

    from PIL import Image

    from morphganformer_tpu.data.raw_cache import (build_raw_cache,
                                                   raw_infinite_batches)

    res = 16
    d = tmp_path / "ds" / str(res)
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (res, res, 3), np.uint8) for _ in range(6)]
    for i, a in enumerate(imgs):
        Image.fromarray(a).save(d / f"img{i:04d}.png")

    raw = build_raw_cache(str(tmp_path / "ds"), res)
    data = np.load(raw, mmap_mode="r")
    assert data.shape == (6, res, res, 3)
    np.testing.assert_array_equal(np.asarray(data), np.stack(imgs))
    # Idempotent: same digest reuses the file.
    mtime = os.path.getmtime(raw)
    assert build_raw_cache(str(tmp_path / "ds"), res) == raw
    assert os.path.getmtime(raw) == mtime

    # Batches come from the cache, scaled to drange; shards are disjoint.
    seen = {}
    for shard in (0, 1):
        gen = raw_infinite_batches(str(tmp_path / "ds"), res, batch_size=2,
                                   shard_index=shard, num_shards=2, seed=3)
        batch, labels = next(gen)
        assert batch.shape == (2, res, res, 3) and labels.shape == (2, 0)
        back = np.round((batch + 1.0) * 127.5).astype(np.uint8)
        idx = [next(i for i, im in enumerate(imgs) if np.array_equal(b, im))
               for b in back]
        seen[shard] = set(i % 2 for i in idx)
    assert seen[0] == {0} and seen[1] == {1}

    # Source change -> digest mismatch -> rebuild.
    time.sleep(1.1)  # mtime resolution
    Image.fromarray(imgs[0][::-1].copy()).save(d / "img0000.png")
    raw2 = build_raw_cache(str(tmp_path / "ds"), res)
    data2 = np.load(raw2, mmap_mode="r")
    np.testing.assert_array_equal(np.asarray(data2[0]), imgs[0][::-1])
