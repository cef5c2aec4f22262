"""Decode-once raw memmap dataset cache (production data path).

PNG decode is the training loop's host-side ceiling (~36 img/s per
thread at 1024^2 through the native C++ loader — under the ~55 img/s the
chip can train). This module trades disk for decode: one pass writes the
decoded uint8 tensors to a contiguous `.raw` file next to the PNG
pyramid, and training epochs then read it through np.memmap at page-cache
/ NVMe bandwidth (hundreds of imgs/s at 1024^2, no decode at all).

Opt-in (MGT_RAW_CACHE=1 or cli/train.py --raw-cache): the raw file is
the UNCOMPRESSED dataset (res^2 * 3 bytes/image — e.g. 3 MB per 1024^2
image), a deliberate space-for-throughput trade the user must choose.
The cache is keyed on the source file list + sizes + mtimes; a changed
dataset rebuilds automatically. Replaces the reference's one-format
LMDB/tfrecords pipelines (SURVEY.md §2.7) with a TPU-feeding-rate design.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from typing import Iterator, Optional

import numpy as np


def _source_digest(files) -> str:
    h = hashlib.sha256()
    for f in files:
        st = os.stat(f)
        h.update(f.encode())
        h.update(str((st.st_size, int(st.st_mtime))).encode())
    return h.hexdigest()[:16]


def _paths(dataset_path: str, resolution: int):
    base = os.path.join(dataset_path, f"{resolution}.rawcache")
    return base, base + ".json"


def build_raw_cache(dataset_path: str, resolution: int,
                    force: bool = False) -> str:
    """Decode every PNG under <dataset>/<resolution>/ into one contiguous
    uint8 [N, H, W, 3] file. Idempotent: reused while the source digest
    matches. Returns the raw file path."""
    import glob

    files = sorted(glob.glob(os.path.join(dataset_path, str(resolution),
                                          "*.png")))
    if not files:
        raise FileNotFoundError(f"no PNGs under {dataset_path}/{resolution}/")
    raw_path, meta_path = _paths(dataset_path, resolution)
    digest = _source_digest(files)
    if not force and os.path.exists(raw_path) and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("digest") == digest:
            return raw_path

    # Prefer the threaded native decoder; PIL is the fallback.
    decode = None
    try:
        from morphganformer_tpu.data.native_loader import (decode_png,
                                                           native_available)
        if native_available():
            decode = lambda p: decode_png(p, resolution, resolution)
    except Exception:
        pass
    if decode is None:
        from PIL import Image

        def decode(p):
            img = Image.open(p).convert("RGB")
            a = np.asarray(img, dtype=np.uint8)
            assert a.shape == (resolution, resolution, 3), (p, a.shape)
            return a

    shape = (len(files), resolution, resolution, 3)
    tmp = raw_path + ".tmp"
    out = np.lib.format.open_memmap(tmp, mode="w+", dtype=np.uint8,
                                    shape=shape)
    for i, f in enumerate(files):
        out[i] = decode(f)
    out.flush()
    del out
    os.replace(tmp, raw_path)
    with open(meta_path, "w") as f:
        json.dump({"digest": digest, "count": len(files),
                   "resolution": resolution,
                   "files": [os.path.basename(p) for p in files]}, f)
    return raw_path


class RawBatchLoader:
    """Infinite shuffled uint8 batches out of the memmap, with one
    background prefetch thread (the memmap gather overlaps the device
    step). Sharding/seed semantics match NativeBatchLoader: each shard
    permutes ITS slice of the index space independently per epoch."""

    def __init__(self, raw_path: str, batch_size: int, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1,
                 prefetch: int = 2):
        self.data = np.load(raw_path, mmap_mode="r")
        n = self.data.shape[0]
        self.indices = np.arange(shard_index, n, num_shards)
        if len(self.indices) == 0:
            raise ValueError(f"shard {shard_index}/{num_shards} is empty "
                             f"for {n} items")
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed + shard_index)
        self._order: Optional[np.ndarray] = None
        self._pos = 0
        import queue

        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _next_indices(self):
        out = []
        while len(out) < self.batch_size:
            if self._order is None or self._pos >= len(self._order):
                self._order = self.rng.permutation(self.indices)
                self._pos = 0
            take = min(self.batch_size - len(out),
                       len(self._order) - self._pos)
            out.extend(self._order[self._pos:self._pos + take])
            self._pos += take
        return np.asarray(out)

    def _fill(self):
        while not self._stop.is_set():
            idx = self._next_indices()
            batch = np.ascontiguousarray(self.data[idx])
            try:
                self._q.put(batch, timeout=1.0)
            except Exception:
                continue

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        while True:
            try:
                return self._q.get(timeout=1.0)
            except Exception:
                if self._stop.is_set():
                    raise StopIteration

    def close(self):
        self._stop.set()
        # Unblock a filler parked in q.put so the thread exits promptly
        # instead of lingering for its timeout (leaked fillers held memmaps
        # open across the whole test suite before this).
        try:
            self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=2.0)

    def __del__(self):
        try:
            self._stop.set()
        except Exception:
            pass


def raw_infinite_batches(dataset_path: str, resolution: int,
                         batch_size: int, shard_index: int = 0,
                         num_shards: int = 1, seed: int = 0,
                         drange=(-1.0, 1.0)):
    """Drop-in for infinite_batches backed by the raw cache (building it
    on first use). Eager construction so failures surface inside the
    caller's fallback window (see native_infinite_batches)."""
    raw_path = build_raw_cache(dataset_path, resolution)
    loader = RawBatchLoader(raw_path, batch_size, seed=seed,
                            shard_index=shard_index, num_shards=num_shards)
    lo, hi = drange
    scale = (hi - lo) / 255.0
    labels = np.zeros((batch_size, 0), dtype=np.float32)

    def _gen():
        try:
            for batch in loader:
                yield batch.astype(np.float32) * scale + lo, labels
        finally:
            loader.close()  # generator dropped/closed -> stop the filler

    return _gen()
