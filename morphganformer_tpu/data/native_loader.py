"""ctypes bindings + lazy build for the native C++ PNG batch loader.

Build-and-cache semantics mirror the reference's custom_ops JIT builder
(torch_utils/custom_ops.py:38-100): compile once into a digest-keyed cache
dir, reuse thereafter; fall back to the pure-Python pipeline
(data/dataset.py) if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "png_loader.cpp")
_lib = None
_build_error: Optional[str] = None


def _cache_dir():
    root = os.environ.get("MGT_CACHE_DIR",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "morphganformer_tpu"))
    os.makedirs(root, exist_ok=True)
    return root


def build_library(force=False) -> Optional[str]:
    """Compile the shared library (digest-cached). Returns its path."""
    global _build_error
    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libpngloader-{digest}.so")
    if os.path.exists(out) and not force:
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lz", "-lpthread", "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(out + ".tmp", out)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        _build_error = getattr(e, "stderr", b"") or str(e)
        return None


def get_library():
    global _lib
    if _lib is not None:
        return _lib
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_ubyte)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_error_count.restype = ctypes.c_int
    lib.loader_error_count.argtypes = [ctypes.c_void_p]
    lib.png_decode_file.restype = ctypes.c_int
    lib.png_decode_file.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_ubyte),
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_library() is not None


def decode_png(path, height, width, channels=3) -> np.ndarray:
    """Single-file decode through the native decoder (testing hook)."""
    lib = get_library()
    assert lib is not None, f"native loader unavailable: {_build_error}"
    out = np.empty((height, width, channels), dtype=np.uint8)
    rc = lib.png_decode_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        height, width, channels)
    if rc != 0:
        raise IOError(f"png_decode_file({path}) failed with {rc}")
    return out


class NativeBatchLoader:
    """Infinite shuffled NHWC uint8 batches decoded by C++ worker threads."""

    def __init__(self, files, height, width, channels=3, batch_size=8,
                 num_threads=4, queue_depth=4, seed=0, shard_index=0,
                 num_shards=1):
        self._lib = get_library()
        assert self._lib is not None, \
            f"native loader unavailable: {_build_error}"
        if not files:
            raise FileNotFoundError(
                "NativeBatchLoader: empty file list (wrong dataset path?)")
        self.shape = (batch_size, height, width, channels)
        arr = (ctypes.c_char_p * len(files))(
            *[f.encode() for f in files])
        self._handle = self._lib.loader_create(
            arr, len(files), height, width, channels, batch_size,
            num_threads, queue_depth, seed, shard_index, num_shards)
        if not self._handle:
            raise ValueError("loader_create rejected the configuration")
        self._buf = np.empty(self.shape, dtype=np.uint8)
        self._last_error_count = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        rc = self._lib.loader_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if rc != 0:
            raise StopIteration
        return self._buf.copy()

    @property
    def error_count(self) -> int:
        if self._handle is None:
            return self._last_error_count
        return self._lib.loader_error_count(self._handle)

    def close(self):
        if self._handle:
            self._last_error_count = self._lib.loader_error_count(self._handle)
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_infinite_batches(dataset_path, resolution, batch_size,
                            shard_index=0, num_shards=1, seed=0,
                            drange=(-1.0, 1.0), num_threads=4):
    """Drop-in for data.dataset.infinite_batches backed by the C++ loader.

    Not itself a generator: the glob and the NativeBatchLoader construction
    run eagerly so a wrong dataset path / unavailable toolchain raises HERE,
    inside the caller's try/except fallback (training/loop.py), instead of at
    the first next() long after the fallback window has closed."""
    import glob

    files = sorted(glob.glob(os.path.join(dataset_path, str(resolution),
                                          "*.png")))
    if not files:
        raise FileNotFoundError(
            f"no PNGs under {dataset_path}/{resolution}/")
    loader = NativeBatchLoader(files, resolution, resolution, 3, batch_size,
                               num_threads=num_threads, seed=seed,
                               shard_index=shard_index, num_shards=num_shards)
    lo, hi = drange
    scale = (hi - lo) / 255.0
    labels = np.zeros((batch_size, 0), dtype=np.float32)

    def _gen():
        for batch in loader:
            yield batch.astype(np.float32) * scale + lo, labels

    return _gen()
