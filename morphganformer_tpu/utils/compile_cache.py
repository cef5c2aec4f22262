"""Persistent XLA/Mosaic compilation cache for the CLI entry points.

A cold compile of the flagship 1024^2 generator takes 10-20+ minutes on
this class of hardware (the reference pays an analogous one-time cost
JIT-building its CUDA extensions, torch_utils/custom_ops.py) — but JAX's
persistent compilation cache makes every subsequent process start in
seconds. The library itself never touches global config; the CLIs opt in
via `enable_persistent_cache()` before their first jax computation.

Env contract:
  MGT_COMPILE_CACHE=<dir>  use <dir> as the cache
  MGT_COMPILE_CACHE=0      disable entirely
  (unset)                  ~/.cache/morphganformer_tpu/xla/<host-fp>

The directory is scoped by a HOST CPU fingerprint: XLA:CPU AOT
executables encode the compile machine's feature set, and loading an
entry produced on a different host is at best a warning and at worst a
segfault (observed live: this VM class re-provisions with different CPU
features, and a stale avx512/amx-compiled entry segfaulted the test
suite inside compilation_cache.get_executable_and_time). TPU executables
are host-independent — the committed .bench_cache stays flat and is NOT
managed by this module.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set."""
    bits = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits += " " + " ".join(sorted(line.split(":")[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(bits.encode()).hexdigest()[:10]


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache directory and return it
    (None when disabled). Safe to call more than once; must run before
    the first traced computation to cover it."""
    env = os.environ.get("MGT_COMPILE_CACHE")
    if env in ("0", "off", "none"):
        return None
    base = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "morphganformer_tpu", "xla")
    cache_dir = os.path.join(base, host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
