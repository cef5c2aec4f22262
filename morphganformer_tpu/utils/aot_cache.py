"""AOT-compiled executable cache keyed by program NAME, not compile env.

Why this exists: jax's persistent compilation cache keys every entry on a
hash that includes the backend *compile environment*; on this platform the
VM re-provisions between hosts and that hash drifts (four documented
drifts in one round, ROADMAP.md), silently turning a committed warm cache
into a ~20-minute remote Mosaic/XLA recompile. `jax.experimental.
serialize_executable` sidesteps the key entirely: it pickles the
*compiled* PjRt executable itself, so loading it needs no XLA compile at
all — verified on this backend for both plain XLA programs and
pallas/Mosaic kernels (deserialize ~0.1 s, first call just pays device
init).

Contract:
  save(directory, name, compiled)   -> path written (blob + meta json)
  load(directory, name)             -> jax.stages.Compiled | None

A blob is only loaded when the recorded jax version and PjRt
platform_version match the live backend (a serialized executable is a
runtime-version-specific artifact; a mismatched deserialize could fail
uncleanly mid-bench). `MGT_AOT_FORCE=1` overrides the version gate for
experiments. All load failures return None — callers fall back to
compilation.

Blobs are gzip-compressed (XLA executables compress ~2-4x) and live in
the committed `.bench_aot/` directory next to a `MANIFEST.json` recording
what was minted where; `tools/warm_bench_cache.py` mints them on the real
chip and `tools/round_end_check.py` gates round end on their freshness.
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
import time


def _meta_path(directory: str, name: str) -> str:
    return os.path.join(directory, f"{name}.meta.json")


def _blob_path(directory: str, name: str) -> str:
    return os.path.join(directory, f"{name}.aot.gz")


def _backend_meta():
    import jax

    client = jax.devices()[0].client
    return {
        "jax_version": jax.__version__,
        "platform": client.platform,
        "platform_version": client.platform_version,
        "device_kind": jax.devices()[0].device_kind,
    }


def _executable_device_count(compiled) -> int:
    """Number of devices the executable was compiled for (1 for plain jit).
    deserialize_and_load defaults execution_devices to ALL backend devices,
    which rejects a 1-device executable on a multi-device backend (e.g. the
    8-virtual-CPU test mesh) — so the count is recorded at save time."""
    for probe in (
        lambda c: len(c._executable.xla_executable.local_devices()),
        lambda c: len(c._executable._device_assignment),
    ):
        try:
            return int(probe(compiled))
        except Exception:
            continue
    return 1


def save(directory: str, name: str, compiled) -> str:
    """Serialize a jax.stages.Compiled to `<directory>/<name>.aot.gz`."""
    from jax.experimental import serialize_executable as se

    os.makedirs(directory, exist_ok=True)
    payload, in_tree, out_tree = se.serialize(compiled)
    raw = pickle.dumps((payload, in_tree, out_tree),
                       protocol=pickle.HIGHEST_PROTOCOL)
    num_devices = _executable_device_count(compiled)
    blob = gzip.compress(raw, compresslevel=6)
    path = _blob_path(directory, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    meta = _backend_meta()
    meta.update({"name": name, "raw_bytes": len(raw),
                 "blob_bytes": len(blob), "minted_unix": int(time.time()),
                 "num_devices": num_devices})
    with open(_meta_path(directory, name), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    _update_manifest(directory, name, meta)
    return path


def _update_manifest(directory: str, name: str, meta: dict) -> None:
    manifest_path = os.path.join(directory, "MANIFEST.json")
    manifest = {}
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                manifest = json.load(f)
        except Exception:
            manifest = {}
    manifest[name] = {k: meta[k] for k in
                      ("jax_version", "platform_version", "blob_bytes",
                       "minted_unix")}
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


def probe(directory: str, name: str) -> str:
    """Why a load would (or would not) succeed, without touching the blob:
    'ok' | 'missing' | a human-readable version-mismatch reason."""
    meta_path = _meta_path(directory, name)
    if not (os.path.exists(meta_path)
            and os.path.exists(_blob_path(directory, name))):
        return "missing"
    with open(meta_path) as f:
        meta = json.load(f)
    live = _backend_meta()
    for key in ("jax_version", "platform", "platform_version"):
        if meta.get(key) != live[key]:
            if os.environ.get("MGT_AOT_FORCE") == "1":
                return "ok"
            return (f"{key} mismatch: blob={meta.get(key)!r} "
                    f"live={live[key]!r}")
    return "ok"


def load(directory: str, name: str):
    """Deserialize `<directory>/<name>.aot.gz` -> Compiled, or None."""
    from jax.experimental import serialize_executable as se

    why = probe(directory, name)
    if why != "ok":
        return None
    try:
        import jax

        with open(_meta_path(directory, name)) as f:
            n_dev = json.load(f).get("num_devices", 1)
        with open(_blob_path(directory, name), "rb") as f:
            raw = gzip.decompress(f.read())
        payload, in_tree, out_tree = pickle.loads(raw)
        return se.deserialize_and_load(
            payload, in_tree, out_tree,
            execution_devices=jax.devices()[:n_dev])
    except Exception:
        return None
