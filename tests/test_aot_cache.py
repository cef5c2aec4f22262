"""AOT executable store (utils/aot_cache.py) — the bench scoreboard's
robustness layer (VERDICT r3 #1): serialized pre-compiled executables
keyed by program name + runtime version, immune to jax's env-hashed
persistent-cache key drift."""

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphganformer_tpu.utils import aot_cache


@functools.partial(jax.jit, static_argnums=(0,))
def _fn(scale, x, y):
    return {"out": jnp.tanh(x @ y) * scale}


def _compile():
    x = jnp.ones((16, 16), jnp.float32)
    return _fn.lower(3.0, x, x).compile(), x


def test_save_load_roundtrip(tmp_path):
    comp, x = _compile()
    path = aot_cache.save(str(tmp_path), "roundtrip", comp)
    assert os.path.exists(path)
    assert aot_cache.probe(str(tmp_path), "roundtrip") == "ok"
    loaded = aot_cache.load(str(tmp_path), "roundtrip")
    assert loaded is not None
    np.testing.assert_allclose(loaded(x, x)["out"], comp(x, x)["out"])


def test_missing_blob(tmp_path):
    assert aot_cache.probe(str(tmp_path), "nope") == "missing"
    assert aot_cache.load(str(tmp_path), "nope") is None


def test_version_gate(tmp_path, monkeypatch):
    comp, x = _compile()
    aot_cache.save(str(tmp_path), "gated", comp)
    meta_path = os.path.join(str(tmp_path), "gated.meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["platform_version"] = "some-other-runtime"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    assert "mismatch" in aot_cache.probe(str(tmp_path), "gated")
    assert aot_cache.load(str(tmp_path), "gated") is None
    # MGT_AOT_FORCE=1 overrides the gate (same process/runtime here, so the
    # deserialize itself still succeeds).
    monkeypatch.setenv("MGT_AOT_FORCE", "1")
    assert aot_cache.probe(str(tmp_path), "gated") == "ok"
    assert aot_cache.load(str(tmp_path), "gated") is not None


def test_corrupt_blob_returns_none(tmp_path):
    comp, x = _compile()
    path = aot_cache.save(str(tmp_path), "corrupt", comp)
    with open(path, "wb") as f:
        f.write(b"not gzip at all")
    assert aot_cache.load(str(tmp_path), "corrupt") is None


def test_manifest_tracks_entries(tmp_path):
    comp, x = _compile()
    aot_cache.save(str(tmp_path), "a", comp)
    aot_cache.save(str(tmp_path), "b", comp)
    with open(os.path.join(str(tmp_path), "MANIFEST.json")) as f:
        manifest = json.load(f)
    assert set(manifest) == {"a", "b"}
    assert all("jax_version" in v and "blob_bytes" in v
               for v in manifest.values())
