"""Checkpoint-converter tests against a synthetic reference-style pickle.

Builds a pickle with the exact persistence wire format the reference
emits (torch_utils/persistence.py __reduce__: a call to
`_reconstruct_persistent_obj(meta)` with meta.state holding the module's
__dict__ incl. _parameters/_buffers/_modules), runs
tools/convert_checkpoint.py's stub unpickler + name/layout mapping, loads
the result as a native checkpoint, and checks tensors landed transposed
into the right flax leaves.
"""

import io
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tools.convert_checkpoint import (
    flatten_module_state,
    load_reference_pickle,
    map_generator_params,
)


def _module_state(params=None, buffers=None, modules=None, extra=None):
    state = {
        "_parameters": {k: torch.from_numpy(v) for k, v in (params or {}).items()},
        "_buffers": {k: torch.from_numpy(v) for k, v in (buffers or {}).items()},
        "_modules": modules or {},
    }
    state.update(extra or {})
    return state


def _persistent(state):
    """Mimic persistence.__reduce__: reconstruct-by-function with meta."""
    return _FakePersistent(state)


class _FakePersistent:
    def __init__(self, state):
        self.state = state

    def __reduce__(self):
        meta = dict(type="class", version=6, module_src="# src",
                    class_name="Generator", state=self.state)
        return (_fake_reconstruct, (meta,))


def _fake_reconstruct(meta):  # pragma: no cover - replaced by stub
    raise RuntimeError("must not execute")


# Register a fake torch_utils.persistence module so pickling emits the
# reference's GLOBAL path; the converter's unpickler intercepts it by name.
import sys
import types

_fake_mod = types.ModuleType("torch_utils.persistence")
_fake_reconstruct.__module__ = "torch_utils.persistence"
_fake_reconstruct.__qualname__ = "_reconstruct_persistent_obj"
_fake_mod._reconstruct_persistent_obj = _fake_reconstruct
_parent = types.ModuleType("torch_utils")
_parent.persistence = _fake_mod
sys.modules.setdefault("torch_utils", _parent)
sys.modules.setdefault("torch_utils.persistence", _fake_mod)


@pytest.fixture()
def synthetic_pickle(tmp_path):
    rng = np.random.RandomState(0)
    fc_w = rng.randn(16, 8).astype(np.float32)          # torch FC [out, in]
    conv_w = rng.randn(12, 6, 3, 3).astype(np.float32)  # OIHW
    const = rng.randn(6, 4, 4).astype(np.float32)       # C44
    noise = rng.randn(8, 8).astype(np.float32)
    w_avg = rng.randn(8).astype(np.float32)
    pos = rng.randn(4, 8).astype(np.float32)

    affine = _module_state(params={"weight": fc_w,
                                   "bias": np.zeros(16, np.float32)})
    conv1 = _module_state(
        params={"weight": conv_w,
                "noise_strength": np.asarray(0.5, np.float32)},
        buffers={"noise_const": noise},
        modules={"affine": affine})
    b4 = _module_state(params={"const": const}, modules={"conv1": conv1})
    synthesis = _module_state(modules={"b4": b4})
    mapping = _module_state(buffers={"w_avg": w_avg})
    root_state = _module_state(
        params={"pos": pos},
        modules={"synthesis": synthesis, "mapping": mapping},
        extra={"_init_kwargs": {"z_dim": 8, "w_dim": 8, "k": 5,
                                "img_resolution": 32}})

    path = tmp_path / "snapshot.pkl"
    with open(path, "wb") as f:
        pickle.dump({"Gs": _persistent(root_state)}, f)
    return str(path), dict(fc_w=fc_w, conv_w=conv_w, const=const,
                           noise=noise, w_avg=w_avg, pos=pos)


def test_stub_unpickler_captures_without_executing(synthetic_pickle):
    path, tensors = synthetic_pickle
    nets = load_reference_pickle(path)
    assert "Gs" in nets
    flat = flatten_module_state(nets["Gs"])
    assert set(flat) >= {
        "pos", "mapping.w_avg", "synthesis.b4.const",
        "synthesis.b4.conv1.weight", "synthesis.b4.conv1.noise_const",
        "synthesis.b4.conv1.noise_strength",
        "synthesis.b4.conv1.affine.weight", "synthesis.b4.conv1.affine.bias",
    }
    np.testing.assert_array_equal(flat["synthesis.b4.conv1.weight"],
                                  tensors["conv_w"])


def test_layout_mapping(synthetic_pickle):
    path, tensors = synthetic_pickle
    flat = flatten_module_state(load_reference_pickle(path)["Gs"])
    variables, unmapped = map_generator_params(flat)
    assert not unmapped, unmapped

    p = variables["params"]
    # FC [out,in] -> [in,out]
    np.testing.assert_array_equal(
        p["synthesis"]["b4"]["conv1"]["affine"]["weight"], tensors["fc_w"].T)
    # conv OIHW -> HWIO
    np.testing.assert_array_equal(
        p["synthesis"]["b4"]["conv1"]["weight"],
        tensors["conv_w"].transpose(2, 3, 1, 0))
    # const C44 -> 44C
    np.testing.assert_array_equal(
        p["synthesis"]["b4"]["const"], tensors["const"].transpose(1, 2, 0))
    # buffers / moving stats land in their collections
    np.testing.assert_array_equal(
        variables["buffers"]["synthesis"]["b4"]["conv1"]["noise_const"],
        tensors["noise"])
    np.testing.assert_array_equal(
        variables["moving_stats"]["mapping"]["w_avg"], tensors["w_avg"])
    np.testing.assert_array_equal(p["pos"], tensors["pos"])


def test_converted_tree_merges_into_real_model(tmp_path):
    """Round-trip through the REAL model: export a flax generator's params
    in reference naming/layout, convert, and verify identical outputs."""
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.models import init_generator
    from tests.test_models import small_cfg

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)

    # Export every leaf to reference conventions (inverse of the mapping).
    flat = {}

    def export(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, dict):
                export(v, name)
                continue
            a = np.asarray(v)
            if k == "weight":
                a = a.T if a.ndim == 2 else a.transpose(3, 2, 0, 1)
            elif k == "const":
                a = a.transpose(2, 0, 1)
            flat[name] = a

    export(variables["params"], "")
    export({"mapping": {"w_avg": variables["moving_stats"]["mapping"]["w_avg"]}}, "")
    if "buffers" in variables:
        export(variables["buffers"], "")

    converted, unmapped = map_generator_params(flat)
    assert not unmapped, unmapped[:10]

    # The converted tree must regenerate identical images.
    # Every leaf must be bit-identical after the round trip.
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        node = converted
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                      err_msg=jax.tree_util.keystr(path))

    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.k, cfg.z_dim))
    a = model.apply(variables, z, noise_mode="const")
    b = model.apply(converted, z, noise_mode="const")
    # (1e-4: separate jit traces may fuse in different order)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
