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


# ---------------------------------------------------------------------------
# Discriminator conversion (VERDICT r1 #4).
# ---------------------------------------------------------------------------

def _export_torch_layout(tree, prefix=""):
    """Flax tree -> flat torch-layout dict (inverse of the converter maps)."""
    flat = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_export_torch_layout(v, name))
            continue
        a = np.asarray(v)
        if k == "weight":
            if (a.ndim == 2 and name.endswith(".fc.weight")
                    and a.shape[0] == 16 * a.shape[1]):
                # Epilogue fc: torch flattens the 4x4 map NCHW, flax NHWC
                # — inverse of map_discriminator_params' permute.
                i, o = a.shape
                a = (a.reshape(4, 4, o, o).transpose(3, 2, 0, 1)
                     .reshape(o, i))
            elif a.ndim == 2:
                a = a.T
            else:
                a = a.transpose(3, 2, 0, 1)
        elif k == "const":
            a = a.transpose(2, 0, 1)
        flat[name] = a
    return flat


def test_discriminator_round_trip_through_real_model():
    """Export a real flax D in reference torch layout, convert back via
    map_discriminator_params, and verify identical params and logits."""
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.models.config import DiscriminatorConfig
    from morphganformer_tpu.models.discriminator import Discriminator
    from tools.convert_checkpoint import map_discriminator_params

    cfg = DiscriminatorConfig(img_resolution=32, channel_base=512,
                              channel_max=64, mbstd_group_size=2)
    model = Discriminator(cfg)
    img = jnp.zeros((2, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    flat = _export_torch_layout(variables["params"])
    converted, unmapped = map_discriminator_params(flat)
    assert not unmapped, unmapped[:10]

    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        node = converted
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                      err_msg=jax.tree_util.keystr(path))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = model.apply(variables, x)
    b = model.apply(converted, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ---------------------------------------------------------------------------
# TF-legacy conversion (reference loader.py:91-314; VERDICT r1 #4).
# The torch-flat export of a REAL model is re-encoded with TF variable names
# and layouts (flips, transposes, mod_bias-1, noise indices), pushed through
# tf_*_to_torch, and must reproduce the original flax tree bit-exactly.
# ---------------------------------------------------------------------------

_ATT_TF = {
    "to_queries": "query", "to_keys": "key", "to_values": "value",
}


def _att_to_tf(sub, leaf, a):
    """TransformerLayer torch param -> (TF suffix, array)."""
    if sub in _ATT_TF:
        return (f"{'weight' if leaf == 'weight' else 'bias'}_{_ATT_TF[sub]}",
                a.T if leaf == "weight" else a)
    if sub in ("from_pos_map", "to_pos_map"):
        s = sub.split("_")[0]
        return (f"{'weight' if leaf == 'weight' else 'bias'}_{s}_pos",
                a.T if leaf == "weight" else a)
    if sub == "modulation":
        return (f"{'weight' if leaf == 'weight' else 'bias'}_out",
                a.T if leaf == "weight" else a)
    if sub == "queries2centroids":
        return (f"{'weight' if leaf == 'weight' else 'bias'}_key2",
                a.T if leaf == "weight" else a)
    if sub == "centroids":
        return ("toasgn_init", a)
    if sub == "att_weight":
        return ("iter_0/st_weights", a)
    raise AssertionError(sub)


def _torch_flat_to_tf_generator(flat):
    import math
    import re

    tf = {}
    for name, a in flat.items():
        a = np.asarray(a)
        if name == "pos":
            tf["ltnt_emb/emb"] = a
        elif name == "mapping.w_avg":
            tf["dlatent_avg"] = a
        elif (m := re.fullmatch(
                r"mapping\.(mlp|global_mlp)\.l(\d+)\.fc(\d+)\.(weight|bias)",
                name)):
            net, i, j, leaf = m.groups()
            g = "global/" if net == "global_mlp" else ""
            tf[f"mapping/{g}Dense{i}_{j}/{leaf}"] = \
                a.T if leaf == "weight" else a
        elif (m := re.fullmatch(
                r"mapping\.(mlp|global_mlp)\.out_layer\.(weight|bias)", name)):
            net, leaf = m.groups()
            g = "global/" if net == "global_mlp" else ""
            tf[f"mapping/{g}Dense7/{leaf}"] = a.T if leaf == "weight" else a
        elif (m := re.fullmatch(r"mapping\.mlp\.sa(\d+)\.([a-z_2]+)\.?(weight|bias)?",
                                name)):
            i, sub, leaf = m.groups()
            suffix, arr = _att_to_tf(sub, leaf, a)
            tf[f"mapping/AttLayer_{i}/{suffix}"] = arr
        elif name == "synthesis.b4.const":
            tf["synthesis/4x4/Const/const"] = a[None]
        elif (m := re.fullmatch(r"synthesis\.b(\d+)\.conv(\d)\.(.+)", name)):
            r, i, rest = m.groups()
            tag = "Conv0_up" if i == "0" else ("Conv" if r == "4" else "Conv1")
            base = f"synthesis/{r}x{r}/{tag}"
            if rest == "weight":
                w = a.transpose(2, 3, 1, 0)
                if i == "0":
                    w = w[::-1, ::-1]
                tf[f"{base}/weight"] = w
            elif rest == "biasAct.bias":
                tf[f"{base}/bias"] = a
            elif rest == "noise_strength":
                tf[f"{base}/noise_strength"] = a
            elif rest == "affine.weight":
                tf[f"{base}/mod_weight"] = a.T
            elif rest == "affine.bias":
                tf[f"{base}/mod_bias"] = a - 1
            elif rest == "noise_const":
                n = 2 * int(math.log2(int(r))) - 5 + int(i)
                tf[f"synthesis/noise{n}"] = a[None, None]
            elif rest.startswith("transformer."):
                parts = rest.split(".")
                sub = parts[1]
                leaf = parts[2] if len(parts) > 2 else None
                suffix, arr = _att_to_tf(sub, leaf, a)
                tf[f"{base}/AttLayer_l2n/{suffix}"] = arr
            else:
                raise AssertionError(name)
        elif (m := re.fullmatch(
                r"synthesis\.b(\d+)\.torgb\.(weight|biasAct\.bias|affine\.weight|affine\.bias)",
                name)):
            r, rest = m.groups()
            base = f"synthesis/{r}x{r}/ToRGB"
            if rest == "weight":
                tf[f"{base}/weight"] = a.transpose(2, 3, 1, 0)
            elif rest == "biasAct.bias":
                tf[f"{base}/bias"] = a
            elif rest == "affine.weight":
                tf[f"{base}/mod_weight"] = a.T
            else:
                tf[f"{base}/mod_bias"] = a - 1
        elif (m := re.fullmatch(
                r"synthesis\.b(\d+)\.conv_last\.(weight|affine\.weight|affine\.bias)",
                name)):
            r, rest = m.groups()
            base = f"synthesis/{r}x{r}/ToRGB/extraLayer"
            if rest == "weight":
                tf[f"{base}/weight"] = a.transpose(2, 3, 1, 0)
            elif rest == "affine.weight":
                tf[f"{base}/mod_weight"] = a.T
            else:
                tf[f"{base}/mod_bias"] = a - 1
        elif (m := re.fullmatch(r"synthesis\.b(\d+)\.skip\.weight", name)):
            tf[f"synthesis/{m.group(1)}x{m.group(1)}/Skip/weight"] = \
                a.transpose(2, 3, 1, 0)[::-1, ::-1]
        else:
            raise AssertionError(f"no TF export rule for {name}")
    return tf


def test_tf_generator_name_map_round_trip():
    import jax

    from morphganformer_tpu.models import init_generator
    from tests.test_models import small_cfg
    from tools.convert_checkpoint import (
        map_generator_params, tf_generator_to_torch)

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)

    flat = _export_torch_layout(variables["params"])
    flat["mapping.w_avg"] = np.asarray(
        variables["moving_stats"]["mapping"]["w_avg"])
    flat.update(_export_torch_layout(variables.get("buffers", {})))

    tf_params = _torch_flat_to_tf_generator(flat)
    back, unmapped, arch = tf_generator_to_torch(
        tf_params, cfg.img_resolution, z_dim=cfg.z_dim)
    assert not unmapped, unmapped[:10]
    assert arch is None
    assert set(back) == set(flat)
    for name in flat:
        np.testing.assert_array_equal(np.asarray(back[name]),
                                      np.asarray(flat[name]), err_msg=name)

    converted, unmapped2 = map_generator_params(back)
    assert not unmapped2, unmapped2[:10]
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        node = converted
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                      err_msg=jax.tree_util.keystr(path))


def test_tf_discriminator_name_map_round_trip():
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.models.config import DiscriminatorConfig
    from morphganformer_tpu.models.discriminator import Discriminator
    from tools.convert_checkpoint import (
        map_discriminator_params, tf_discriminator_to_torch)

    cfg = DiscriminatorConfig(img_resolution=32, channel_base=512,
                              channel_max=64, mbstd_group_size=2)
    model = Discriminator(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((2, 32, 32, 3)))
    flat = _export_torch_layout(variables["params"])

    import re
    tf_params = {}
    for name, a in flat.items():
        a = np.asarray(a)
        if (m := re.fullmatch(r"b(\d+)\.fromrgb\.(weight|biasAct\.bias)", name)):
            r, leaf = m.groups()
            key = "weight" if leaf == "weight" else "bias"
            v = a.transpose(2, 3, 1, 0) if leaf == "weight" else a
            tf_params[f"{r}x{r}/FromRGB/{key}"] = v
        elif (m := re.fullmatch(r"b(\d+)\.conv(\d)\.(weight|biasAct\.bias)", name)):
            r, i, leaf = m.groups()
            tag = f"Conv{i}" if i == "0" else f"Conv{i}_down"
            key = "weight" if leaf == "weight" else "bias"
            v = a.transpose(2, 3, 1, 0) if leaf == "weight" else a
            tf_params[f"{r}x{r}/{tag}/{key}"] = v
        elif (m := re.fullmatch(r"b(\d+)\.skip\.weight", name)):
            r = m.group(1)
            tf_params[f"{r}x{r}/Skip/weight"] = a.transpose(2, 3, 1, 0)
        elif (m := re.fullmatch(r"b4\.conv\.(weight|biasAct\.bias)", name)):
            leaf = m.group(1)
            key = "weight" if leaf == "weight" else "bias"
            v = a.transpose(2, 3, 1, 0) if leaf == "weight" else a
            tf_params[f"4x4/Conv/{key}"] = v
        elif (m := re.fullmatch(r"b4\.fc\.(weight|bias)", name)):
            leaf = m.group(1)
            tf_params[f"4x4/Dense0/{leaf}"] = a.T if leaf == "weight" else a
        elif (m := re.fullmatch(r"b4\.out\.(weight|bias)", name)):
            leaf = m.group(1)
            tf_params[f"Output/{leaf}"] = a.T if leaf == "weight" else a
        else:
            raise AssertionError(f"no TF export rule for {name}")

    back, unmapped, arch = tf_discriminator_to_torch(tf_params,
                                                     cfg.img_resolution)
    assert not unmapped, unmapped
    assert set(back) == set(flat)

    converted, unmapped2 = map_discriminator_params(back)
    assert not unmapped2, unmapped2
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        node = converted
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                      err_msg=jax.tree_util.keystr(path))


def test_tf_legacy_tuple_pickle_end_to_end(tmp_path):
    """A (G, D, Gs) tuple pickle of tflib-Network-shaped stubs (reference
    load_network_pkl, loader.py:32-47) converts end to end via convert()."""
    import json
    import sys
    import types

    # Fake dnnlib.tflib.network.Network so pickle writes the legacy GLOBAL.
    class Network:
        pass

    mod = types.ModuleType("dnnlib.tflib.network")
    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"   # pickle save_global lookup
    mod.Network = Network
    tfl = types.ModuleType("dnnlib.tflib")
    dnn = sys.modules.get("dnnlib") or types.ModuleType("dnnlib")
    tfl.network = mod
    dnn.tflib = tfl
    sys.modules["dnnlib"] = dnn
    sys.modules["dnnlib.tflib"] = tfl
    sys.modules["dnnlib.tflib.network"] = mod

    rng = np.random.RandomState(0)

    def net(static_kwargs, variables, components=None):
        n = Network()
        n.__dict__.update(version=4, name="n", static_kwargs=static_kwargs,
                          components=components or {},
                          variables=list(variables.items()))
        return n

    g_vars = {
        "ltnt_emb/emb": rng.randn(4, 8).astype(np.float32),
        "dlatent_avg": rng.randn(8).astype(np.float32),
    }
    synth = net({}, {
        "4x4/Const/const": rng.randn(1, 16, 4, 4).astype(np.float32),
        "4x4/Conv/weight": rng.randn(3, 3, 16, 16).astype(np.float32),
        "4x4/Conv/bias": rng.randn(16).astype(np.float32),
        "4x4/Conv/mod_weight": rng.randn(8, 16).astype(np.float32),
        "4x4/Conv/mod_bias": rng.randn(16).astype(np.float32),
        "4x4/Conv/noise_strength": np.float32(0.3),
        "noise0": rng.randn(1, 1, 4, 4).astype(np.float32),
        "4x4/ToRGB/weight": rng.randn(1, 1, 16, 3).astype(np.float32),
        "4x4/ToRGB/bias": rng.randn(3).astype(np.float32),
        "4x4/ToRGB/mod_weight": rng.randn(8, 3).astype(np.float32),
        "4x4/ToRGB/mod_bias": rng.randn(3).astype(np.float32),
    })
    mapping = net({}, {
        "Dense0_0/weight": rng.randn(8, 8).astype(np.float32),
        "Dense0_0/bias": rng.randn(8).astype(np.float32),
        "Dense7/weight": rng.randn(8, 8).astype(np.float32),
        "Dense7/bias": rng.randn(8).astype(np.float32),
    })
    tf_g = net({"latent_size": 8, "dlatent_size": 8, "components_num": 4,
                "transformer": True, "resolution": 4, "fmap_base": 32,
                "fmap_max": 16, "mapping_resnet": True}, g_vars,
               components={"synthesis": synth, "mapping": mapping})
    tf_d = net({"resolution": 4, "fmap_base": 32, "fmap_max": 16}, {
        "4x4/FromRGB/weight": rng.randn(1, 1, 3, 16).astype(np.float32),
        "4x4/FromRGB/bias": rng.randn(16).astype(np.float32),
        "4x4/Conv/weight": rng.randn(3, 3, 17, 16).astype(np.float32),
        "4x4/Conv/bias": rng.randn(16).astype(np.float32),
        "4x4/Dense0/weight": rng.randn(16, 256).astype(np.float32).T,
        "4x4/Dense0/bias": rng.randn(16).astype(np.float32),
        "Output/weight": rng.randn(16, 1).astype(np.float32),
        "Output/bias": rng.randn(1).astype(np.float32),
    })

    pkl = tmp_path / "tf_snapshot.pkl"
    with open(pkl, "wb") as f:
        pickle.dump((tf_g, tf_d, tf_g), f)

    from tools.convert_checkpoint import convert
    out = str(tmp_path / "out")
    convert(str(pkl), out)

    with open(f"{out}/arch.json") as f:
        arch = json.load(f)
    assert arch["G"]["z_dim"] == 8 and arch["G"]["k"] == 5
    assert arch["G"]["channel_base"] == 64        # fmap_base * 2
    assert arch["D"]["channel_base"] == 64
    for role in ("G", "Gs", "D"):
        assert (tmp_path / "out" / f"{role}.msgpack").exists()

    # Spot-check the mod_bias+1 rule and the Conv weight transpose landed.
    from flax import serialization
    with open(f"{out}/Gs.msgpack", "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    got = tree["params"]["synthesis"]["b4"]["conv1"]["affine"]["bias"]
    want = dict(synth.variables)["4x4/Conv/mod_bias"] + 1
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_w = tree["params"]["synthesis"]["b4"]["conv1"]["weight"]
    # TF HWIO -> torch OIHW -> flax HWIO: identity overall.
    np.testing.assert_array_equal(got_w, dict(synth.variables)["4x4/Conv/weight"])
