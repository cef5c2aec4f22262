#!/usr/bin/env python
"""Convert a reference MorphGANformer .pkl checkpoint to the native format.

Reads the reference's {G, D, Gs} pickles (loader.py:26-47) WITHOUT executing
the source code embedded by torch_utils/persistence (persistence.py:27-80):
a stub unpickler intercepts `_reconstruct_persistent_obj` and captures the
raw module state (parameters/buffers/init kwargs) instead of rebuilding live
nn.Modules. The captured torch tensors are then remapped onto the flax
variable tree:

  layout:   FC [out,in] -> [in,out];  conv OIHW -> HWIO;  const [C,4,4] ->
            [4,4,C];  noise_const -> 'buffers' collection;  w_avg ->
            'moving_stats'.
  naming:   the reference's module paths (mapping.global_mlp.l0.fc0.weight,
            synthesis.b64.conv0.transformer.to_queries.weight, ...) map 1:1
            onto this package's module tree (models/*.py keeps the names).

Usage: python tools/convert_checkpoint.py <snapshot.pkl> <out_dir>

Requires torch (CPU) only for tensor deserialization.
"""

import io
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class _PersistentStub:
    """Captures a persistence-pickled module without executing its source."""

    def __init__(self, meta):
        self.meta = meta

    @property
    def state(self):
        return self.meta["state"]


def _reconstruct_stub(meta):
    return _PersistentStub(meta)


class _StubUnpickler(pickle.Unpickler):
    """Map persistence/dnnlib internals to local stubs; everything else
    (torch tensor rebuilds, collections) resolves normally."""

    def find_class(self, module, name):
        if name == "_reconstruct_persistent_obj":
            return _reconstruct_stub
        if module.startswith("dnnlib") and name == "EasyDict":
            return dict
        if module == "dnnlib.tflib.network" and name == "Network":
            # Legacy TF pickles (loader.py:51-58) — captured as raw dicts.
            return dict
        return super().find_class(module, name)


def load_reference_pickle(path):
    """Return the raw {G, D, Gs} dict of _PersistentStub objects."""
    import torch  # noqa: F401  (needed for torch storage deserialization)

    with open(path, "rb") as f:
        data = f.read()
    # torch.load handles zipfile-format checkpoints; plain pickles fall back.
    try:
        import torch
        return torch.load(io.BytesIO(data), map_location="cpu",
                          pickle_module=_make_pickle_module(),
                          weights_only=False)
    except Exception:
        return _StubUnpickler(io.BytesIO(data)).load()


def _make_pickle_module():
    class _Mod:
        Unpickler = _StubUnpickler
        load = staticmethod(lambda f, **kw: _StubUnpickler(f).load())
        # torch.load probes these attributes.
        __name__ = "stub_pickle"
    return _Mod


def flatten_module_state(stub, prefix=""):
    """Walk a captured nn.Module state dict into {dotted_name: np.ndarray}.

    torch nn.Module state layout: _parameters / _buffers / _modules."""
    flat = {}
    state = stub.state if isinstance(stub, _PersistentStub) else stub
    if not isinstance(state, dict):
        return flat
    for coll in ("_parameters", "_buffers"):
        for name, tensor in (state.get(coll) or {}).items():
            if tensor is None:
                continue
            flat[prefix + name] = np.asarray(tensor.detach().cpu().numpy()
                                             if hasattr(tensor, "detach")
                                             else tensor)
    for name, child in (state.get("_modules") or {}).items():
        if child is None:
            continue
        child_state = child.state if isinstance(child, _PersistentStub) else \
            getattr(child, "__dict__", None)
        if child_state is None and isinstance(child, dict):
            child_state = child
        flat.update(flatten_module_state(
            _PersistentStub({"state": child_state}) if not isinstance(
                child, _PersistentStub) else child,
            prefix + name + "."))
    return flat


def get_init_kwargs(stub):
    state = stub.state
    kwargs = state.get("_init_kwargs", {}) or {}
    return dict(kwargs)


# ---------------------------------------------------------------------------
# Name mapping: reference torch module paths -> flax variable tree paths.
# ---------------------------------------------------------------------------

def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def map_generator_params(flat):
    """Map the flat torch name->array dict into flax collections
    {params, buffers, moving_stats}. Returns (variables, unmapped_names)."""
    params, buffers, stats = {}, {}, {}
    unmapped = []
    for name, arr in flat.items():
        parts = name.split(".")
        leaf = parts[-1]
        a = np.asarray(arr, dtype=np.float32)
        try:
            if name == "pos":
                _set(params, ("pos",), a)
            elif leaf == "w_avg":
                _set(stats, tuple(parts[:-1]) + ("w_avg",), a)
            elif leaf == "noise_const":
                _set(buffers, tuple(parts[:-1]) + ("noise_const",), a)
            elif leaf == "const":
                _set(params, tuple(parts), a.transpose(1, 2, 0))     # C44->44C
            elif leaf == "weight":
                if a.ndim == 2:                                       # FC
                    _set(params, tuple(parts), a.T)
                elif a.ndim == 4:                                     # conv
                    _set(params, tuple(parts), a.transpose(2, 3, 1, 0))
                else:
                    raise ValueError(f"odd weight rank {a.shape}")
            elif leaf == "bias":
                # biasAct.bias lives under the BiasAct submodule in flax too.
                _set(params, tuple(parts), a)
            elif leaf in ("noise_strength", "att_weight", "centroids"):
                _set(params, tuple(parts), a)
            elif leaf.startswith("pos") and leaf[3:].isdigit():
                _set(params, tuple(parts), a)                         # grid_pos
            elif leaf == "resample_kernel" or leaf == "grid_pos":
                pass                                                   # static
            else:
                raise ValueError("unknown leaf")
        except Exception:
            unmapped.append(name)
    variables = {"params": params}
    if buffers:
        variables["buffers"] = buffers
    if stats:
        variables["moving_stats"] = stats
    return variables, unmapped


def convert(pkl_path, out_dir):
    from morphganformer_tpu.checkpoint.io import save_generator
    from morphganformer_tpu.models.config import (
        AttentionConfig, GANformerConfig, MappingConfig)

    nets = load_reference_pickle(pkl_path)
    for role in ("Gs", "G"):
        if role not in nets:
            continue
        stub = nets[role]
        kwargs = get_init_kwargs(stub)
        flat = flatten_module_state(stub)
        mk = dict(kwargs.get("mapping_kwargs", {}))
        sk = dict(kwargs.get("synthesis_kwargs", {}))
        cfg = GANformerConfig(
            z_dim=kwargs.get("z_dim", 32), c_dim=kwargs.get("c_dim", 0),
            w_dim=kwargs.get("w_dim", 32), k=kwargs.get("k", 17),
            img_resolution=kwargs.get("img_resolution", 1024),
            img_channels=kwargs.get("img_channels", 3),
            channel_base=sk.get("channel_base", 32 << 10),
            channel_max=sk.get("channel_max", 512),
            architecture=sk.get("architecture", "skip"),
            latent_stem=sk.get("latent_stem", False),
            style=sk.get("style", True),
            local_noise=sk.get("local_noise", True),
            act=sk.get("act", "lrelu"),
            transformer=sk.get("transformer", True),
            start_res=sk.get("start_res", 0), end_res=sk.get("end_res", 8),
            mapping=MappingConfig(
                num_layers=mk.get("num_layers", 8),
                layer_dim=mk.get("layer_dim"),
                act=mk.get("act", "lrelu"), lrmul=mk.get("lrmul", 0.01),
                w_avg_beta=mk.get("w_avg_beta", 0.995),
                resnet=mk.get("resnet", False),
                ltnt2ltnt=mk.get("ltnt2ltnt", False),
                normalize_global=mk.get("normalize_global", True),
                use_pos=mk.get("use_pos", False)),
            attention=AttentionConfig(
                num_heads=sk.get("num_heads", 1),
                dropout=sk.get("attention_dropout", 0.12),
                integration=sk.get("integration", "add"),
                norm=sk.get("norm"), kmeans=sk.get("kmeans", False),
                kmeans_iters=sk.get("kmeans_iters", 1),
                iterative=sk.get("iterative", False),
                pos_dim=sk.get("pos_dim"),
                pos_type=sk.get("pos_type", "sinus"),
                pos_init=sk.get("pos_init", "uniform"),
                pos_directions_num=sk.get("pos_directions_num", 2)),
        )
        variables, unmapped = map_generator_params(flat)
        if unmapped:
            print(f"[{role}] WARNING unmapped params: {unmapped[:20]}"
                  f"{'...' if len(unmapped) > 20 else ''}")
        save_generator(out_dir, cfg, variables, role=role)
        print(f"[{role}] converted {len(flat) - len(unmapped)} tensors "
              f"-> {out_dir}")
    print("done")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    convert(sys.argv[1], sys.argv[2])
