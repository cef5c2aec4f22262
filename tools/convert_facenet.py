#!/usr/bin/env python
"""Convert facenet_pytorch InceptionResnetV1 (VGGFace2) weights to .npz.

Usage: python tools/convert_facenet.py <state_dict.pt> out/facenet.npz
Layout: conv OIHW->HWIO, BN folded to scale/shift; naming follows
morphganformer_tpu.losses.facenet's parameter tree.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _hwio(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0), np.float32)


def _cb(sd, prefix, eps=1e-3):
    scale = np.asarray(sd[f"{prefix}.bn.weight"], np.float32) / np.sqrt(
        np.asarray(sd[f"{prefix}.bn.running_var"], np.float32) + eps)
    shift = np.asarray(sd[f"{prefix}.bn.bias"], np.float32) - scale * \
        np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
    return {"w": _hwio(sd[f"{prefix}.conv.weight"]), "scale": scale,
            "shift": shift}


def _cv(sd, prefix):
    return {"w": _hwio(sd[f"{prefix}.weight"]),
            "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _flat(d, prefix, out):
    for k, v in d.items():
        out[f"{prefix}.{k}"] = v


def convert_state_dict(sd):
    flat = {}

    def put(tag, d):
        _flat(d, tag, flat)

    for tag in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                "conv2d_4a", "conv2d_4b"):
        put(tag, _cb(sd, tag))
    for i in range(5):
        pre = f"repeat_1.{i}"
        put(f"repeat_1.{i}.b0", _cb(sd, f"{pre}.branch0"))
        put(f"repeat_1.{i}.b1_0", _cb(sd, f"{pre}.branch1.0"))
        put(f"repeat_1.{i}.b1_1", _cb(sd, f"{pre}.branch1.1"))
        put(f"repeat_1.{i}.b2_0", _cb(sd, f"{pre}.branch2.0"))
        put(f"repeat_1.{i}.b2_1", _cb(sd, f"{pre}.branch2.1"))
        put(f"repeat_1.{i}.b2_2", _cb(sd, f"{pre}.branch2.2"))
        put(f"repeat_1.{i}.conv2d", _cv(sd, f"{pre}.conv2d"))
    put("mixed_6a.b0", _cb(sd, "mixed_6a.branch0"))
    put("mixed_6a.b1_0", _cb(sd, "mixed_6a.branch1.0"))
    put("mixed_6a.b1_1", _cb(sd, "mixed_6a.branch1.1"))
    put("mixed_6a.b1_2", _cb(sd, "mixed_6a.branch1.2"))
    for i in range(10):
        pre = f"repeat_2.{i}"
        put(f"repeat_2.{i}.b0", _cb(sd, f"{pre}.branch0"))
        put(f"repeat_2.{i}.b1_0", _cb(sd, f"{pre}.branch1.0"))
        put(f"repeat_2.{i}.b1_1", _cb(sd, f"{pre}.branch1.1"))
        put(f"repeat_2.{i}.b1_2", _cb(sd, f"{pre}.branch1.2"))
        put(f"repeat_2.{i}.conv2d", _cv(sd, f"{pre}.conv2d"))
    put("mixed_7a.b0_0", _cb(sd, "mixed_7a.branch0.0"))
    put("mixed_7a.b0_1", _cb(sd, "mixed_7a.branch0.1"))
    put("mixed_7a.b1_0", _cb(sd, "mixed_7a.branch1.0"))
    put("mixed_7a.b1_1", _cb(sd, "mixed_7a.branch1.1"))
    put("mixed_7a.b2_0", _cb(sd, "mixed_7a.branch2.0"))
    put("mixed_7a.b2_1", _cb(sd, "mixed_7a.branch2.1"))
    put("mixed_7a.b2_2", _cb(sd, "mixed_7a.branch2.2"))
    for i in range(5):
        pre = f"repeat_3.{i}"
        put(f"repeat_3.{i}.b0", _cb(sd, f"{pre}.branch0"))
        put(f"repeat_3.{i}.b1_0", _cb(sd, f"{pre}.branch1.0"))
        put(f"repeat_3.{i}.b1_1", _cb(sd, f"{pre}.branch1.1"))
        put(f"repeat_3.{i}.b1_2", _cb(sd, f"{pre}.branch1.2"))
        put(f"repeat_3.{i}.conv2d", _cv(sd, f"{pre}.conv2d"))
    put("block8.b0", _cb(sd, "block8.branch0"))
    put("block8.b1_0", _cb(sd, "block8.branch1.0"))
    put("block8.b1_1", _cb(sd, "block8.branch1.1"))
    put("block8.b1_2", _cb(sd, "block8.branch1.2"))
    put("block8.conv2d", _cv(sd, "block8.conv2d"))
    flat["last_w"] = np.asarray(sd["last_linear.weight"], np.float32).T
    scale = np.asarray(sd["last_bn.weight"], np.float32) / np.sqrt(
        np.asarray(sd["last_bn.running_var"], np.float32) + 1e-3)
    flat["last_bn_scale"] = scale
    flat["last_bn_shift"] = np.asarray(sd["last_bn.bias"], np.float32) - \
        scale * np.asarray(sd["last_bn.running_mean"], np.float32)
    out = {}
    for name, val in flat.items():
        if isinstance(val, dict):
            for leaf, arr in val.items():
                out[f"{name}_{leaf}"] = arr
        else:
            out[name] = val
    return out


def load_facenet_npz(path):
    """Rebuild the losses.facenet params tree from a converted .npz."""
    import jax.numpy as jnp

    data = np.load(path)
    p = {"repeat_1": [dict() for _ in range(5)],
         "repeat_2": [dict() for _ in range(10)],
         "repeat_3": [dict() for _ in range(5)],
         "mixed_6a": {}, "mixed_7a": {}, "block8": {}}
    for key in data.files:
        val = jnp.asarray(data[key])
        if key in ("last_w", "last_bn_scale", "last_bn_shift"):
            p[key] = val
            continue
        name, leaf = key.rsplit("_", 1)
        parts = name.split(".")
        if parts[0].startswith("repeat"):
            node = p[parts[0]][int(parts[1])].setdefault(parts[2], {})
        elif parts[0] in ("mixed_6a", "mixed_7a", "block8"):
            node = p[parts[0]].setdefault(parts[1], {})
        else:
            node = p.setdefault(parts[0], {})
        node[leaf] = val
    return p


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    import torch

    sd = torch.load(sys.argv[1], map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = convert_state_dict(sd)
    np.savez(sys.argv[2], **out)
    print(f"wrote {sys.argv[2]}: {len(out)} arrays")
