#!/usr/bin/env python
"""Convert an ArcFace iresnet torch state_dict to the JAX pytree .npz.

The reference ships the backbone family at backbones/iresnet.py and a
get_model registry (backbones/__init__.py:5-25); the insightface-trained
weights (.pth state_dicts) convert here: conv OIHW->HWIO, BatchNorm folded
to scale/shift, PReLU slopes kept, fc [out,in]->[in,out].

Usage: python tools/convert_iresnet.py iresnet18 backbone.pth out/iresnet18.npz
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from morphganformer_tpu.losses.face_embedding import IRESNET_LAYERS


def _hwio(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0), np.float32)


def fold_bn(sd, prefix, eps=1e-5):
    scale = np.asarray(sd[f"{prefix}.weight"], np.float32) / np.sqrt(
        np.asarray(sd[f"{prefix}.running_var"], np.float32) + eps)
    shift = np.asarray(sd[f"{prefix}.bias"], np.float32) - scale * np.asarray(
        sd[f"{prefix}.running_mean"], np.float32)
    return {"scale": scale, "shift": shift}


def convert_state_dict(name, sd):
    layers = IRESNET_LAYERS[name]
    flat = {}

    def put(path, arr):
        flat[path] = np.asarray(arr, np.float32)

    put("conv1_w", _hwio(sd["conv1.weight"]))
    bn = fold_bn(sd, "bn1")
    put("bn1_scale", bn["scale"]); put("bn1_shift", bn["shift"])
    put("prelu", sd["prelu.weight"])
    for li, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            pre = f"layer{li}.{bi}"
            tag = f"layer{li}_{bi}"
            for bnn in ("bn1", "bn2", "bn3"):
                bn = fold_bn(sd, f"{pre}.{bnn}")
                put(f"{tag}_{bnn}_scale", bn["scale"])
                put(f"{tag}_{bnn}_shift", bn["shift"])
            put(f"{tag}_conv1", _hwio(sd[f"{pre}.conv1.weight"]))
            put(f"{tag}_conv2", _hwio(sd[f"{pre}.conv2.weight"]))
            put(f"{tag}_prelu", sd[f"{pre}.prelu.weight"])
            if f"{pre}.downsample.0.weight" in sd:
                put(f"{tag}_down_w", _hwio(sd[f"{pre}.downsample.0.weight"]))
                bn = fold_bn(sd, f"{pre}.downsample.1")
                put(f"{tag}_down_scale", bn["scale"])
                put(f"{tag}_down_shift", bn["shift"])
    bn = fold_bn(sd, "bn2")
    put("bn2_scale", bn["scale"]); put("bn2_shift", bn["shift"])
    put("fc_w", np.asarray(sd["fc.weight"], np.float32).T)
    put("fc_b", sd["fc.bias"])
    # features BatchNorm1d (weight frozen at 1, iresnet.py:100-102).
    scale = np.asarray(sd["features.weight"], np.float32) / np.sqrt(
        np.asarray(sd["features.running_var"], np.float32) + 1e-5)
    put("feat_scale", scale)
    put("feat_shift", np.asarray(sd["features.bias"], np.float32)
        - scale * np.asarray(sd["features.running_mean"], np.float32))
    return flat


def load_iresnet_npz(path, name="iresnet18"):
    """Rebuild the losses.face_embedding params tree from the flat .npz."""
    import jax.numpy as jnp

    data = np.load(path)
    layers = IRESNET_LAYERS[name]
    p = {"conv1_w": jnp.asarray(data["conv1_w"]),
         "bn1": {"scale": jnp.asarray(data["bn1_scale"]),
                 "shift": jnp.asarray(data["bn1_shift"])},
         "prelu": jnp.asarray(data["prelu"])}
    for li, blocks in enumerate(layers, start=1):
        layer = []
        for bi in range(blocks):
            tag = f"layer{li}_{bi}"
            blk = {"conv1": jnp.asarray(data[f"{tag}_conv1"]),
                   "conv2": jnp.asarray(data[f"{tag}_conv2"]),
                   "prelu": jnp.asarray(data[f"{tag}_prelu"])}
            for bnn in ("bn1", "bn2", "bn3"):
                blk[bnn] = {"scale": jnp.asarray(data[f"{tag}_{bnn}_scale"]),
                            "shift": jnp.asarray(data[f"{tag}_{bnn}_shift"])}
            if f"{tag}_down_w" in data:
                blk["down_w"] = jnp.asarray(data[f"{tag}_down_w"])
                blk["down_bn"] = {
                    "scale": jnp.asarray(data[f"{tag}_down_scale"]),
                    "shift": jnp.asarray(data[f"{tag}_down_shift"])}
            layer.append(blk)
        p[f"layer{li}"] = layer
    p["bn2"] = {"scale": jnp.asarray(data["bn2_scale"]),
                "shift": jnp.asarray(data["bn2_shift"])}
    p["fc_w"] = jnp.asarray(data["fc_w"])
    p["fc_b"] = jnp.asarray(data["fc_b"])
    p["feat_scale"] = jnp.asarray(data["feat_scale"])
    p["feat_shift"] = jnp.asarray(data["feat_shift"])
    return p


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    import torch

    sd = torch.load(sys.argv[2], map_location="cpu")
    flat = convert_state_dict(sys.argv[1], sd)
    np.savez(sys.argv[3], **flat)
    print(f"wrote {sys.argv[3]}: {len(flat)} arrays")
