#!/usr/bin/env python
"""Convert the reference's MDF discriminator pickles to a JAX-readable .npz.

The reference's mdf-main/weights/Ds_{SISR,Denoising,JPEG}.pth files are
torch pickles of a list of SinGAN WDiscriminators (mdfloss.py:9-14,
SinGAN/models.py:15-38). This reads them (torch CPU), folds each
BatchNorm's running stats into scale/shift, and writes arrays named
  d{i}_head_{w,b,bn_scale,bn_shift}, d{i}_body{j}_..., d{i}_tail_{w,b}
for morphganformer_tpu.losses.mdf.load_mdf_params.

Usage: python tools/convert_mdf.py Ds_SISR.pth out/mdf_sisr.npz
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _hwio(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0), np.float32)


def fold_bn(weight, bias, mean, var, eps=1e-5):
    scale = np.asarray(weight, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps)
    shift = np.asarray(bias, np.float32) - scale * np.asarray(mean, np.float32)
    return scale, shift


def convert(path, out_path):
    import torch

    ds = torch.load(path, map_location="cpu")
    out = {}
    for i, d in enumerate(ds):
        sd = d.state_dict() if hasattr(d, "state_dict") else d
        sd = {k: np.asarray(v) for k, v in sd.items()}
        out[f"d{i}_head_w"] = _hwio(sd["head.conv.weight"])
        out[f"d{i}_head_b"] = np.asarray(sd["head.conv.bias"], np.float32)
        out[f"d{i}_head_bn_scale"], out[f"d{i}_head_bn_shift"] = fold_bn(
            sd["head.norm.weight"], sd["head.norm.bias"],
            sd["head.norm.running_mean"], sd["head.norm.running_var"])
        j = 1
        while f"body.block{j}.conv.weight" in sd:
            pre = f"body.block{j}"
            out[f"d{i}_body{j - 1}_w"] = _hwio(sd[f"{pre}.conv.weight"])
            out[f"d{i}_body{j - 1}_b"] = np.asarray(sd[f"{pre}.conv.bias"],
                                                    np.float32)
            (out[f"d{i}_body{j - 1}_bn_scale"],
             out[f"d{i}_body{j - 1}_bn_shift"]) = fold_bn(
                sd[f"{pre}.norm.weight"], sd[f"{pre}.norm.bias"],
                sd[f"{pre}.norm.running_mean"], sd[f"{pre}.norm.running_var"])
            j += 1
        out[f"d{i}_tail_w"] = _hwio(sd["tail.weight"])
        out[f"d{i}_tail_b"] = np.asarray(sd["tail.bias"], np.float32)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: {len(ds)} discriminators, {len(out)} arrays")


def load_mdf_params(path):
    """Load converted .npz into the losses.mdf params structure."""
    import jax.numpy as jnp

    data = np.load(path)
    ds = []
    i = 0
    while f"d{i}_head_w" in data:
        d = {"head": {"w": jnp.asarray(data[f"d{i}_head_w"]),
                      "b": jnp.asarray(data[f"d{i}_head_b"]),
                      "bn_scale": jnp.asarray(data[f"d{i}_head_bn_scale"]),
                      "bn_shift": jnp.asarray(data[f"d{i}_head_bn_shift"])},
             "body": []}
        j = 0
        while f"d{i}_body{j}_w" in data:
            d["body"].append({
                "w": jnp.asarray(data[f"d{i}_body{j}_w"]),
                "b": jnp.asarray(data[f"d{i}_body{j}_b"]),
                "bn_scale": jnp.asarray(data[f"d{i}_body{j}_bn_scale"]),
                "bn_shift": jnp.asarray(data[f"d{i}_body{j}_bn_shift"])})
            j += 1
        d["tail_w"] = jnp.asarray(data[f"d{i}_tail_w"])
        d["tail_b"] = jnp.asarray(data[f"d{i}_tail_b"])
        ds.append(d)
        i += 1
    return ds


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    convert(sys.argv[1], sys.argv[2])
