#!/usr/bin/env python
"""Convert torchvision InceptionV3 weights to the JAX FID detector .npz.

Usage: python tools/convert_inception.py <inception_v3_state_dict.pth> out.npz
(without an argument .pth, tries torchvision's pretrained download).

Layout: conv OIHW->HWIO, BatchNorm folded into scale/shift, fc transposed.
Consumed by morphganformer_tpu.metrics.inception.load_inception_npz.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# torchvision module path -> our param tree tag.
_BLOCK_MAP = {
    "Conv2d_1a_3x3": ("c1a",), "Conv2d_2a_3x3": ("c2a",),
    "Conv2d_2b_3x3": ("c2b",), "Conv2d_3b_1x1": ("c3b",),
    "Conv2d_4a_3x3": ("c4a",),
}

_A_BRANCHES = {"branch1x1": "b1x1", "branch5x5_1": "b5_1",
               "branch5x5_2": "b5_2", "branch3x3dbl_1": "b3_1",
               "branch3x3dbl_2": "b3_2", "branch3x3dbl_3": "b3_3",
               "branch_pool": "bpool"}
_B_BRANCHES = {"branch3x3": "b3", "branch3x3dbl_1": "bd_1",
               "branch3x3dbl_2": "bd_2", "branch3x3dbl_3": "bd_3"}
_C_BRANCHES = {"branch1x1": "b1x1", "branch7x7_1": "b7_1",
               "branch7x7_2": "b7_2", "branch7x7_3": "b7_3",
               "branch7x7dbl_1": "bd_1", "branch7x7dbl_2": "bd_2",
               "branch7x7dbl_3": "bd_3", "branch7x7dbl_4": "bd_4",
               "branch7x7dbl_5": "bd_5", "branch_pool": "bpool"}
_D_BRANCHES = {"branch3x3_1": "b3_1", "branch3x3_2": "b3_2",
               "branch7x7x3_1": "b7_1", "branch7x7x3_2": "b7_2",
               "branch7x7x3_3": "b7_3", "branch7x7x3_4": "b7_4"}
_E_BRANCHES = {"branch1x1": "b1x1", "branch3x3_1": "b3_1",
               "branch3x3_2a": "b3_2a", "branch3x3_2b": "b3_2b",
               "branch3x3dbl_1": "bd_1", "branch3x3dbl_2": "bd_2",
               "branch3x3dbl_3a": "bd_3a", "branch3x3dbl_3b": "bd_3b",
               "branch_pool": "bpool"}

_MIXED = {
    "Mixed_5b": ("m5b", _A_BRANCHES), "Mixed_5c": ("m5c", _A_BRANCHES),
    "Mixed_5d": ("m5d", _A_BRANCHES), "Mixed_6a": ("m6a", _B_BRANCHES),
    "Mixed_6b": ("m6b", _C_BRANCHES), "Mixed_6c": ("m6c", _C_BRANCHES),
    "Mixed_6d": ("m6d", _C_BRANCHES), "Mixed_6e": ("m6e", _C_BRANCHES),
    "Mixed_7a": ("m7a", _D_BRANCHES), "Mixed_7b": ("m7b", _E_BRANCHES),
    "Mixed_7c": ("m7c", _E_BRANCHES),
}


def _conv_bn(sd, prefix, eps=1e-3):
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float32)
    scale = np.asarray(sd[f"{prefix}.bn.weight"], np.float32) / np.sqrt(
        np.asarray(sd[f"{prefix}.bn.running_var"], np.float32) + eps)
    shift = np.asarray(sd[f"{prefix}.bn.bias"], np.float32) - scale * \
        np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
    return {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "scale": scale, "shift": shift}


def convert_state_dict(sd):
    flat = {}

    def put(tag, sub):
        d = _conv_bn(sd, sub)
        flat[f"{tag}_w"] = d["w"]
        flat[f"{tag}_scale"] = d["scale"]
        flat[f"{tag}_shift"] = d["shift"]

    for tv_name, (tag,) in _BLOCK_MAP.items():
        put(tag, tv_name)
    for tv_name, (tag, branches) in _MIXED.items():
        for tv_branch, our_branch in branches.items():
            put(f"{tag}.{our_branch}", f"{tv_name}.{tv_branch}")
    flat["fc_w"] = np.asarray(sd["fc.weight"], np.float32).T
    flat["fc_b"] = np.asarray(sd["fc.bias"], np.float32)
    return flat


from morphganformer_tpu.metrics.inception import load_inception_npz  # noqa: F401,E402 (re-export; loader lives in the package now)


if __name__ == "__main__":
    import torch

    if len(sys.argv) == 3:
        sd = torch.load(sys.argv[1], map_location="cpu")
        out = sys.argv[2]
    else:
        import torchvision.models as tvm
        sd = tvm.inception_v3(pretrained=True).state_dict()
        out = sys.argv[1]
    flat = convert_state_dict(sd)
    np.savez(out, **flat)
    print(f"wrote {out}: {len(flat)} arrays")
