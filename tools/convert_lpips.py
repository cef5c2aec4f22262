#!/usr/bin/env python
"""Convert LPIPS weights (torchvision tower + reference linear heads) to .npz.

The reference bundles the calibration heads at lpips/weights/v0.1/{alex,vgg,
squeeze}.pth (keys lin{k}.model.1.weight, shape [1, C, 1, 1]); the feature
towers are torchvision-pretrained. This tool reads both (torch CPU) and
writes the flat .npz consumed by morphganformer_tpu.losses.lpips:

  tower conv weights -> HWIO float32 under the names w{i}/b{i}
  (w{i}_s/e1/e3 for squeeze fire modules), heads -> lin{k} [C].

Usage:
  python tools/convert_lpips.py alex out/lpips_alex.npz \
      [--lins /root/reference/lpips/weights/v0.1/alex.pth] \
      [--tower /path/to/alexnet_torchvision_state_dict.pth]

Without --tower this tries torchvision's pretrained download (needs network).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _hwio(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0),
                                dtype=np.float32)


def convert_tower(net, state):
    """torchvision features.* state_dict -> lpips.py param names."""
    out = {}
    if net == "vgg":
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for i, li in enumerate(conv_idx):
            out[f"w{i}"] = _hwio(state[f"features.{li}.weight"])
            out[f"b{i}"] = np.asarray(state[f"features.{li}.bias"], np.float32)
    elif net == "alex":
        conv_idx = [0, 3, 6, 8, 10]
        for i, li in enumerate(conv_idx):
            out[f"w{i}"] = _hwio(state[f"features.{li}.weight"])
            out[f"b{i}"] = np.asarray(state[f"features.{li}.bias"], np.float32)
    elif net == "squeeze":
        out["w0"] = _hwio(state["features.0.weight"])
        out["b0"] = np.asarray(state["features.0.bias"], np.float32)
        fire_idx = [3, 4, 6, 7, 9, 10, 11, 12]  # squeezenet1_1 fire modules
        for n, li in enumerate(fire_idx, start=1):
            for tag, tname in (("s", "squeeze"), ("e1", "expand1x1"),
                               ("e3", "expand3x3")):
                out[f"w{n}_{tag}"] = _hwio(state[f"features.{li}.{tname}.weight"])
                out[f"b{n}_{tag}"] = np.asarray(
                    state[f"features.{li}.{tname}.bias"], np.float32)
    else:
        raise ValueError(net)
    return out


def convert_lins(path):
    import torch
    # The bundled v0.1 heads are plain tensor state dicts; weights_only=True
    # loads them without any pickle code execution (reference
    # lpips/__init__.py:31-41 loads these same files).
    state = torch.load(path, map_location="cpu", weights_only=True)
    lins = {}
    k = 0
    while f"lin{k}.model.1.weight" in state:
        w = np.asarray(state[f"lin{k}.model.1.weight"], np.float32)
        lins[f"lin{k}"] = w.reshape(-1)  # [1,C,1,1] -> [C]
        k += 1
    assert lins, f"no lin heads in {path}"
    return lins


def main():
    p = argparse.ArgumentParser()
    p.add_argument("net", choices=["alex", "vgg", "squeeze"])
    p.add_argument("out")
    p.add_argument("--lins", default=None,
                   help="Reference lpips/weights/v0.1/<net>.pth")
    p.add_argument("--tower", default=None,
                   help="torchvision state_dict .pth for the tower, or "
                        "'none' for a heads-only npz (the reference bundles "
                        "only the calibration heads; towers come from "
                        "torchvision, absent in a zero-egress env)")
    args = p.parse_args()

    if args.tower == "none":
        out = {}
    elif args.tower:
        import torch
        tower_state = torch.load(args.tower, map_location="cpu",
                                 weights_only=True)
        if hasattr(tower_state, "state_dict"):
            tower_state = tower_state.state_dict()
        out = convert_tower(args.net, tower_state)
    else:
        import torchvision.models as tvm
        model = {"alex": tvm.alexnet, "vgg": tvm.vgg16,
                 "squeeze": tvm.squeezenet1_1}[args.net](pretrained=True)
        out = convert_tower(args.net, model.state_dict())
    lins_path = args.lins or f"/root/reference/lpips/weights/v0.1/{args.net}.pth"
    out.update(convert_lins(lins_path))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
