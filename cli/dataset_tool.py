#!/usr/bin/env python
"""Dataset preparation tool.

Behavioral spec: dataset_tool.py in the reference — builds the per-LoD PNG
pyramid folder layout `out/{resolution}/*.png` consumed by
ImageFolderDataset (dataset_tool.py:66-77), with `display` / `compare`
self-check subcommands (:177-225). The reference's TensorFlow dependency
(legacy tfrecord readers) is dropped; input is any folder of images.

Subcommands:
  create_from_images <out_dir> <in_dir> --resolution 1024 [--lods N]
  display <dataset_dir> --resolution R
  compare <dataset_a> <dataset_b> --resolution R
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def _iter_images(in_dir):
    exts = ("*.png", "*.jpg", "*.jpeg", "*.bmp", "*.webp")
    files = []
    for e in exts:
        files += glob.glob(os.path.join(in_dir, "**", e), recursive=True)
    return sorted(files)


def create_from_images(out_dir, in_dir, resolution, lods=1, quality_check=True):
    """Center-crop/resize to `resolution` and write the PNG pyramid: full
    res plus `lods-1` halved levels (reference per-LoD export)."""
    files = _iter_images(in_dir)
    assert files, f"no images under {in_dir}"
    res_levels = [resolution // (2 ** i) for i in range(lods)]
    for r in res_levels:
        os.makedirs(os.path.join(out_dir, str(r)), exist_ok=True)
    for i, path in enumerate(files):
        img = Image.open(path).convert("RGB")
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2,
                        (w + s) // 2, (h + s) // 2))
        for r in res_levels:
            out = img.resize((r, r), Image.LANCZOS)
            out.save(os.path.join(out_dir, str(r), f"{i:08d}.png"))
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{len(files)}")
    print(f"wrote {len(files)} images at levels {res_levels} -> {out_dir}")


def display(dataset_dir, resolution, num=9):
    from morphganformer_tpu.data.dataset import ImageFolderDataset
    from morphganformer_tpu.utils.image import create_img_grid

    ds = ImageFolderDataset(dataset_dir, resolution)
    imgs = np.stack([ds[i][0] for i in range(min(num, len(ds)))])
    grid = create_img_grid(imgs.astype(np.float32) / 127.5 - 1.0)
    out = os.path.join(dataset_dir, f"preview_{resolution}.png")
    grid.save(out)
    print(f"{len(ds)} images; preview -> {out}")


def extract(dataset_dir, out_dir, resolution, num=None):
    """Dump prepared dataset items back to PNGs (reference dataset_tool.py
    extract subcommand)."""
    from PIL import Image

    from morphganformer_tpu.data.dataset import ImageFolderDataset

    ds = ImageFolderDataset(dataset_dir, resolution)
    os.makedirs(out_dir, exist_ok=True)
    n = len(ds) if num is None else min(num, len(ds))
    for i in range(n):
        img = ds[i][0]                              # [H, W, C] uint8
        Image.fromarray(img).save(
            os.path.join(out_dir, f"img{i:08d}.png"))
    print(f"extracted {n} images -> {out_dir}")


def compare(dir_a, dir_b, resolution, max_errors=10):
    """Item-by-item diff (reference dataset_tool.py compare subcommand)."""
    from morphganformer_tpu.data.dataset import ImageFolderDataset

    a = ImageFolderDataset(dir_a, resolution)
    b = ImageFolderDataset(dir_b, resolution)
    errors = 0
    if len(a) != len(b):
        print(f"size mismatch: {len(a)} vs {len(b)}")
        errors += 1
    for i in range(min(len(a), len(b))):
        ia, ib = a[i][0], b[i][0]
        if not np.array_equal(ia, ib):
            print(f"item {i} differs (max abs diff "
                  f"{np.abs(ia.astype(int) - ib.astype(int)).max()})")
            errors += 1
            if errors >= max_errors:
                print("...")
                break
    print("identical" if errors == 0 else f"{errors} differences")
    return errors


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create_from_images")
    c.add_argument("out_dir")
    c.add_argument("in_dir")
    c.add_argument("--resolution", type=int, default=1024)
    c.add_argument("--lods", type=int, default=1)

    d = sub.add_parser("display")
    d.add_argument("dataset_dir")
    d.add_argument("--resolution", type=int, required=True)

    cp = sub.add_parser("compare")
    cp.add_argument("dir_a")
    cp.add_argument("dir_b")
    cp.add_argument("--resolution", type=int, required=True)

    ex = sub.add_parser("extract")
    ex.add_argument("dataset_dir")
    ex.add_argument("out_dir")
    ex.add_argument("--resolution", type=int, required=True)
    ex.add_argument("--num", type=int, default=None)

    args = p.parse_args()
    if args.cmd == "create_from_images":
        create_from_images(args.out_dir, args.in_dir, args.resolution,
                           args.lods)
    elif args.cmd == "display":
        display(args.dataset_dir, args.resolution)
    elif args.cmd == "compare":
        sys.exit(1 if compare(args.dir_a, args.dir_b, args.resolution) else 0)
    elif args.cmd == "extract":
        extract(args.dataset_dir, args.out_dir, args.resolution, args.num)


if __name__ == "__main__":
    main()
