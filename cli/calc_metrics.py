#!/usr/bin/env python
"""Standalone metric calculation CLI.

The reference's calc_metrics.py is broken as shipped (imports a nonexistent
`legacy` module, calls a nonexistent metric_main.calc_metric —
SURVEY.md §2.7); this wires the same CLI surface into the working registry
(morphganformer_tpu.metrics.registry), plus batched PSNR/SSIM morph QA.

Usage:
  python cli/calc_metrics.py --model <ckpt> --data <dataset_dir> \
      --metrics fid2k_full kid50k_full --detector <detector.npz|raw>
  python cli/calc_metrics.py --morph-qa --dir-a <recons> --dir-b <targets>
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def raw_pixel_detector(max_dim=256):
    from morphganformer_tpu.metrics.detector import raw_pixel_detector as f
    return f(max_dim)


def dataset_batches(path, resolution, batch=16, max_items=None):
    from morphganformer_tpu.data.dataset import ImageFolderDataset

    ds = ImageFolderDataset(path, resolution, max_items=max_items)
    n = len(ds)
    for i in range(0, n, batch):
        import numpy as np
        imgs = np.stack([ds[j][0] for j in range(i, min(i + batch, n))])
        yield imgs


def morph_qa(dir_a, dir_b, size=None):
    """Batched PSNR/SSIM between paired image dirs (morph QA vs reference)."""
    import jax.numpy as jnp
    import numpy as np

    from morphganformer_tpu.losses.pixel import psnr, ssim
    from morphganformer_tpu.utils.image import load_target

    files_a = sorted(glob.glob(os.path.join(dir_a, "*.png")))
    files_b = sorted(glob.glob(os.path.join(dir_b, "*.png")))
    assert len(files_a) == len(files_b) and files_a, \
        f"paired dirs mismatch: {len(files_a)} vs {len(files_b)}"
    psnrs, ssims = [], []
    for fa, fb in zip(files_a, files_b):
        from PIL import Image
        sz = size or Image.open(fa).size[0]
        a = jnp.asarray(load_target(fa, sz))
        b = jnp.asarray(load_target(fb, sz))
        psnrs.append(float(psnr(a, b)))
        ssims.append(float(ssim(a, b)))
    return {"psnr_mean": float(np.mean(psnrs)),
            "ssim_mean": float(np.mean(ssims)),
            "num_pairs": len(psnrs)}


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Compute quality metrics")
    p.add_argument("--model", help="Generator checkpoint dir (or init:<res>)")
    p.add_argument("--data", help="Dataset root (path/{res}/*.png)")
    p.add_argument("--metrics", nargs="+", default=["fid2k_full"])
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--run-dir", default=None)
    p.add_argument("--detector", default="auto",
                   help='"auto" (converted InceptionV3 via $MGT_INCEPTION_NPZ'
                        ' or the cache, else raw pixels), "raw", or an .npz')
    # Morph QA mode.
    p.add_argument("--morph-qa", action="store_true")
    p.add_argument("--dir-a")
    p.add_argument("--dir-b")
    p.add_argument("--size", type=int, default=None)
    args = p.parse_args()

    if args.morph_qa:
        import json
        print(json.dumps(morph_qa(args.dir_a, args.dir_b, args.size)))
        return

    from cli.generate import get_model
    from morphganformer_tpu.metrics.registry import compute_metric, report_metric

    from morphganformer_tpu.metrics.detector import resolve_detector

    cfg, model, variables = get_model(args.model)
    kind = "probs" if any(m.startswith("is") for m in args.metrics) \
        else "features"
    detector = resolve_detector(args.detector, kind=kind)

    for metric in args.metrics:
        dataset = dataset_batches(args.data, cfg.img_resolution,
                                  batch=args.batch, max_items=args.max_items)
        kwargs = dict(detector=detector, dataset=dataset,
                      G=(model, variables, cfg), batch=args.batch)
        if args.max_items:
            kwargs["max_items"] = args.max_items
        result = compute_metric(metric, **kwargs)
        report_metric(result, run_dir=args.run_dir)


if __name__ == "__main__":
    main()
