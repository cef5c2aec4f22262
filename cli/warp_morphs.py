#!/usr/bin/env python
"""Post-hoc landmark-Delaunay warp of GAN morphs.

The reference's 1024_warp_morphs.py: for each generated morph, average the
two bona fide landmark sets, Delaunay-triangulate the averaged landmarks
(+12 border anchors), and piecewise-affine-warp the morph onto the averaged
geometry (1024_warp_morphs.py:157-210). Landmarks come either from
precomputed CSVs (the format written by the reference's
AdaptiveWingLoss/facial_landmarks_2.py extractor) or from the bundled /
converted landmark network (--landmark-weights / --predict-landmarks).

    python cli/warp_morphs.py --morph m.png --img-a a.png --img-b b.png \
        --predict-landmarks --out warped/
    python cli/warp_morphs.py --morph m.png \
        --landmarks-morph m.csv --landmarks-a a.csv --landmarks-b b.csv
    python cli/warp_morphs.py --batch-list triples.txt --out warped/
        # each line: morph.png,a_landmarks.csv,b_landmarks.csv[,morph.csv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_img(path):
    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)


def _save_img(path, img):
    import numpy as np
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.clip(img, 0, 255).astype("uint8")).save(path)


def _predictor(args):
    """img uint8-range HWC -> [68, 2] (x, y) pixel landmarks via the
    landmark network (losses/landmarks.py)."""
    import jax.numpy as jnp
    import numpy as np

    from morphganformer_tpu.losses.landmarks import (
        bundled_landmark_path, load_landmark_npz, make_landmark_fn)

    path = args.landmark_weights or bundled_landmark_path()
    if path is None:
        raise SystemExit("--predict-landmarks needs --landmark-weights "
                         "(no bundled landmark model found)")
    fn = make_landmark_fn(load_landmark_npz(path), temperature=0.05)

    def predict(img):
        x = jnp.asarray(img[None] / 127.5 - 1.0)
        unit = np.asarray(fn(x))[0]          # [68, 2] in [0, 1], (x, y)
        h, w = img.shape[:2]
        # Scale by size (not size-1): the library convention
        # (make_landmark_fn(params, image_size) multiplies by image_size,
        # with soft_argmax cell centers at (i+0.5)/n) — keeps predicted
        # landmarks consistent with library-produced ones.
        return unit * np.asarray([w, h], dtype=np.float64)

    return predict


def _warp_one(morph_img, lm_m, lm_a, lm_b):
    from morphganformer_tpu.morph.warp import warp_morph_to_average_landmarks

    return warp_morph_to_average_landmarks(morph_img, lm_m, lm_a, lm_b)


def run(args):
    from morphganformer_tpu.morph.warp import load_landmarks_csv

    jobs = []
    if args.batch_list:
        with open(args.batch_list) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = [p.strip() for p in line.split(",")]
                if len(parts) == 3:
                    morph, csv_a, csv_b = parts
                    csv_m = None
                elif len(parts) == 4:
                    morph, csv_a, csv_b, csv_m = parts
                else:
                    raise SystemExit(f"bad batch line: {line!r}")
                jobs.append((morph, csv_m, csv_a, csv_b, None, None))
    else:
        if not args.morph:
            raise SystemExit("--morph (or --batch-list) is required")
        jobs.append((args.morph, args.landmarks_morph, args.landmarks_a,
                     args.landmarks_b, args.img_a, args.img_b))

    predict = _predictor(args) if args.predict_landmarks else None
    outputs = []
    used_paths = set()
    for morph_path, csv_m, csv_a, csv_b, img_a, img_b in jobs:
        morph_img = _load_img(morph_path)
        if csv_m:
            lm_m = load_landmarks_csv(csv_m)
        elif predict is not None:
            lm_m = predict(morph_img)
        else:
            raise SystemExit("need --landmarks-morph or --predict-landmarks")
        if csv_a and csv_b:
            lm_a, lm_b = load_landmarks_csv(csv_a), load_landmarks_csv(csv_b)
        elif predict is not None and img_a and img_b:
            lm_a, lm_b = predict(_load_img(img_a)), predict(_load_img(img_b))
        else:
            raise SystemExit("need --landmarks-a/--landmarks-b CSVs, or "
                             "--img-a/--img-b with --predict-landmarks")
        warped = _warp_one(morph_img, lm_m, lm_a, lm_b)
        name = os.path.splitext(os.path.basename(morph_path))[0]
        out_path = os.path.join(args.out, f"{name}_warped.png")
        n = len(outputs)
        while out_path in used_paths:  # same basename from another directory
            out_path = os.path.join(args.out, f"{name}_{n:03d}_warped.png")
            n += 1
        used_paths.add(out_path)
        _save_img(out_path, warped)
        outputs.append(out_path)
        print(f"saved {out_path}")
    return outputs


def build_parser():
    p = argparse.ArgumentParser(
        description="Delaunay landmark warp of GAN morphs "
                    "(reference 1024_warp_morphs.py)")
    p.add_argument("--morph", help="Generated morph image")
    p.add_argument("--img-a", help="Bona fide photo A (with "
                                   "--predict-landmarks)")
    p.add_argument("--img-b", help="Bona fide photo B")
    p.add_argument("--landmarks-morph", help="68-pt CSV for the morph")
    p.add_argument("--landmarks-a", help="68-pt CSV for identity A")
    p.add_argument("--landmarks-b", help="68-pt CSV for identity B")
    p.add_argument("--batch-list",
                   help="Text file: morph.png,a.csv,b.csv[,morph.csv] per line")
    p.add_argument("--predict-landmarks", action="store_true",
                   help="Predict landmarks with the landmark network instead "
                        "of reading CSVs")
    p.add_argument("--landmark-weights", default=None,
                   help="Converted landmark-net .npz (default: bundled)")
    p.add_argument("--out", default="images/warped")
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
