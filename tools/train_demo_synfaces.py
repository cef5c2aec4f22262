"""End-to-end training demo on the procedural-face stream (dev tool).

Renders a small PNG dataset with losses/synthetic_faces.py (the same
stream that trained the landmark network), then drives cli/train.py on it
for a few ticks — the full adversarial loop (G/D steps, lazy R1/PL
regularization, style mixing, EMA, in-loop eval + snapshots) on whatever
jax.devices() provides (real TPU chip here; the CPU mesh in CI).

This closes the "drive a small end-to-end training run on a real dataset"
roadmap item as far as the zero-egress environment allows: no real face
data exists here, so convergence-to-published-FID is out of scope; what
this proves is the training stack end to end on hardware. Measured on the
TPU v5e chip (2026-08-17): 3 ticks x 2 kimg at 64^2, batch 16 — tick 1
184 s (includes the one-off train-step compile), subsequent ticks ~366 s
wall of which the step itself is a small fraction (1-CPU host feed +
per-tick FID eval dominate); D loss 3.68 -> 1.66 over 4 kimg with stable
scores, snapshots + tfevents + metric jsonl written by the loop.

Usage: python tools/train_demo_synfaces.py [--out /tmp/synface_run]
       [--images 512] [--res 64] [--ticks 3]
"""

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(root: str, images: int, res: int, seed: int = 42) -> None:
    from PIL import Image

    from morphganformer_tpu.losses.synthetic_faces import sample_face

    out = os.path.join(root, str(res))
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(images):
        img, _ = sample_face(rng, size=res)  # [-1, 1] float32 HWC
        arr = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(out, f"{i:05d}.png"))
    print(f"dataset: {images} images at {res}^2 under {out}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/synface_run")
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--ticks", type=int, default=3)
    args = p.parse_args(argv)

    data_dir = os.path.join(args.out, "dataset")
    if not os.path.isdir(os.path.join(data_dir, str(args.res))):
        build_dataset(data_dir, args.images, args.res)

    end_res = max(2, args.res.bit_length() - 1)  # attention up to res/2
    cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                     "cli", "train.py"),
        "--data-dir", data_dir, "--dataset-name", "synface",
        "--ganformer-default",
        "--resolution", str(args.res), "--end-res", str(end_res),
        "--batch", "16", "--batch-gpu", "16",
        "--components-num", "8", "--latent-size", "128",
        "--channel-base", "8192", "--channel-max", "128",
        "--kimg-per-tick", "2", "--total-kimg", str(2 * args.ticks),
        "--max-ticks", str(args.ticks),
        "--snapshot-ticks", "1", "--img-snapshot-ticks", "1",
        "--metrics", "fid2k_full",
        "--result-dir", os.path.join(args.out, "results"),
    ]
    print("exec:", " ".join(cmd), flush=True)
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
