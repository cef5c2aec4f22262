#!/usr/bin/env python
"""Batch morph generation from stored .mat latents.

Behavioral spec: 1024_merge_files.py / 1024_merge_morph_{2,22,222,2222}.py —
load w1, w2 from .mat files, W = 0.5*w1 + 0.5*w2, generate, save image +
morph latent (1024_merge_morph_22.py:70-92).

Usage:
  python cli/merge.py --model <ckpt> --latents a.mat b.mat --out morphs/
  python cli/merge.py --model <ckpt> --latent-dir dir/ --pairs-from-names
"""

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Batch morphs from stored latents")
    p.add_argument("--model", required=True)
    p.add_argument("--latents", nargs="*", default=[],
                   help="Explicit .mat latent files (pairs taken in order)")
    p.add_argument("--latent-dir", help="Directory of .mat latents; all pairs")
    p.add_argument("--out", default="images/merged")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--truncation_psi", type=float, default=0.7)
    p.add_argument("--noises",
                   help="Optimized noise maps (.noises.npz from cli/project "
                        "--noise_regularize); merged into the generator so "
                        "e.g. `--latents w.mat w.mat --noises w.noises.npz` "
                        "reproduces that projection's best image (bit-exact "
                        "in float32; bfloat16 differs by per-pixel rounding)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="Synthesis compute dtype. To reproduce a projection "
                        "output bit-for-bit, match cli/project's dtype "
                        "(its default is bfloat16)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cli.generate import get_model
    from morphganformer_tpu.morph import (
        load_latent_mat, morph_latents, save_latent_mat)
    from morphganformer_tpu.utils.image import to_pil

    cfg, model, variables = get_model(args.model, dtype=args.dtype)
    if args.noises:
        import numpy as np

        from morphganformer_tpu.projection.engine import merge_noise_buffers
        with np.load(args.noises) as nz:
            variables = merge_noise_buffers(
                variables, {k: jnp.asarray(v) for k, v in nz.items()})
        print(f"merged optimized noise maps from {args.noises}")
    os.makedirs(args.out, exist_ok=True)

    files = list(args.latents)
    if args.latent_dir:
        files += sorted(
            os.path.join(args.latent_dir, f)
            for f in os.listdir(args.latent_dir) if f.endswith(".mat"))
    if len(files) < 2:
        p.error("need at least two latents")

    @jax.jit
    def gen(w):
        return model.apply(variables, w, truncation_psi=args.truncation_psi,
                           noise_mode="const")

    pairs = (itertools.combinations(files, 2) if args.latent_dir
             else zip(files[::2], files[1::2]))
    for fa, fb in pairs:
        na = os.path.splitext(os.path.basename(fa))[0]
        nb = os.path.splitext(os.path.basename(fb))[0]
        w1 = load_latent_mat(fa)
        w2 = load_latent_mat(fb)
        w = morph_latents(w1, w2, args.alpha)
        if w.ndim == 2:
            w = w[None]
        img = jax.device_get(gen(jnp.asarray(w)))
        stem = f"{na}_{nb}"
        to_pil(img[0]).save(os.path.join(args.out, f"{stem}.png"))
        save_latent_mat(os.path.join(args.out, f"{stem}.mat"), w[0])
        print(f"{stem} done")


if __name__ == "__main__":
    main()
