#!/usr/bin/env python
"""Morph two identities: project both photos, average the latents, generate.

Behavioral spec: projection_example_v2_percept_morph.py:274-365 — project the
pair, save bona fide reconstructions, W = 0.5*w1 + 0.5*w2, save the morph
image + latent. Optionally CSV-driven pair selection with a similarity
threshold (reference :339-344).

Outputs per pair (reference formats):
  <out>/<a>_rec.png, <out>/<b>_rec.png      bona fide reconstructions
  <out>/<a>_<b>_morph.png                   morph image
  <out>/<a>.mat, <out>/<b>.mat, <out>/<a>_<b>_morph.mat   latents {'w': ...}
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_pair(model_bundle, img_a, img_b, out_dir, args):
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.losses.stack import build_loss_stack, parse_loss_spec
    from morphganformer_tpu.morph import morph_latents, save_latent_mat
    from morphganformer_tpu.projection.engine import (
        ProjectionConfig, latent_stats, project)
    from morphganformer_tpu.utils.image import load_target, to_pil

    cfg, model, variables = model_bundle
    os.makedirs(out_dir, exist_ok=True)
    pcfg = ProjectionConfig(
        steps=args.step, lr=args.lr, truncation_psi=args.truncation_psi,
        n_mean_latent=args.n_mean_latent, chunk=args.chunk)
    loss_fn = build_loss_stack(parse_loss_spec(args.loss))
    rng = jax.random.PRNGKey(args.seed)
    rng, sub = jax.random.split(rng)
    mean, std = latent_stats(model, variables, cfg, sub,
                             n_mean_latent=args.n_mean_latent)

    # Project BOTH photos in one batched run — same math as two sequential
    # projections (per-image best tracking in the engine), half the wall time.
    names = [os.path.splitext(os.path.basename(p))[0] for p in (img_a, img_b)]
    targets = jnp.concatenate([load_target(p, size=cfg.img_resolution)
                               for p in (img_a, img_b)])
    rng, sub = jax.random.split(rng)
    print(f"projecting {names[0]} + {names[1]} "
          f"({args.step} steps, loss={args.loss})...")
    res = project(model, variables, targets, loss_fn, pcfg, mean, std, rng=sub)
    print(f"  best loss {res.best_loss:.5f} @ step {res.best_step}")
    latents = []
    for i, name in enumerate(names):
        to_pil(res.best_img[i]).save(os.path.join(out_dir, f"{name}_rec.png"))
        save_latent_mat(os.path.join(out_dir, f"{name}.mat"),
                        jax.device_get(res.latent[i]))
        latents.append(jax.device_get(res.latent[i:i + 1]))

    w_morph = morph_latents(latents[0], latents[1], args.alpha)
    img = model.apply(variables, jnp.asarray(w_morph),
                      truncation_psi=args.truncation_psi, noise_mode="const")
    stem = f"{names[0]}_{names[1]}_morph"
    to_pil(jax.device_get(img)[0]).save(os.path.join(out_dir, f"{stem}.png"))
    save_latent_mat(os.path.join(out_dir, f"{stem}.mat"), w_morph[0])
    print(f"morph -> {os.path.join(out_dir, stem + '.png')}")


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="GANformer face morphing")
    p.add_argument("--model", required=True)
    p.add_argument("--img-a")
    p.add_argument("--img-b")
    p.add_argument("--pairs-csv",
                   help="CSV with columns img_a,img_b[,similarity]; rows with "
                        "similarity < --min-similarity are skipped "
                        "(reference projection_example_v2_percept_morph.py:339-344)")
    p.add_argument("--img-root", default="",
                   help="Prefix for paths in --pairs-csv")
    p.add_argument("--min-similarity", type=float, default=0.5)
    p.add_argument("--out", default="images/morphs")
    p.add_argument("--loss", default="mse")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--step", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--truncation_psi", type=float, default=0.7)
    p.add_argument("--n_mean_latent", type=int, default=10000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    from cli.generate import get_model
    bundle = get_model(args.model, dtype=args.dtype)

    if args.pairs_csv:
        with open(args.pairs_csv) as f:
            for row in csv.DictReader(f):
                sim = float(row.get("similarity", 1.0))
                if sim < args.min_similarity:
                    continue
                run_pair(bundle, os.path.join(args.img_root, row["img_a"]),
                         os.path.join(args.img_root, row["img_b"]),
                         args.out, args)
    else:
        assert args.img_a and args.img_b, "need --img-a/--img-b or --pairs-csv"
        run_pair(bundle, args.img_a, args.img_b, args.out, args)


if __name__ == "__main__":
    main()
