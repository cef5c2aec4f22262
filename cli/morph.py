#!/usr/bin/env python
"""Morph identities: project both photos of each pair, average the latents,
generate.

Behavioral spec: projection_example_v2_percept_morph.py:274-365 — project the
pair, save bona fide reconstructions, W = 0.5*w1 + 0.5*w2, save the morph
image + latent. Optionally CSV-driven pair selection with a similarity
threshold (reference :339-344).

Beyond the reference: the reference projects every image SEQUENTIALLY
(:356-357); here each pair is one batch-2 projection scan, and with
--pairs-per-batch P the CSV driver projects P pairs as ONE batch-2P scan
(the engine tracks per-image bests independently, so the math is identical
to 2P sequential runs). Batching raises chip utilization superlinearly at
1024^2 — see ROADMAP.md for the measured pair-steps/s.

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


def prepare(model_bundle, args):
    """One-time pieces shared by every pair: loss stack, projection config,
    latent prior stats (the reference recomputes the 10k-sample stats per
    script run; once per CLI invocation is the same behavior)."""
    import jax

    from morphganformer_tpu.losses.stack import build_loss_stack, parse_loss_spec
    from morphganformer_tpu.projection.engine import (ProjectionConfig,
                                                      latent_stats)

    cfg, model, variables = model_bundle
    pcfg = ProjectionConfig(
        steps=args.step, lr=args.lr, truncation_psi=args.truncation_psi,
        n_mean_latent=args.n_mean_latent, chunk=args.chunk)
    loss_fn = build_loss_stack(parse_loss_spec(args.loss))
    rng = jax.random.PRNGKey(args.seed)
    rng, sub = jax.random.split(rng)
    mean, std = latent_stats(model, variables, cfg, sub,
                             n_mean_latent=args.n_mean_latent)
    return pcfg, loss_fn, mean, std, rng


def run_pairs(model_bundle, shared, pairs, out_dir, args):
    """Project `pairs` (a list of (img_a_path, img_b_path)) as ONE
    batch-2P scan, then write per-pair outputs. Morph images for all pairs
    are generated in one batched forward."""
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.morph import morph_latents, save_latent_mat
    from morphganformer_tpu.projection.engine import project
    from morphganformer_tpu.utils.image import load_target, to_pil

    cfg, model, variables = model_bundle
    pcfg, loss_fn, mean, std, rng = shared
    os.makedirs(out_dir, exist_ok=True)

    paths = [p for pair in pairs for p in pair]
    names = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    targets = jnp.concatenate([load_target(p, size=cfg.img_resolution)
                               for p in paths])
    rng, sub = jax.random.split(rng)
    mesh = None
    if getattr(args, "shard", False):
        from morphganformer_tpu.parallel.mesh import make_data_mesh

        n_dev = len(jax.devices())
        if n_dev > 1 and len(paths) % n_dev == 0:
            mesh = make_data_mesh()
            print(f"sharding the batch-{len(paths)} scan over "
                  f"{n_dev} devices ('data' mesh)")
        else:
            print(f"--shard ignored: {n_dev} device(s), batch {len(paths)}")
    print(f"projecting {len(pairs)} pair(s) as one batch-{len(paths)} scan "
          f"({args.step} steps, loss={args.loss})...")
    res = project(model, variables, targets, loss_fn, pcfg, mean, std,
                  rng=sub, mesh=mesh)
    per_img = jax.device_get(res.per_image_loss)
    print(f"  mean best loss {res.best_loss:.5f}; per-image "
          f"{[round(float(v), 5) for v in per_img]}")

    latents = jax.device_get(res.latent)
    for i, name in enumerate(names):
        to_pil(res.best_img[i]).save(os.path.join(out_dir, f"{name}_rec.png"))
        save_latent_mat(os.path.join(out_dir, f"{name}.mat"), latents[i])

    # All morph latents in one batched generation.
    w_morphs = jnp.stack([
        jnp.asarray(morph_latents(latents[2 * i], latents[2 * i + 1],
                                  args.alpha))
        for i in range(len(pairs))])
    imgs = model.apply(variables, w_morphs,
                       truncation_psi=args.truncation_psi,
                       noise_mode="const")
    imgs = jax.device_get(imgs)
    for i in range(len(pairs)):
        a, b = names[2 * i], names[2 * i + 1]
        stem = f"{a}_{b}_morph"
        to_pil(imgs[i]).save(os.path.join(out_dir, f"{stem}.png"))
        save_latent_mat(os.path.join(out_dir, f"{stem}.mat"),
                        jax.device_get(w_morphs[i]))
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
    p.add_argument("--shard", action="store_true",
                   help="shard the batch-2P projection scan over all "
                        "devices ('data' mesh, weights replicated); "
                        "needs batch %% n_devices == 0")
    p.add_argument("--pairs-per-batch", type=int, default=4,
                   help="CSV mode: project this many pairs per batched scan "
                        "(one batch-2P projection; identical math to "
                        "sequential runs, far higher chip utilization)")
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
    shared = prepare(bundle, args)

    if args.pairs_csv:
        with open(args.pairs_csv) as f:
            rows = [row for row in csv.DictReader(f)
                    if float(row.get("similarity", 1.0)) >= args.min_similarity]
        pairs = [(os.path.join(args.img_root, r["img_a"]),
                  os.path.join(args.img_root, r["img_b"])) for r in rows]
        P = max(1, args.pairs_per_batch)
        for lo in range(0, len(pairs), P):
            run_pairs(bundle, shared, pairs[lo:lo + P], args.out, args)
    else:
        assert args.img_a and args.img_b, "need --img-a/--img-b or --pairs-csv"
        run_pairs(bundle, shared, [(args.img_a, args.img_b)], args.out, args)


if __name__ == "__main__":
    main()
