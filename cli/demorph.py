#!/usr/bin/env python
"""De-morphing: recover the second identity from a morph + one accomplice.

Behavioral spec: the reference README's reference-image defense
(README.md:101-107); the repo ships only the data-preparation side
(process/select_bona_B.py) — the latent arithmetic implemented here inverts
the morph equation. Two modes:

  latent mode (default): given the morph latent (.mat) and the accomplice's
    latent (.mat), w_rec = (W - alpha*w_acc) / (1 - alpha); generate.

  image mode (--morph-img/--accomplice-img): project both images first
    (the live-capture scenario), then invert.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="GANformer de-morphing")
    p.add_argument("--model", required=True)
    p.add_argument("--morph-latent", help=".mat of the morph latent")
    p.add_argument("--accomplice-latent", help=".mat of the accomplice latent")
    p.add_argument("--morph-img", help="Morph photo (projected if given)")
    p.add_argument("--accomplice-img", help="Accomplice photo")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--out", default="images/demorph")
    p.add_argument("--loss", default="mse")
    p.add_argument("--step", type=int, default=1000)
    p.add_argument("--truncation_psi", type=float, default=0.7)
    p.add_argument("--n_mean_latent", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cli.generate import get_model
    from morphganformer_tpu.morph import (
        demorph_latent, load_latent_mat, save_latent_mat)
    from morphganformer_tpu.utils.image import to_pil

    cfg, model, variables = get_model(args.model, dtype=args.dtype)
    os.makedirs(args.out, exist_ok=True)

    def get_latent(mat, img, tag):
        if mat:
            w = load_latent_mat(mat)
            return w[None] if w.ndim == 2 else w
        assert img, f"need --{tag}-latent or --{tag}-img"
        from morphganformer_tpu.losses.stack import build_loss_stack, parse_loss_spec
        from morphganformer_tpu.projection.engine import (
            ProjectionConfig, latent_stats, project)
        from morphganformer_tpu.utils.image import load_target

        target = load_target(img, size=cfg.img_resolution)
        pcfg = ProjectionConfig(steps=args.step,
                                truncation_psi=args.truncation_psi,
                                n_mean_latent=args.n_mean_latent)
        mean, std = latent_stats(model, variables, cfg,
                                 jax.random.PRNGKey(args.seed),
                                 n_mean_latent=args.n_mean_latent)
        print(f"projecting {tag} ({args.step} steps)...")
        res = project(model, variables, jnp.asarray(target),
                      build_loss_stack(parse_loss_spec(args.loss)), pcfg,
                      mean, std, rng=jax.random.PRNGKey(args.seed + hash(tag) % 97))
        print(f"  best loss {res.best_loss:.5f}")
        return jax.device_get(res.latent)

    w_morph = get_latent(args.morph_latent, args.morph_img, "morph")
    w_acc = get_latent(args.accomplice_latent, args.accomplice_img, "accomplice")

    w_rec = demorph_latent(w_morph, w_acc, args.alpha)
    img = model.apply(variables, jnp.asarray(w_rec),
                      truncation_psi=args.truncation_psi, noise_mode="const")
    to_pil(jax.device_get(img)[0]).save(os.path.join(args.out, "demorph.png"))
    save_latent_mat(os.path.join(args.out, "demorph.mat"), w_rec[0])
    print(f"recovered identity -> {os.path.join(args.out, 'demorph.png')}")


if __name__ == "__main__":
    main()
