#!/usr/bin/env python
"""Project a photo into the GANformer latent space.

One CLI replaces the reference's 21 projection scripts (SURVEY.md §2.6):
the loss stack is configured with --loss ("mse", "lpips+mse",
"lpips+0.01*wing+1*mse", ...). Hyperparameter flags and defaults mirror
1024_example_MSE.py:185-205; outputs keep the reference conventions:
best image as sample_{step:06d}_{loss:.4f}.png, latent as a .mat {'w': ...}.

Unlike the reference (whose projection severs the autograd graph and is a
noisy random search), this is true jitted gradient descent through G.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_extra_terms(weights, args):
    """Build perceptual/biometric loss terms for the requested spec.

    Each term loads converted weights from its flag; --random-perceptual
    substitutes random weights (plumbing smoke runs without weight files)."""
    extra = {}
    builtin = {"mse", "l1", "psnr", "ssim"}
    need = [n for n in weights if n not in builtin]
    rand = getattr(args, "random_perceptual", False)
    shared_params = {}  # weight trees used by more than one term

    def weight_path(flag, name):
        path = getattr(args, flag, None)
        if path is None and not rand:
            raise SystemExit(
                f"loss term '{name}' needs --{flag.replace('_', '-')} "
                f"(or --random-perceptual for a smoke run)")
        return path

    for name in need:
        if name == "lpips":
            from morphganformer_tpu.losses.lpips import (
                load_lpips_params, make_lpips_loss, random_lpips_params)
            path = weight_path("lpips_weights", name)
            params = load_lpips_params(path, args.lpips_net) if path else \
                random_lpips_params(args.lpips_net)
            if params.pop("tower_source", None) == "random":
                print("lpips: real calibration heads x placeholder tower "
                      "(torchvision tower weights unavailable)")
            extra[name] = make_lpips_loss(params, args.lpips_net)
        elif name in ("wing", "awing"):
            from morphganformer_tpu.losses.landmarks import (
                bundled_landmark_path, landmark_heatmaps_01, load_landmark_npz,
                make_landmark_fn, random_landmark_params)
            from morphganformer_tpu.losses.wing import (
                make_adaptive_wing_loss_term, make_wing_loss_term)
            path = getattr(args, "landmark_weights", None)
            if path is None and not rand:
                # Bundled synthetic-face-trained model (tools/
                # train_landmarks.py) as the default; a converted real-data
                # model via --landmark-weights is preferred for photos.
                path = bundled_landmark_path()
                if path:
                    print(f"landmarks: bundled synthetic model ({path}); "
                          "pass --landmark-weights for a real-data model")
            if path is None and not rand:
                raise SystemExit(
                    f"loss term '{name}' needs --landmark-weights "
                    "(or --random-perceptual for a smoke run)")
            # One params load shared by wing and awing (both may appear in
            # one spec; the two terms close over the same tree).
            if "landmarks" not in shared_params:
                shared_params["landmarks"] = (load_landmark_npz(path)
                                              if path else
                                              random_landmark_params())
            params = shared_params["landmarks"]
            if name == "wing":
                # Coordinate-space wing loss (1024_example_wing_loss.py).
                extra[name] = make_wing_loss_term(
                    make_landmark_fn(params, temperature=0.05))
            else:
                # Heatmap-space adaptive wing, on [0,1] sigmoid heatmaps —
                # raw logits break AWing's alpha - y exponent
                # (1024_example_wing_loss_adaptive.py).
                extra[name] = make_adaptive_wing_loss_term(
                    lambda im, _p=params: landmark_heatmaps_01(_p, im))
        elif name == "facenet":
            from morphganformer_tpu.losses.facenet import (
                make_facenet_loss, random_facenet_params)
            from tools.convert_facenet import load_facenet_npz
            path = weight_path("facenet_weights", name)
            params = load_facenet_npz(path) if path else random_facenet_params()
            extra[name] = make_facenet_loss(params)
        elif name == "arcface":
            from morphganformer_tpu.losses.face_embedding import (
                make_identity_loss, random_iresnet_params)
            from tools.convert_iresnet import load_iresnet_npz
            path = weight_path("arcface_weights", name)
            params = load_iresnet_npz(path) if path else \
                random_iresnet_params()
            extra[name] = make_identity_loss(params)
        elif name == "mdf":
            from morphganformer_tpu.losses.mdf import (
                make_mdf_loss, random_mdf_params)
            from tools.convert_mdf import load_mdf_params
            path = weight_path("mdf_weights", name)
            if path:
                ds, padding = load_mdf_params(path, with_padding=True)
            else:
                ds, padding = random_mdf_params(), 0
            extra[name] = make_mdf_loss(ds, padding=padding)
        elif name == "lbp":
            from morphganformer_tpu.losses.lbp import soft_lbp_loss
            extra[name] = soft_lbp_loss
        else:
            raise SystemExit(f"unknown loss term '{name}'")
    return extra


def run(args):
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    from cli.generate import get_model
    from morphganformer_tpu.losses.stack import build_loss_stack, parse_loss_spec
    from morphganformer_tpu.morph import save_latent_mat
    from morphganformer_tpu.projection.engine import (
        ProjectionConfig, latent_stats, project)
    from morphganformer_tpu.utils.image import (
        crop_max_rectangle, load_target, to_pil)

    print("Loading networks...")
    cfg, model, variables = get_model(args.model, dtype=args.dtype)
    target = load_target(args.img, size=cfg.img_resolution)

    pcfg = ProjectionConfig(
        steps=args.step, lr=args.lr, lr_rampup=args.lr_rampup,
        lr_rampdown=args.lr_rampdown, noise=args.noise,
        noise_ramp=args.noise_ramp, truncation_psi=args.truncation_psi,
        n_mean_latent=args.n_mean_latent, chunk=args.chunk,
        w_plus=args.w_plus, noise_regularize=args.noise_regularize)

    weights = parse_loss_spec(args.loss)
    # --lamda / --beta override the wing / mse term weights (reference
    # 1024_example_wing_loss_perceptual_sqz_MSE.py:179:
    # all_loss = p + lamda*wing + beta*mse).
    if args.lamda is not None:
        wing_terms = [t for t in ("wing", "awing") if t in weights]
        if not wing_terms:
            raise SystemExit("--lamda sets the wing weight; add wing to --loss")
        for t in wing_terms:
            weights[t] = args.lamda
    if args.beta is not None:
        if "mse" not in weights:
            raise SystemExit("--beta sets the mse weight; add mse to --loss")
        weights["mse"] = args.beta
    loss_fn = build_loss_stack(weights, extra_terms=make_extra_terms(weights, args))
    # --size: compute the loss at a reduced resolution (reference
    # projection_example_v1.py:104: resize = min(args.size, model size)).
    if args.size and args.size < cfg.img_resolution:
        import jax.numpy as jnp
        inner, size = loss_fn, args.size

        def loss_fn(img, tgt, _inner=inner, _s=size):
            shape = (img.shape[0], _s, _s, img.shape[3])
            import jax as _jax
            return _inner(_jax.image.resize(img, shape, "linear"),
                          _jax.image.resize(tgt, shape, "linear"))

    rng = jax.random.PRNGKey(args.seed)
    rng, sub = jax.random.split(rng)
    mean, std = latent_stats(model, variables, cfg, sub,
                             n_mean_latent=args.n_mean_latent)

    # Sequential projection / latent editing: initialize from a stored
    # latent instead of the prior mean (reference edit_MSE.py:228-231,
    # where w2 starts from w1).
    init_latent = None
    if args.init_latent:
        from morphganformer_tpu.morph import load_latent_mat
        init_latent = load_latent_mat(args.init_latent)

    def progress(step, loss, best):
        print(f"  step {step}/{args.step}  loss {loss:.5f}  min_loss {best:.5f}",
              flush=True)

    result = project(model, variables, target, loss_fn, pcfg, mean, std,
                     rng=rng, progress=progress, init_latent=init_latent)

    os.makedirs(args.path_to_gen, exist_ok=True)
    img_path = os.path.join(
        args.path_to_gen,
        "sample_{:06d}_{:.4f}.png".format(result.best_step, result.best_loss))
    crop_max_rectangle(to_pil(result.best_img[0]), args.ratio).save(img_path)
    print(f"best image -> {img_path}")

    latent_path = args.save_latent or os.path.join(args.path_to_gen, "w.mat")
    save_latent_mat(latent_path, jax.device_get(result.latent[0]))
    print(f"latent -> {latent_path}")
    if result.noises is not None:
        # The best image was synthesized with the CO-OPTIMIZED noise maps;
        # without them the latent alone regenerates a different image.
        import numpy as np
        noises_path = os.path.splitext(latent_path)[0] + ".noises.npz"
        np.savez(noises_path, **{k: np.asarray(v)
                                 for k, v in result.noises.items()})
        print(f"optimized noise maps -> {noises_path} "
              "(merge_noise_buffers() reapplies them at generation)")
    return result


def build_parser():
    p = argparse.ArgumentParser(description="GANformer latent projection")
    p.add_argument("--model", required=True)
    p.add_argument("--img", required=True, help="Target photo path")
    p.add_argument("--loss", default="mse",
                   help='Loss stack spec, e.g. "mse", "lpips+mse", '
                        '"lpips+0.01*wing+1*mse". Terms: mse l1 psnr ssim '
                        'lpips wing awing facenet arcface mdf lbp')
    p.add_argument("--path_to_gen", default="images/projection")
    p.add_argument("--size", type=int, default=None,
                   help="Compute the loss at this resolution (downsamples "
                        "both images when below the model resolution)")
    p.add_argument("--n_mean_latent", type=int, default=10000)
    p.add_argument("--step", type=int, default=5000)
    p.add_argument("--lamda", type=float, default=None,
                   help="Wing-loss weight override (reference _sqz_MSE.py:179)")
    p.add_argument("--beta", type=float, default=None,
                   help="MSE weight override (reference _sqz_MSE.py:179)")
    p.add_argument("--lr_rampup", type=float, default=0.05)
    p.add_argument("--lr_rampdown", type=float, default=0.25)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--noise", type=float, default=0.05)
    p.add_argument("--noise_ramp", type=float, default=0.75)
    p.add_argument("--ratio", type=float, default=1.0)
    p.add_argument("--truncation_psi", type=float, default=0.7)
    # The reference parses this flag but never calls its noise_regularize()
    # (1024_example_MSE.py:31-59,203 — dead StyleGAN2-projector code). Here
    # it WORKS: > 0 jointly optimizes the per-layer const-noise maps with
    # the latent under the multi-scale autocorrelation penalty + per-step
    # re-normalization. Default 0 (off) preserves the reference's effective
    # behavior; its parsed-but-unused default was 1e5.
    p.add_argument("--noise_regularize", type=float, default=0.0)
    p.add_argument("--w_plus", action="store_true",
                   help="Optimize per-layer W+ latents [k, num_ws, w_dim]")
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-latent", default=None)
    p.add_argument("--init-latent", default=None,
                   help="Start from a stored .mat latent (sequential "
                        "projection / editing, reference edit_MSE.py)")
    # Perceptual/biometric term weights (converted .npz files; see tools/).
    p.add_argument("--lpips-weights", dest="lpips_weights", default=None)
    p.add_argument("--lpips-net", dest="lpips_net", default="alex",
                   choices=["alex", "vgg", "squeeze"])
    p.add_argument("--landmark-weights", dest="landmark_weights", default=None)
    p.add_argument("--facenet-weights", dest="facenet_weights", default=None)
    p.add_argument("--arcface-weights", dest="arcface_weights", default=None)
    p.add_argument("--mdf-weights", dest="mdf_weights", default=None)
    p.add_argument("--random-perceptual", action="store_true",
                   help="Random weights for missing perceptual nets (smoke)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="Synthesis compute dtype (bfloat16 is ~1.8x faster "
                        "at 1024^2 and converges equivalently)")
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
