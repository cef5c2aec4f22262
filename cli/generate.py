#!/usr/bin/env python
"""Generate images with the GANformer (CLI parity with reference
generate.py:57-67; --gpus is accepted but ignored — device selection is
JAX's). Output: <output-dir>/sample_{i:06d}.png.

`--model` takes a native checkpoint dir (see tools/convert_checkpoint.py for
reference .pkl conversion) or `init:<resolution>` for a randomly initialized
network (smoke tests / architecture demos).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_model(model_spec: str, dtype: str = "float32"):
    import dataclasses
    from morphganformer_tpu.checkpoint.io import load_network
    from morphganformer_tpu.models import GANformerConfig, init_generator

    if model_spec.startswith("init:"):
        res = int(model_spec.split(":", 1)[1])
        cfg = GANformerConfig(img_resolution=res, dtype=dtype)
        model, variables = init_generator(cfg, seed=0, batch=1)
        return cfg, model, variables
    cfg, model, variables = load_network(model_spec)
    if dtype != cfg.dtype:
        cfg = dataclasses.replace(cfg, dtype=dtype)
        from morphganformer_tpu.models.generator import Generator
        model = Generator(cfg)
    return cfg, model, variables


def run(model, output_dir, images_num, truncation_psi, ratio, batch_size=4,
        seed=0, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.utils.image import crop_max_rectangle, to_pil

    print("Loading networks...")
    cfg, net, variables = get_model(model, dtype)
    os.makedirs(output_dir, exist_ok=True)

    @jax.jit
    def forward(z):
        return net.apply(variables, z, truncation_psi=truncation_psi,
                         noise_mode="const")

    print("Generate and save images...")
    rng = jax.random.PRNGKey(seed)
    pattern = os.path.join(output_dir, "sample_{:06d}.png")
    done = 0
    while done < images_num:
        b = min(batch_size, images_num - done)
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, (batch_size, cfg.k, cfg.z_dim))
        imgs = jax.device_get(forward(z))[:b]
        for i in range(b):
            img = crop_max_rectangle(to_pil(imgs[i]), ratio)
            img.save(pattern.format(done + i))
        done += b
        print(f"  {done}/{images_num}")
    return output_dir


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser(
        description="Generate images with the GANformer")
    parser.add_argument("--model", required=True,
                        help="Checkpoint dir (or init:<res> for a random net)")
    parser.add_argument("--gpus", default="0",
                        help="Ignored (TPU device selection is automatic)")
    parser.add_argument("--output-dir", default="images", metavar="DIR")
    parser.add_argument("--images-num", default=32, type=int)
    parser.add_argument("--truncation-psi", default=0.7, type=float)
    parser.add_argument("--ratio", default=1.0, type=float,
                        help="Crop ratio (CLEVR 0.75, Bedrooms 188/256, "
                             "Cityscapes 0.5, FFHQ 1.0)")
    parser.add_argument("--batch-size", default=4, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    args, _ = parser.parse_known_args()
    run(args.model, args.output_dir, args.images_num, args.truncation_psi,
        args.ratio, args.batch_size, args.seed, args.dtype)


if __name__ == "__main__":
    main()
