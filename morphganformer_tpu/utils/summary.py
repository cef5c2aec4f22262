"""Module summaries: per-layer shapes and parameter counts.

The reference prints a full-forward module summary of G and D at training
startup (torch_utils/misc.py:169-244 print_module_summary, invoked
training_loop.py:135-141) — a de-facto shape-regression harness
(SURVEY.md §4.4). Here `flax.linen.tabulate` provides the same thing from
an abstract trace (no FLOPs spent)."""

from __future__ import annotations


def generator_summary(cfg, batch: int = 1) -> str:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.models.generator import Generator

    z = jnp.zeros((batch, cfg.k, cfg.z_dim), jnp.float32)
    c = jnp.zeros((batch, cfg.c_dim), jnp.float32) if cfg.c_dim > 0 else None
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    return nn.tabulate(Generator(cfg), rngs, depth=2,
                       compute_flops=False)(z, c, noise_mode="const")


def discriminator_summary(cfg, batch: int = 1) -> str:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.models.discriminator import Discriminator

    img = jnp.zeros((batch, cfg.img_resolution, cfg.img_resolution,
                     cfg.img_channels), jnp.float32)
    c = jnp.zeros((batch, cfg.c_dim), jnp.float32) if cfg.c_dim > 0 else None
    return nn.tabulate(Discriminator(cfg), jax.random.PRNGKey(0),
                       depth=2, compute_flops=False)(img, c)
