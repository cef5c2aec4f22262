"""Perceptual Path Length, jitted on device.

Behavioral spec: metrics/perceptual_path_length.py in the reference
(:25-118): sample latent pairs, slerp (z space) or lerp (w space) at t and
t+eps, generate both endpoints with shared noise, center-crop (faces),
downsample to 256, embed with a perceptual feature net, and accumulate
squared feature distance / eps^2; final PPL = mean inside the [1%, 99%]
percentile band.

`feature_fn` is any jittable image->embedding map (the converted LPIPS-VGG
tower for strict parity, or any perceptual embedder)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _slerp(a, b, t):
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1, 1))
    c = b_n - d * a_n
    c = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-10)
    return a * jnp.cos(p) + jnp.linalg.norm(a, axis=-1, keepdims=True) * c * jnp.sin(p)


def make_ppl_sampler(model, variables, cfg, feature_fn, epsilon=1e-4,
                     space="w", sampling="end", crop=True):
    """Return a jitted rng->distances sampler (one batch)."""
    from morphganformer_tpu.models.generator import Generator

    def sample(rng, batch):
        r_t, r_z = jax.random.split(rng)
        t = jax.random.uniform(r_t, (batch,)) * (1.0 if sampling == "full" else 0.0)
        z = jax.random.normal(r_z, (2 * batch, cfg.k, cfg.z_dim))
        z0, z1 = z[:batch], z[batch:]

        if space == "w":
            ws = model.apply(variables, z, method=Generator.run_mapping)
            w0, w1 = ws[:batch], ws[batch:]
            tt = t[:, None, None, None]
            wt0 = w0 + (w1 - w0) * tt
            wt1 = w0 + (w1 - w0) * (tt + epsilon)
        else:
            tt = t[:, None, None]
            zt0 = _slerp(z0, z1, tt)
            zt1 = _slerp(z0, z1, tt + epsilon)
            ws = model.apply(variables, jnp.concatenate([zt0, zt1]),
                             method=Generator.run_mapping)
            wt0, wt1 = ws[:batch], ws[batch:]

        img, _ = model.apply(variables, jnp.concatenate([wt0, wt1]),
                             noise_mode="const",
                             method=Generator.run_synthesis)
        if crop:
            c = img.shape[1] // 8
            img = img[:, c * 3:c * 7, c * 2:c * 6, :]
        factor = cfg.img_resolution // 256
        if factor > 1:
            b, h, w, ch = img.shape
            img = img.reshape(b, h // factor, factor, w // factor, factor,
                              ch).mean(axis=(2, 4))
        img = (img + 1.0) * (255.0 / 2.0)
        feats = feature_fn(img)
        f0, f1 = feats[:batch], feats[batch:]
        return jnp.sum(jnp.square(f0 - f1), axis=-1) / epsilon ** 2

    return jax.jit(sample, static_argnums=1)


def compute_ppl(model, variables, cfg, feature_fn, num_samples=2000,
                batch=8, epsilon=1e-4, space="w", sampling="end", crop=True,
                seed=0):
    sampler = make_ppl_sampler(model, variables, cfg, feature_fn, epsilon,
                               space, sampling, crop)
    rng = jax.random.PRNGKey(seed)
    dist = []
    done = 0
    while done < num_samples:
        rng, sub = jax.random.split(rng)
        dist.append(np.asarray(sampler(sub, batch)))
        done += batch
    dist = np.concatenate(dist)[:num_samples]
    lo = np.percentile(dist, 1, method="lower")
    hi = np.percentile(dist, 99, method="higher")
    return float(dist[(dist >= lo) & (dist <= hi)].mean())
