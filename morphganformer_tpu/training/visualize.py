"""Visualization suite: sample grids, attention maps, interpolations, mixing.

Behavioral spec: training/visualize.py in the reference (`vis()` :60-310):
sample image grids, latent dumps, attention-map RGB renders + image blends
(:163-199), z/w interpolations with slerp/lerp per component (:203-252),
noise-variance maps (:257-267), and style/component mixing tables (:272-310).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from morphganformer_tpu.metrics.core import lerp, slerp
from morphganformer_tpu.utils.image import adjust_range, create_img_grid, to_pil

# A fixed qualitative palette for component attention maps.
_PALETTE = np.asarray([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
    [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
], dtype=np.float32)


def _forward(model, variables, z=None, ws=None, psi=0.7, return_att=False):
    fn = jax.jit(lambda v, latents: model.apply(
        v, z=latents if ws is None else None,
        ws=None if ws is None else latents,
        truncation_psi=psi, noise_mode="const", return_att=return_att),
        static_argnames=())
    return fn(variables, z if ws is None else ws)


def sample_grid(model, variables, cfg, num=16, psi=0.7, seed=0, path=None):
    """fakes grid (reference visualize.py main grid)."""
    z = jax.random.normal(jax.random.PRNGKey(seed), (num, cfg.k, cfg.z_dim))
    imgs = jax.device_get(_forward(model, variables, z=z, psi=psi))
    grid = create_img_grid(imgs)
    if path:
        grid.save(path)
    return grid


def attention_blends(model, variables, cfg, num=4, psi=0.7, seed=0,
                     out_dir=None, alpha=0.6):
    """Render per-component attention maps as colored overlays on the
    generated images (reference visualize.py:163-199)."""
    z = jax.random.normal(jax.random.PRNGKey(seed), (num, cfg.k, cfg.z_dim))
    imgs, att = _forward(model, variables, z=z, psi=psi, return_att=True)
    imgs = jax.device_get(imgs)
    att = jax.device_get(att)       # [B, k-1, L, N, H, W]
    # Average over layers and heads, argmax over components.
    maps = att.mean(axis=(2, 3))    # [B, k-1, H, W]
    hard = maps.argmax(axis=1)      # [B, H, W]
    blends = []
    for i in range(num):
        color = _PALETTE[hard[i] % len(_PALETTE)] / 255.0 * 2 - 1   # [-1,1]
        blend = (1 - alpha) * imgs[i] + alpha * color
        blends.append(blend)
        if out_dir:
            to_pil(imgs[i]).save(os.path.join(out_dir, f"sample_{i}.png"))
            to_pil(blend).save(os.path.join(out_dir, f"attention_{i}.png"))
    return np.stack(blends)


def interpolation_grid(model, variables, cfg, steps=8, psi=0.7, seed=0,
                       space="z", component: Optional[int] = None, path=None):
    """Latent interpolations (reference visualize.py:203-252): slerp in z,
    lerp in w, optionally varying a single component only."""
    rng = jax.random.PRNGKey(seed)
    r1, r2 = jax.random.split(rng)
    z1 = np.asarray(jax.random.normal(r1, (1, cfg.k, cfg.z_dim)))
    z2 = np.asarray(jax.random.normal(r2, (1, cfg.k, cfg.z_dim)))

    frames = []
    for t in np.linspace(0, 1, steps):
        if space == "z":
            z = slerp(z1, z2, float(t))
        else:
            z = lerp(z1, z2, float(t))
        if component is not None:
            z_fixed = z1.copy()
            z_fixed[:, component] = z[:, component]
            z = z_fixed
        frames.append(jnp.asarray(z))
    z_all = jnp.concatenate(frames, axis=0)
    imgs = jax.device_get(_forward(model, variables, z=z_all, psi=psi))
    grid = create_img_grid(imgs, rows=1, cols=steps)
    if path:
        grid.save(path)
    return grid


def style_mixing_table(model, variables, cfg, num_rows=3, num_cols=3,
                       cutoff=None, psi=0.7, seed=0, path=None):
    """Style-mixing table (reference visualize.py:272-310): row sources
    provide ws up to `cutoff`, column sources beyond."""
    from morphganformer_tpu.models.generator import Generator

    cutoff = cutoff if cutoff is not None else cfg.num_ws // 2
    rng = jax.random.PRNGKey(seed)
    r1, r2 = jax.random.split(rng)
    z_rows = jax.random.normal(r1, (num_rows, cfg.k, cfg.z_dim))
    z_cols = jax.random.normal(r2, (num_cols, cfg.k, cfg.z_dim))

    map_fn = jax.jit(lambda v, zz: model.apply(
        v, zz, truncation_psi=psi, method=Generator.run_mapping))
    ws_rows = map_fn(variables, z_rows)
    ws_cols = map_fn(variables, z_cols)

    tiles = []
    for r in range(num_rows):
        for c in range(num_cols):
            ws = ws_cols[c:c + 1].at[:, :, :cutoff].set(
                ws_rows[r:r + 1, :, :cutoff])
            tiles.append(ws)
    ws_all = jnp.concatenate(tiles, axis=0)
    syn_fn = jax.jit(lambda v, w: model.apply(v, ws=w, noise_mode="const"))
    imgs = jax.device_get(syn_fn(variables, ws_all))
    grid = create_img_grid(imgs, rows=num_rows, cols=num_cols)
    if path:
        grid.save(path)
    return grid


def noise_variance_map(model, variables, cfg, z=None, samples=16, psi=0.7,
                       seed=0, path=None):
    """Pixel std over noise draws (reference visualize.py:257-267)."""
    if z is None:
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, cfg.k, cfg.z_dim))
    fn = jax.jit(lambda v, zz, key: model.apply(
        v, zz, truncation_psi=psi, noise_mode="random",
        rngs={"noise": key}))
    imgs = np.stack([
        jax.device_get(fn(variables, z, jax.random.PRNGKey(seed + 1 + i)))[0]
        for i in range(samples)])
    var_map = imgs.std(axis=0).mean(axis=-1, keepdims=True)  # [H, W, 1]
    var_img = adjust_range(var_map / max(var_map.max(), 1e-8),
                           (0, 1), (-1, 1))
    pil = to_pil(np.repeat(var_img, 3, axis=-1))
    if path:
        pil.save(path)
    return pil
