"""Bilinear grid sampling with full autodiff (NHWC).

Behavioral spec: torch_utils/ops/grid_sample_gradfix.py in the reference —
bilinear, align_corners=True, zero-padding grid_sample with 2nd-order
gradient support (unused on the reference's main path, kept for parity).
JAX autodiff provides arbitrary-order gradients for free.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(x, grid):
    """x: [N, H, W, C]; grid: [N, Ho, Wo, 2] with (x, y) in [-1, 1]
    (align_corners=True). Out-of-range samples read zeros."""
    n, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        batch_idx = jnp.arange(n)[:, None, None]
        vals = x[batch_idx, yc, xc]                  # [N, Ho, Wo, C]
        return vals * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None].astype(x.dtype)
    fy = fy[..., None].astype(x.dtype)
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)
