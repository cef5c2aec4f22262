"""Local Binary Pattern texture features, dependency-free.

Behavioral spec: the reference's LBP projection script uses
skimage.feature.local_binary_pattern + feature distance
(1024_example_LBP_percept.py:40-57,164-166). LBP is a hard-threshold code
(inherently non-differentiable), and the reference's projection had no
gradients anyway (SURVEY.md §2.6); here LBP ships as:

  * `local_binary_pattern`: exact 8-neighbor LBP codes (numpy, matches
    skimage's 'default' method for P=8, R=1 on integer images),
  * `lbp_histogram` + `lbp_distance`: the matching objective,
  * `soft_lbp_loss`: a differentiable sigmoid-relaxed variant usable inside
    the jitted projection loss stack (documented extension, not in the
    reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 8-neighbor offsets in skimage order (angle k*2pi/8 starting at +x, i.e.
# (dy, dx) for R=1): right, up-right, up, up-left, left, down-left, down,
# down-right.
_OFFSETS = [(0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1)]


def _to_gray(img):
    x = np.asarray(img, dtype=np.float64)
    if x.ndim == 3 and x.shape[-1] == 3:
        x = 0.2125 * x[..., 0] + 0.7154 * x[..., 1] + 0.0721 * x[..., 2]
    elif x.ndim == 3:
        x = x[..., 0]
    return x


def local_binary_pattern(img, P=8, R=1):
    """Default-method LBP codes for P=8, R=1 over a 2D (or HWC) image."""
    assert P == 8 and R == 1, "only the reference's 8,1 configuration"
    g = _to_gray(img)
    h, w = g.shape
    padded = np.pad(g, 1, mode="edge")
    code = np.zeros((h, w), dtype=np.uint8)
    for bit, (dy, dx) in enumerate(_OFFSETS):
        neighbor = padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        code |= ((neighbor >= g).astype(np.uint8) << bit)
    return code


def lbp_histogram(img, P=8, R=1, bins=256):
    code = local_binary_pattern(img, P, R)
    hist, _ = np.histogram(code, bins=bins, range=(0, bins))
    return hist.astype(np.float64) / code.size


def lbp_distance(img_a, img_b):
    """Histogram L2 distance — the reference's matching objective
    (1024_example_LBP_percept.py:164-166 computes feature distance)."""
    ha = lbp_histogram(img_a)
    hb = lbp_histogram(img_b)
    return float(np.sqrt(np.sum((ha - hb) ** 2)))


def soft_lbp_features(img, temperature=0.1):
    """Differentiable LBP relaxation: sigmoid((neighbor-center)/T) per
    direction, spatially averaged -> [B, 8] texture descriptor."""
    x = img
    if x.shape[-1] == 3:
        w = jnp.asarray([0.2125, 0.7154, 0.0721])
        x = jnp.sum(x * w, axis=-1, keepdims=True)
    feats = []
    for dy, dx in _OFFSETS:
        shifted = jnp.roll(x, shift=(dy, dx), axis=(1, 2))
        feats.append(jnp.mean(jax.nn.sigmoid((shifted - x) / temperature),
                              axis=(1, 2, 3)))
    return jnp.stack(feats, axis=-1)


def soft_lbp_loss(img, target, temperature=0.1):
    return jnp.mean(jnp.square(soft_lbp_features(img, temperature)
                               - soft_lbp_features(target, temperature)))
