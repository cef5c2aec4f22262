"""Composable projection loss stack.

One ProjectionConfig-style weight table replaces the reference's 21 script
variants (SURVEY.md §2.6): every `1024_example_*` / `projection_example_*`
loss combination is a set of weights over registered terms, e.g.
  mse                      -> {"mse": 1.0}                   (1024_example_MSE.py)
  lpips + wing + mse       -> {"lpips": 1.0, "wing": 0.01, "mse": 1.0}
                              (1024_example_wing_loss_perceptual_sqz_MSE.py:179)
Terms are callables (img, target) -> scalar; perceptual/biometric terms are
closures over their feature networks.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from morphganformer_tpu.losses import pixel

LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

# Built-in, dependency-free terms.
_BUILTIN: Dict[str, LossFn] = {
    "mse": pixel.mse_loss,
    "l1": pixel.l1_loss,
    "psnr": pixel.psnr_loss,
    "ssim": pixel.dssim_loss,
}


def build_loss_stack(weights: Dict[str, float],
                     extra_terms: Dict[str, LossFn] = None) -> Callable:
    """Return loss_fn(img, target) -> (total, components) for the projection
    engine. `weights` maps term name -> weight; `extra_terms` supplies
    perceptual/biometric callables (lpips, facenet, wing, mdf, ...)."""
    terms = dict(_BUILTIN)
    if extra_terms:
        terms.update(extra_terms)
    active = {name: w for name, w in weights.items() if w != 0.0}
    unknown = set(active) - set(terms)
    if unknown:
        raise KeyError(f"unknown loss terms: {sorted(unknown)}; "
                       f"available: {sorted(terms)}")

    def loss_fn(img, target):
        comps = {}
        total = jnp.zeros((), jnp.float32)
        for name, w in active.items():
            v = terms[name](img, target)
            comps[name] = v
            total = total + w * v
        return total, comps

    return loss_fn


def parse_loss_spec(spec: str) -> Dict[str, float]:
    """Parse CLI loss specs like "mse", "lpips+mse", "lpips+0.01*wing+1*mse"
    into a weight dict (mirrors the reference scripts' hardcoded combos)."""
    weights: Dict[str, float] = {}
    for part in spec.split("+"):
        part = part.strip()
        if not part:
            continue
        if "*" in part:
            w, name = part.split("*", 1)
            weights[name.strip()] = float(w)
        else:
            weights[part] = weights.get(part, 0.0) + 1.0
    return weights
