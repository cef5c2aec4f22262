"""Wing and Adaptive Wing landmark losses, jit-safe.

Behavioral spec: wing_loss.py:12-27 (omega=10, epsilon=2, piecewise
log/linear over landmark coordinate residuals) and adaptive_wing_loss.py:12-39
(omega=14, theta=0.5, epsilon=1, alpha=2.1 over heatmaps) in the reference.
The reference's masked-indexing formulation (boolean fancy indexing) is
replaced by `jnp.where` — identical math, static shapes.

The reference computes landmarks with dlib on CPU every optimization step
(1024_example_wing_loss_perceptual_sqz_MSE.py:131-170) — non-differentiable,
so its wing loss can never steer the latent. Here the loss takes a
differentiable `landmark_fn(img) -> [B, 68, 2]` (any jitted landmark network
with converted weights; see make_wing_loss_term) so gradients flow end-to-end.
"""

from __future__ import annotations

import jax.numpy as jnp


def wing_loss(pred, target, omega=10.0, epsilon=2.0):
    """Piecewise log/linear loss (reference wing_loss.py:18-27)."""
    delta = jnp.abs(target - pred)
    c = omega - omega * jnp.log(1.0 + omega / epsilon)
    losses = jnp.where(delta < omega,
                       omega * jnp.log(1.0 + delta / epsilon),
                       delta - c)
    return jnp.mean(losses)


def adaptive_wing_loss(pred, target, omega=14.0, theta=0.5, epsilon=1.0,
                       alpha=2.1):
    """Adaptive wing loss over heatmaps (reference adaptive_wing_loss.py:18-39).
    The exponent adapts to the target heatmap value y.

    Behavioral-parity note: the reference implementation normalizes the
    small-|dy| branch by OMEGA (`pow(delta/omega, alpha-y)`,
    adaptive_wing_loss.py:33) where the AWing paper uses epsilon; we
    reproduce the reference exactly (golden-tested against its executed
    module in tests/test_golden_reference.py)."""
    y = target
    delta = jnp.abs(y - pred)
    p = alpha - y
    ratio = theta / epsilon
    a = omega * (1.0 / (1.0 + ratio ** p)) * p * (ratio ** (p - 1.0)) / epsilon
    c = theta * a - omega * jnp.log(1.0 + ratio ** p)
    losses = jnp.where(delta < theta,
                       omega * jnp.log(1.0 + (delta / omega) ** p),
                       a * delta - c)
    return jnp.mean(losses)


def make_adaptive_wing_loss_term(heatmap_fn, omega=14.0, theta=0.5,
                                 epsilon=1.0, alpha=2.1):
    """Loss-stack term: adaptive wing loss between the landmark HEATMAPS of
    the generated and the target image (the reference's
    1024_example_wing_loss_adaptive.py applies AWing to heatmap-space
    residuals, adaptive_wing_loss.py:12-39). heatmap_fn:
    img NHWC [-1,1] -> [B, H, W, K] heatmaps IN [0, 1]
    (losses/landmarks.py::landmark_heatmaps_01 — NOT the raw logits: the
    adaptive exponent p = alpha - y needs y in [0, 1]; logit-scale targets
    make p < 1 and the small-delta branch's gradient diverge at delta=0)."""
    def loss(img, target):
        return adaptive_wing_loss(heatmap_fn(img), heatmap_fn(target),
                                  omega, theta, epsilon, alpha)
    return loss


def make_wing_loss_term(landmark_fn, target_landmarks=None, omega=10.0,
                        epsilon=2.0):
    """Loss-stack term: wing loss between predicted landmarks of the
    generated image and of the target image (or precomputed
    target_landmarks). landmark_fn: img NHWC [-1,1] -> [B, 68, 2]."""
    def loss(img, target):
        pred = landmark_fn(img)
        tgt = target_landmarks if target_landmarks is not None \
            else landmark_fn(target)
        return wing_loss(pred, tgt, omega, epsilon)
    return loss
