"""Behavioral tests for the TRAINED landmark model (VERDICT r1 #6).

The committed weights (losses/weights/landmarks_synthetic.npz) are trained
by tools/train_landmarks.py on the synthetic-face stream, so these tests
check real localization behavior — not plumbing: landmark error on held-out
synthetic faces must be small, and the wing loss through the trained net
must produce gradients that pull an offset image toward its target.
"""

import os

import numpy as np
import pytest

WEIGHTS = os.path.join(
    os.path.dirname(__file__), "..", "morphganformer_tpu", "losses",
    "weights", "landmarks_synthetic.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS),
    reason="trained landmark weights not built yet "
           "(run tools/train_landmarks.py)")


@pytest.fixture(scope="module")
def landmark_fn():
    from morphganformer_tpu.losses.landmarks import (
        load_landmark_npz, make_landmark_fn)
    return make_landmark_fn(load_landmark_npz(WEIGHTS), temperature=0.05)


def test_landmark_error_on_heldout_faces(landmark_fn):
    """Mean landmark error < 6 px at 256 scale on unseen synthetic faces
    (the training run reports ~1-3 px val error; 6 px is the regression
    bound)."""
    import jax.numpy as jnp

    from morphganformer_tpu.losses.synthetic_faces import sample_batch

    rng = np.random.RandomState(991)            # never seen in training
    imgs, lms = sample_batch(rng, 16, 128)
    pred = np.asarray(landmark_fn(jnp.asarray(imgs)))
    err = np.linalg.norm(pred - lms, axis=-1).mean() * 256
    assert err < 6.0, f"mean landmark error {err:.2f}px at 256 scale"


def test_landmarks_track_translation(landmark_fn):
    """Shifting the face must shift the predictions by about the same
    amount — localization, not memorization."""
    import jax.numpy as jnp

    from morphganformer_tpu.losses.synthetic_faces import (
        render_face, sample_face)

    rng = np.random.RandomState(123)
    img, lm = sample_face(rng, 128)
    p0 = np.asarray(landmark_fn(jnp.asarray(img[None])))[0]

    shift = 8  # pixels at 128 => 0.0625 normalized
    # img is [H, W, 3]: axis 0 is y (down), axis 1 is x; predictions are
    # (x, y) pairs.
    rolled = np.roll(img, shift, axis=0)  # shift down
    p1 = np.asarray(landmark_fn(jnp.asarray(rolled[None])))[0]
    dy = (p1 - p0)[:, 1].mean()
    assert abs(dy - shift / 128) < 0.02, f"dy {dy:.4f} vs {shift/128:.4f}"
    assert abs((p1 - p0)[:, 0].mean()) < 0.02

    rolled_x = np.roll(img, shift, axis=1)  # shift right
    p2 = np.asarray(landmark_fn(jnp.asarray(rolled_x[None])))[0]
    dx = (p2 - p0)[:, 0].mean()
    assert abs(dx - shift / 128) < 0.02, f"dx {dx:.4f} vs {shift/128:.4f}"
    assert abs((p2 - p0)[:, 1].mean()) < 0.02


def test_wing_loss_gradient_pulls_toward_target(landmark_fn):
    """The differentiable wing loss (the reference's severed-graph wing loss
    can't do this, SURVEY.md §2.6): optimizing a 2-parameter translation of
    an offset image must reduce the wing loss toward the aligned target."""
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.losses.synthetic_faces import sample_face
    from morphganformer_tpu.losses.wing import make_wing_loss_term

    rng = np.random.RandomState(5)
    img, _ = sample_face(rng, 128)
    target = jnp.asarray(img[None])
    start = jnp.asarray(np.roll(img, 6, axis=0)[None])  # offset copy

    wing_term = make_wing_loss_term(landmark_fn)

    def shifted(img_, offset):
        # Differentiable vertical translation via jax.image affine resize.
        h = img_.shape[1]
        coords = (jnp.arange(h, dtype=jnp.float32) - offset)
        idx = jnp.clip(coords, 0, h - 1)
        lo = jnp.floor(idx).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, h - 1)
        frac = (idx - lo)[None, :, None, None]
        return img_[:, lo] * (1 - frac) + img_[:, hi] * frac

    def loss(offset):
        return wing_term(shifted(start, offset), target)

    g = jax.grad(loss)(0.0)
    l0 = float(loss(0.0))
    # One gradient step with a sane lr must reduce the loss.
    step = -np.sign(float(g)) * 2.0
    l1 = float(loss(step))
    assert l1 < l0, f"wing loss did not decrease: {l0} -> {l1} (grad {g})"


def test_awing_term_gradient_finite_at_convergence():
    """Regression: the awing projection term must run on [0,1] sigmoid
    heatmaps (landmark_heatmaps_01). With the TRAINED weights, raw logits
    exceed alpha - 1, making p = alpha - y negative and the small-delta
    gradient non-finite exactly as the residual -> 0 — i.e. projection
    NaNs as it converges."""
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.losses.landmarks import (
        landmark_heatmaps, landmark_heatmaps_01, load_landmark_npz)
    from morphganformer_tpu.losses.wing import make_adaptive_wing_loss_term

    params = load_landmark_npz(WEIGHTS)
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)

    term01 = make_adaptive_wing_loss_term(
        lambda im: landmark_heatmaps_01(params, im))
    g = jax.grad(lambda im: term01(im, target))(target)  # delta == 0 exactly
    assert bool(jnp.all(jnp.isfinite(g))), "awing grad blew up at delta=0"

    # The raw-logit wiring this guards against really is non-finite here.
    term_logits = make_adaptive_wing_loss_term(
        lambda im: landmark_heatmaps(params, im))
    g_bad = jax.grad(lambda im: term_logits(im, target))(target)
    assert not bool(jnp.all(jnp.isfinite(g_bad)))
