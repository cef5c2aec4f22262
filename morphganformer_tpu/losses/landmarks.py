"""Differentiable 68-point facial landmark prediction.

The reference computes landmarks with dlib on CPU inside the projection loop
(1024_example_wing_loss_perceptual_sqz_MSE.py:131-170) — non-differentiable
and host-bound, so its wing loss cannot steer the latent (SURVEY.md §2.6/§7.2).
Here landmarks come from a jitted heatmap CNN with soft-argmax decoding, so
the wing loss is a true gradient signal. The backbone is a compact
stride-pyramid CNN producing [B, H/4, W/4, 68] heatmaps; any trained
landmark model with this interface plugs in (convert weights into the same
tree), and `random_landmark_params` provides plumbing weights for tests.

Also includes the 68-point CSV export used by the Delaunay warp
(reference AdaptiveWingLoss/facial_landmarks_2.py)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_LANDMARKS = 68


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p["b"][None, None, None, :])


def landmark_heatmaps(params: Dict, x):
    """x: NHWC in [-1,1], any square size (resized to 256).
    Returns [B, 64, 64, 68] heatmaps."""
    x = jax.image.resize(x, (x.shape[0], 256, 256, x.shape[3]), "bilinear")
    x = _conv(x, params["c0"], stride=2)      # 128
    x = _conv(x, params["c1"])
    x = _conv(x, params["c2"], stride=2)      # 64
    x = _conv(x, params["c3"])
    x = _conv(x, params["c4"])
    y = jax.lax.conv_general_dilated(
        x, params["head_w"], window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["head_b"][None, None, None, :]


def landmark_heatmaps_01(params: Dict, x):
    """landmark_heatmaps squashed to [0, 1] with sigmoid — the space the
    model is trained in (tools/train_landmarks.py matches sigmoid(logits)
    to unit-peak gaussians) and the space heatmap losses assume (the
    adaptive wing loss's exponent alpha - y needs y in [0, 1], reference
    adaptive_wing_loss.py:18-39)."""
    return jax.nn.sigmoid(landmark_heatmaps(params, x))


def soft_argmax(heatmaps, temperature=1.0):
    """Differentiable heatmap -> (x, y) coordinates in [0, 1].
    heatmaps: [B, H, W, K] -> [B, K, 2]."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k) / temperature
    probs = jax.nn.softmax(flat.astype(jnp.float32), axis=1)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid_y = jnp.repeat(ys, w)
    grid_x = jnp.tile(xs, h)
    ey = jnp.einsum("bpk,p->bk", probs, grid_y)
    ex = jnp.einsum("bpk,p->bk", probs, grid_x)
    return jnp.stack([ex, ey], axis=-1)


def make_landmark_fn(params: Dict, image_size=None, temperature=1.0):
    """Return img -> [B, 68, 2] pixel coordinates (scaled to the input
    resolution when image_size is given, else normalized [0,1])."""
    def fn(img):
        hm = landmark_heatmaps(params, img)
        coords = soft_argmax(hm, temperature)
        if image_size is not None:
            coords = coords * image_size
        return coords
    return fn


def random_landmark_params(width=64, seed=0) -> Dict:
    rng = np.random.RandomState(seed)

    def cv(cin, cout, k=3):
        return {"w": jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32)
                                 / np.sqrt(cin * k * k)),
                "b": jnp.zeros(cout, jnp.float32)}

    p = {"c0": cv(3, width), "c1": cv(width, width),
         "c2": cv(width, width * 2), "c3": cv(width * 2, width * 2),
         "c4": cv(width * 2, width * 2)}
    head = cv(width * 2, NUM_LANDMARKS, 1)
    p["head_w"], p["head_b"] = head["w"], head["b"]
    return p


def bundled_landmark_path():
    """Path to the committed synthetic-face-trained model
    (tools/train_landmarks.py), or None if absent. Overridable via
    $MGT_LANDMARK_NPZ (e.g. a converted real-data model)."""
    import os
    env = os.environ.get("MGT_LANDMARK_NPZ")
    if env and os.path.exists(env):
        return env
    path = os.path.join(os.path.dirname(__file__), "weights",
                        "landmarks_synthetic.npz")
    return path if os.path.exists(path) else None


def load_landmark_npz(path) -> Dict:
    data = np.load(path)
    p = {}
    for key in data.files:
        if key in ("head_w", "head_b"):
            p[key] = jnp.asarray(data[key])
        else:
            name, leaf = key.rsplit("_", 1)
            p.setdefault(name, {})[leaf] = jnp.asarray(data[key])
    return p


def save_landmarks_csv(path, coords):
    """Write [68, 2] (x, y) pixel landmarks as CSV rows — the format the
    reference's batch extractor produces and the warp consumes."""
    np.savetxt(path, np.asarray(coords), delimiter=",", fmt="%.3f")
