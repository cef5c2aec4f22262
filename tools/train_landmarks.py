#!/usr/bin/env python
"""Train the compact 68-point landmark CNN (losses/landmarks.py) on the
synthetic face stream (losses/synthetic_faces.py).

The reference gets landmarks from dlib's iBUG-trained predictor
(1024_example_wing_loss_perceptual_sqz_MSE.py:131-170); that model/data are
unavailable zero-egress, so this trains the SAME architecture the projection
uses on procedurally generated faces with exact landmark labels. The result
(committed at morphganformer_tpu/losses/weights/landmarks_synthetic.npz) is
a real trained model that gives the wing loss true gradients; converting a
real-data model later is a weight swap via the identical npz layout.

Loss: gaussian-heatmap MSE + soft-argmax coordinate L2 (standard heatmap
regression recipe). ~2k Adam steps reach ~1px mean error at 64x64 heatmap
resolution on held-out synthetic faces.

Usage: python tools/train_landmarks.py [steps] [out.npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from morphganformer_tpu.losses.landmarks import (
    NUM_LANDMARKS,
    landmark_heatmaps,
    random_landmark_params,
    soft_argmax,
)
from morphganformer_tpu.losses.synthetic_faces import sample_batch

HM = 64  # heatmap resolution (256-input backbone stride 4)


def gaussian_targets(coords, sigma=1.5):
    """coords [B,68,2] in [0,1] -> [B,HM,HM,68] unit-peak gaussians."""
    ys = (jnp.arange(HM, dtype=jnp.float32) + 0.5) / HM
    xs = (jnp.arange(HM, dtype=jnp.float32) + 0.5) / HM
    dy = ys[None, :, None] - coords[:, None, :, 1]        # [B,HM,68]
    dx = xs[None, :, None] - coords[:, None, :, 0]
    s2 = 2.0 * (sigma / HM) ** 2
    gy = jnp.exp(-jnp.square(dy) / s2)
    gx = jnp.exp(-jnp.square(dx) / s2)
    return gy[:, :, None, :] * gx[:, None, :, :]          # [B,HM,HM,68]


def loss_fn(params, imgs, coords):
    hm = landmark_heatmaps(params, imgs)
    target = gaussian_targets(coords)
    hm_loss = jnp.mean(jnp.square(jax.nn.sigmoid(hm) - target))
    pred = soft_argmax(hm, temperature=0.05)
    coord_loss = jnp.mean(jnp.sum(jnp.square(pred - coords), axis=-1))
    return hm_loss * 10.0 + coord_loss, (hm_loss, coord_loss)


def save_npz(path, params):
    """Inverse of losses.landmarks.load_landmark_npz."""
    flat = {}
    for name, v in params.items():
        if name in ("head_w", "head_b"):
            flat[name] = np.asarray(v)
        else:
            for leaf, arr in v.items():
                flat[f"{name}_{leaf}"] = np.asarray(arr)
    np.savez(path, **flat)


def main(steps=2000, out=None, batch=32, size=128, lr=2e-3, seed=0,
         dataset_size=2048, log_every=100):
    out = out or os.path.join(
        os.path.dirname(__file__), "..", "morphganformer_tpu", "losses",
        "weights", "landmarks_synthetic.npz")
    rng = np.random.RandomState(seed)
    print(f"generating {dataset_size} synthetic faces...", flush=True)
    t0 = time.time()
    imgs, lms = sample_batch(rng, dataset_size, size)
    val_imgs, val_lms = sample_batch(np.random.RandomState(seed + 1), 128,
                                     size)
    print(f"dataset: {time.time()-t0:.0f}s", flush=True)

    params = random_landmark_params(seed=seed)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, bi, bl):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bi, bl)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    @jax.jit
    def val_err(params, bi, bl):
        pred = soft_argmax(landmark_heatmaps(params, bi), temperature=0.05)
        return jnp.mean(jnp.linalg.norm(pred - bl, axis=-1))

    t0 = time.time()
    for i in range(steps):
        idx = rng.randint(0, dataset_size, batch)
        params, opt_state, loss, aux = step(
            params, opt_state, jnp.asarray(imgs[idx]), jnp.asarray(lms[idx]))
        if i % log_every == 0 or i == steps - 1:
            err = float(val_err(params, jnp.asarray(val_imgs),
                                jnp.asarray(val_lms)))
            print(f"step {i:5d} loss {float(loss):.5f} "
                  f"hm {float(aux[0]):.5f} coord {float(aux[1]):.5f} "
                  f"val_err {err*256:.2f}px@256 ({time.time()-t0:.0f}s)",
                  flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_npz(out, params)
    print(f"saved -> {out}")
    return float(err * 256)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else None
    main(steps, out)
