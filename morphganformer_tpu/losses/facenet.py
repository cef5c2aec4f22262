"""FaceNet InceptionResnetV1 in functional JAX (NHWC).

Behavioral spec: the reference's biometric projection loss uses
facenet_pytorch's InceptionResnetV1 pretrained on VGGFace2
(1024_example_FaceNet_percept.py:30-44): embed generated + target images,
MSE between the 512-d embeddings. The architecture here mirrors
facenet_pytorch exactly (stem, 5x Block35, Mixed_6a, 10x Block17, Mixed_7a,
5x Block8, Block8(noReLU), avgpool, linear 1792->512, BN); weights convert
via tools/convert_facenet.py (conv OIHW->HWIO, BN folded).

Input: NHWC in [-1, 1], resized to 160x160 (facenet_pytorch's input size;
its own prewhitening maps [0,255] to roughly [-1,1], so generator output
feeds directly)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _conv_bn(x, p, stride=1, padding=0, relu=True):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * p["scale"][None, None, None, :] + p["shift"][None, None, None, :]
    return jax.nn.relu(y) if relu else y


def _conv(x, p, stride=1, padding=0):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"][None, None, None, :]


def _maxpool(x, size=3, stride=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, size, size, 1), (1, stride, stride, 1),
                                 "VALID")


def _block35(x, p, scale=0.17):
    b0 = _conv_bn(x, p["b0"])
    b1 = _conv_bn(_conv_bn(x, p["b1_0"]), p["b1_1"], padding=1)
    b2 = _conv_bn(_conv_bn(_conv_bn(x, p["b2_0"]), p["b2_1"], padding=1),
                  p["b2_2"], padding=1)
    up = _conv(jnp.concatenate([b0, b1, b2], axis=-1), p["conv2d"])
    return jax.nn.relu(x + up * scale)


def _block17(x, p, scale=0.10):
    b0 = _conv_bn(x, p["b0"])
    b1 = _conv_bn(x, p["b1_0"])
    b1 = _conv_bn(b1, p["b1_1"], padding=((0, 0), (3, 3)))   # 1x7
    b1 = _conv_bn(b1, p["b1_2"], padding=((3, 3), (0, 0)))   # 7x1
    up = _conv(jnp.concatenate([b0, b1], axis=-1), p["conv2d"])
    return jax.nn.relu(x + up * scale)


def _block8(x, p, scale=0.20, relu=True):
    b0 = _conv_bn(x, p["b0"])
    b1 = _conv_bn(x, p["b1_0"])
    b1 = _conv_bn(b1, p["b1_1"], padding=((0, 0), (1, 1)))   # 1x3
    b1 = _conv_bn(b1, p["b1_2"], padding=((1, 1), (0, 0)))   # 3x1
    up = _conv(jnp.concatenate([b0, b1], axis=-1), p["conv2d"])
    out = x + up * scale
    return jax.nn.relu(out) if relu else out


def facenet_embed(params: Dict, x):
    """x: NHWC 160x160 in [-1,1] -> L2-normalized [B, 512] embedding
    (facenet_pytorch normalizes the output embedding)."""
    x = _conv_bn(x, params["conv2d_1a"], stride=2)
    x = _conv_bn(x, params["conv2d_2a"])
    x = _conv_bn(x, params["conv2d_2b"], padding=1)
    x = _maxpool(x)
    x = _conv_bn(x, params["conv2d_3b"])
    x = _conv_bn(x, params["conv2d_4a"], padding=0)
    x = _conv_bn(x, params["conv2d_4b"], stride=2)
    for p in params["repeat_1"]:          # 5x Block35
        x = _block35(x, p)
    # Mixed_6a
    m = params["mixed_6a"]
    x = jnp.concatenate([
        _conv_bn(x, m["b0"], stride=2),
        _conv_bn(_conv_bn(_conv_bn(x, m["b1_0"]), m["b1_1"], padding=1),
                 m["b1_2"], stride=2),
        _maxpool(x),
    ], axis=-1)
    for p in params["repeat_2"]:          # 10x Block17
        x = _block17(x, p)
    # Mixed_7a
    m = params["mixed_7a"]
    x = jnp.concatenate([
        _conv_bn(_conv_bn(x, m["b0_0"]), m["b0_1"], stride=2),
        _conv_bn(_conv_bn(x, m["b1_0"]), m["b1_1"], stride=2),
        _conv_bn(_conv_bn(_conv_bn(x, m["b2_0"]), m["b2_1"], padding=1),
                 m["b2_2"], stride=2),
        _maxpool(x),
    ], axis=-1)
    for p in params["repeat_3"]:          # 5x Block8
        x = _block8(x, p)
    x = _block8(x, params["block8"], scale=1.0, relu=False)
    x = jnp.mean(x, axis=(1, 2))          # adaptive avg pool
    x = x @ params["last_w"]              # 1792 -> 512, no bias
    x = x * params["last_bn_scale"] + params["last_bn_shift"]
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def make_facenet_loss(params: Dict, input_size=160):
    """Embedding-MSE loss term (reference
    1024_example_FaceNet_percept.py:146-160)."""
    def loss(img, target):
        r = lambda i: jax.image.resize(
            i, (i.shape[0], input_size, input_size, i.shape[3]), "bilinear")
        e1 = facenet_embed(params, r(img))
        e2 = facenet_embed(params, r(target))
        return jnp.mean(jnp.square(e1 - e2))
    return loss


def random_facenet_params(seed=0) -> Dict:
    """Random-weight InceptionResnetV1 (plumbing tests)."""
    rng = np.random.RandomState(seed)

    def cb(cin, cout, kh, kw=None):
        kw = kw if kw is not None else kh
        return {"w": jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32)
                                 / np.sqrt(cin * kh * kw)),
                "scale": jnp.ones(cout, jnp.float32),
                "shift": jnp.zeros(cout, jnp.float32)}

    def cv(cin, cout, k=1):
        return {"w": jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32)
                                 / np.sqrt(cin * k * k)),
                "b": jnp.zeros(cout, jnp.float32)}

    p = {"conv2d_1a": cb(3, 32, 3), "conv2d_2a": cb(32, 32, 3),
         "conv2d_2b": cb(32, 64, 3), "conv2d_3b": cb(64, 80, 1),
         "conv2d_4a": cb(80, 192, 3), "conv2d_4b": cb(192, 256, 3)}
    p["repeat_1"] = [{"b0": cb(256, 32, 1), "b1_0": cb(256, 32, 1),
                      "b1_1": cb(32, 32, 3), "b2_0": cb(256, 32, 1),
                      "b2_1": cb(32, 32, 3), "b2_2": cb(32, 32, 3),
                      "conv2d": cv(96, 256)} for _ in range(5)]
    p["mixed_6a"] = {"b0": cb(256, 384, 3), "b1_0": cb(256, 192, 1),
                     "b1_1": cb(192, 192, 3), "b1_2": cb(192, 256, 3)}
    c17 = 896
    p["repeat_2"] = [{"b0": cb(c17, 128, 1), "b1_0": cb(c17, 128, 1),
                      "b1_1": cb(128, 128, 1, 7), "b1_2": cb(128, 128, 7, 1),
                      "conv2d": cv(256, c17)} for _ in range(10)]
    p["mixed_7a"] = {"b0_0": cb(c17, 256, 1), "b0_1": cb(256, 384, 3),
                     "b1_0": cb(c17, 256, 1), "b1_1": cb(256, 256, 3),
                     "b2_0": cb(c17, 256, 1), "b2_1": cb(256, 256, 3),
                     "b2_2": cb(256, 256, 3)}
    c8 = 1792
    p["repeat_3"] = [{"b0": cb(c8, 192, 1), "b1_0": cb(c8, 192, 1),
                      "b1_1": cb(192, 192, 1, 3), "b1_2": cb(192, 192, 3, 1),
                      "conv2d": cv(384, c8)} for _ in range(5)]
    p["block8"] = {"b0": cb(c8, 192, 1), "b1_0": cb(c8, 192, 1),
                   "b1_1": cb(192, 192, 1, 3), "b1_2": cb(192, 192, 3, 1),
                   "conv2d": cv(384, c8)}
    p["last_w"] = jnp.asarray(rng.randn(c8, 512).astype(np.float32) * 0.02)
    p["last_bn_scale"] = jnp.ones(512, jnp.float32)
    p["last_bn_shift"] = jnp.zeros(512, jnp.float32)
    return p
