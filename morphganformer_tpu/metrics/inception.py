"""InceptionV3 feature extractor in functional JAX (NHWC) for FID/KID/IS.

Behavioral spec: the reference's metrics download an NVIDIA TorchScript
Inception detector (frechet_inception_distance.py:9) producing 2048-d
pool features / 1008-way probs. That exact TorchScript graph is not
portable; this module implements the standard torchvision InceptionV3
(the detector used by pytorch-fid and most published FID numbers), with
weights converted by tools/convert_inception.py (conv OIHW->HWIO, BN folded
into scale/shift). `inception_features` returns the 2048-d pool vector;
`inception_logits` the 1000-way logits for IS.

Input: NHWC float images in [0, 255]; internally resized to 299 and
normalized with the torchvision transform.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _conv_bn(x, p, stride=1, padding=0):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * p["scale"][None, None, None, :] + p["shift"][None, None, None, :]
    return jax.nn.relu(y)


def _maxpool(x, size=3, stride=2, padding=0):
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    x = jnp.pad(x, pad, constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, size, size, 1), (1, stride, stride, 1),
                                 "VALID")


def _avgpool(x, size=3, stride=1, padding=1):
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    xp = jnp.pad(x, pad)
    ones = jnp.pad(jnp.ones_like(x[..., :1]), pad)
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, size, size, 1),
                              (1, stride, stride, 1), "VALID")
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, size, size, 1),
                              (1, stride, stride, 1), "VALID")
    return s / n


def _inception_a(x, p):
    b1 = _conv_bn(x, p["b1x1"])
    b5 = _conv_bn(_conv_bn(x, p["b5_1"]), p["b5_2"], padding=2)
    b3 = _conv_bn(_conv_bn(_conv_bn(x, p["b3_1"]), p["b3_2"], padding=1),
                  p["b3_3"], padding=1)
    bp = _conv_bn(_avgpool(x), p["bpool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p):
    b3 = _conv_bn(x, p["b3"], stride=2)
    bd = _conv_bn(_conv_bn(_conv_bn(x, p["bd_1"]), p["bd_2"], padding=1),
                  p["bd_3"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _conv_bn_asym(x, p, pad_h, pad_w):
    return _conv_bn(x, p, padding=((pad_h, pad_h), (pad_w, pad_w)))


def _inception_c(x, p):
    b1 = _conv_bn(x, p["b1x1"])
    b7 = _conv_bn(x, p["b7_1"])
    b7 = _conv_bn_asym(b7, p["b7_2"], 0, 3)       # 1x7
    b7 = _conv_bn_asym(b7, p["b7_3"], 3, 0)       # 7x1
    bd = _conv_bn(x, p["bd_1"])
    bd = _conv_bn_asym(bd, p["bd_2"], 3, 0)
    bd = _conv_bn_asym(bd, p["bd_3"], 0, 3)
    bd = _conv_bn_asym(bd, p["bd_4"], 3, 0)
    bd = _conv_bn_asym(bd, p["bd_5"], 0, 3)
    bp = _conv_bn(_avgpool(x), p["bpool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _conv_bn(_conv_bn(x, p["b3_1"]), p["b3_2"], stride=2)
    b7 = _conv_bn(x, p["b7_1"])
    b7 = _conv_bn_asym(b7, p["b7_2"], 0, 3)
    b7 = _conv_bn_asym(b7, p["b7_3"], 3, 0)
    b7 = _conv_bn(b7, p["b7_4"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(x, p):
    b1 = _conv_bn(x, p["b1x1"])
    b3 = _conv_bn(x, p["b3_1"])
    b3 = jnp.concatenate([
        _conv_bn_asym(b3, p["b3_2a"], 0, 1),      # 1x3
        _conv_bn_asym(b3, p["b3_2b"], 1, 0),      # 3x1
    ], axis=-1)
    bd = _conv_bn(_conv_bn(x, p["bd_1"]), p["bd_2"], padding=1)
    bd = jnp.concatenate([
        _conv_bn_asym(bd, p["bd_3a"], 0, 1),
        _conv_bn_asym(bd, p["bd_3b"], 1, 0),
    ], axis=-1)
    bp = _conv_bn(_avgpool(x), p["bpool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_backbone(params: Dict, x):
    """x: NHWC in [0,255] any size -> 2048-d pool features."""
    x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")
    x = x / 255.0
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (x - mean) / std

    x = _conv_bn(x, params["c1a"], stride=2)
    x = _conv_bn(x, params["c2a"])
    x = _conv_bn(x, params["c2b"], padding=1)
    x = _maxpool(x)
    x = _conv_bn(x, params["c3b"])
    x = _conv_bn(x, params["c4a"])
    x = _maxpool(x)
    x = _inception_a(x, params["m5b"])
    x = _inception_a(x, params["m5c"])
    x = _inception_a(x, params["m5d"])
    x = _inception_b(x, params["m6a"])
    for tag in ("m6b", "m6c", "m6d", "m6e"):
        x = _inception_c(x, params[tag])
    x = _inception_d(x, params["m7a"])
    x = _inception_e(x, params["m7b"])
    x = _inception_e(x, params["m7c"])
    return jnp.mean(x, axis=(1, 2))               # global average pool -> 2048


def inception_features(params: Dict, x):
    return inception_backbone(params, x)


def inception_logits(params: Dict, x):
    feats = inception_backbone(params, x)
    return feats @ params["fc_w"] + params["fc_b"]


def inception_probs(params: Dict, x):
    return jax.nn.softmax(inception_logits(params, x), axis=-1)


def make_detector(params: Dict, kind="features", jit=True):
    """Metric-registry detector: imgs [0,255] -> features/probs."""
    fn = {"features": inception_features, "probs": inception_probs}[kind]
    f = (lambda imgs: fn(params, jnp.asarray(imgs, jnp.float32)))
    if jit:
        inner = jax.jit(lambda imgs: fn(params, imgs))
        f = lambda imgs: inner(jnp.asarray(imgs, jnp.float32))
    return f


# ---------------------------------------------------------------- random init

_A_SPECS = {"b1x1": 64, "b5_1": 48, "b5_2": 64, "b3_1": 64, "b3_2": 96,
            "b3_3": 96}


def random_inception_params(seed=0) -> Dict:
    """Random-weight InceptionV3 (plumbing tests without torchvision files).
    Shapes mirror torchvision inception_v3 exactly."""
    rng = np.random.RandomState(seed)

    def cb(cin, cout, kh, kw=None):
        kw = kw if kw is not None else kh
        return {"w": jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32)
                                 / np.sqrt(cin * kh * kw)),
                "scale": jnp.ones(cout, jnp.float32),
                "shift": jnp.zeros(cout, jnp.float32)}

    p = {"c1a": cb(3, 32, 3), "c2a": cb(32, 32, 3), "c2b": cb(32, 64, 3),
         "c3b": cb(64, 80, 1), "c4a": cb(80, 192, 3)}

    def block_a(cin, pool):
        return {"b1x1": cb(cin, 64, 1), "b5_1": cb(cin, 48, 1),
                "b5_2": cb(48, 64, 5), "b3_1": cb(cin, 64, 1),
                "b3_2": cb(64, 96, 3), "b3_3": cb(96, 96, 3),
                "bpool": cb(cin, pool, 1)}

    p["m5b"] = block_a(192, 32)
    p["m5c"] = block_a(256, 64)
    p["m5d"] = block_a(288, 64)
    p["m6a"] = {"b3": cb(288, 384, 3), "bd_1": cb(288, 64, 1),
                "bd_2": cb(64, 96, 3), "bd_3": cb(96, 96, 3)}

    def block_c(cin, c7):
        return {"b1x1": cb(cin, 192, 1), "b7_1": cb(cin, c7, 1),
                "b7_2": cb(c7, c7, 1, 7), "b7_3": cb(c7, 192, 7, 1),
                "bd_1": cb(cin, c7, 1), "bd_2": cb(c7, c7, 7, 1),
                "bd_3": cb(c7, c7, 1, 7), "bd_4": cb(c7, c7, 7, 1),
                "bd_5": cb(c7, 192, 1, 7), "bpool": cb(cin, 192, 1)}

    p["m6b"] = block_c(768, 128)
    p["m6c"] = block_c(768, 160)
    p["m6d"] = block_c(768, 160)
    p["m6e"] = block_c(768, 192)
    p["m7a"] = {"b3_1": cb(768, 192, 1), "b3_2": cb(192, 320, 3),
                "b7_1": cb(768, 192, 1), "b7_2": cb(192, 192, 1, 7),
                "b7_3": cb(192, 192, 7, 1), "b7_4": cb(192, 192, 3)}

    def block_e(cin):
        return {"b1x1": cb(cin, 320, 1), "b3_1": cb(cin, 384, 1),
                "b3_2a": cb(384, 384, 1, 3), "b3_2b": cb(384, 384, 3, 1),
                "bd_1": cb(cin, 448, 1), "bd_2": cb(448, 384, 3),
                "bd_3a": cb(384, 384, 1, 3), "bd_3b": cb(384, 384, 3, 1),
                "bpool": cb(cin, 192, 1)}

    p["m7b"] = block_e(1280)
    p["m7c"] = block_e(2048)
    p["fc_w"] = jnp.asarray(rng.randn(2048, 1000).astype(np.float32) * 0.01)
    p["fc_b"] = jnp.zeros(1000, jnp.float32)
    return p


def load_inception_npz(path):
    """Rebuild the params tree from a converted .npz
    (tools/convert_inception.py writes it; key layout documented there)."""
    import numpy as np

    data = np.load(path)
    params = {}
    for key in data.files:
        if key in ("fc_w", "fc_b"):
            params[key] = jnp.asarray(data[key])
            continue
        name, leaf = key.rsplit("_", 1)
        if "." in name:
            block, branch = name.split(".", 1)
            params.setdefault(block, {}).setdefault(branch, {})[
                {"w": "w", "scale": "scale", "shift": "shift"}[leaf]] = \
                jnp.asarray(data[key])
        else:
            params.setdefault(name, {})[leaf] = jnp.asarray(data[key])
    return params
