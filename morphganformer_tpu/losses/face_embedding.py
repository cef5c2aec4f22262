"""Face-identity (biometric) embedding loss: ArcFace iresnet in JAX.

Behavioral spec: backbones/iresnet.py in the reference (iresnet18..200 +
get_model registry, backbones/__init__.py:5-25) — the shipped ArcFace
backbone family; and the FaceNet biometric projection loss
(1024_example_FaceNet_percept.py:30-44,146-160): embed generated + target
images, MSE between the embeddings.

Functional implementation (params pytree), BN folded to scale/shift at
conversion time (tools/convert_iresnet.py), input NHWC in [-1,1] resized to
112x112 (ArcFace input size). Fully differentiable, so the biometric loss
steers the latent (the reference's could not — its graph was severed).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

IRESNET_LAYERS = {
    "iresnet18": [2, 2, 2, 2],
    "iresnet34": [3, 4, 6, 3],
    "iresnet50": [3, 4, 14, 3],
    "iresnet100": [3, 13, 30, 3],
    "iresnet200": [6, 26, 60, 6],
}


def _conv(x, w, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    return x * p["scale"][None, None, None, :] + p["shift"][None, None, None, :]


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, x * alpha[None, None, None, :])


def _basic_block(x, p, stride):
    """IBasicBlock (reference iresnet.py:28-58): bn1-conv1-bn2-prelu-conv2-bn3
    with 1x1-conv downsample shortcut."""
    identity = x
    out = _bn(x, p["bn1"])
    out = _conv(out, p["conv1"])
    out = _bn(out, p["bn2"])
    out = _prelu(out, p["prelu"])
    out = _conv(out, p["conv2"], stride=stride)
    out = _bn(out, p["bn3"])
    if "down_w" in p:
        identity = _bn(_conv(x, p["down_w"], stride=stride, padding=0),
                       p["down_bn"])
    return out + identity


def iresnet_embed(params: Dict, x):
    """x: NHWC 112x112 in [-1,1] -> [B, 512] embedding."""
    x = _conv(x, params["conv1_w"])
    x = _bn(x, params["bn1"])
    x = _prelu(x, params["prelu"])
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        for i, blk in enumerate(params[layer]):
            x = _basic_block(x, blk, stride=2 if i == 0 else 1)
    x = _bn(x, params["bn2"])
    x = x.reshape(x.shape[0], -1)
    x = x @ params["fc_w"] + params["fc_b"]
    # features BatchNorm1d with fixed weight=1 (iresnet.py:100-102).
    x = x * params["feat_scale"] + params["feat_shift"]
    return x


def _resize_bilinear(img, size):
    return jax.image.resize(img, (img.shape[0], size, size, img.shape[3]),
                            method="bilinear")


def make_identity_loss(params: Dict, input_size=112):
    """Loss-stack term (reference 1024_example_FaceNet_percept.py:146-160):
    MSE between embeddings of generated and target images."""
    def loss(img, target):
        e1 = iresnet_embed(params, _resize_bilinear(img, input_size))
        e2 = iresnet_embed(params, _resize_bilinear(target, input_size))
        return jnp.mean(jnp.square(e1 - e2))
    return loss


def cosine_similarity(params: Dict, img_a, img_b, input_size=112):
    """Identity similarity for morph evaluation (Facenet_torch/ pipelines)."""
    e1 = iresnet_embed(params, _resize_bilinear(img_a, input_size))
    e2 = iresnet_embed(params, _resize_bilinear(img_b, input_size))
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = e2 / jnp.linalg.norm(e2, axis=-1, keepdims=True)
    return jnp.sum(e1 * e2, axis=-1)


def random_iresnet_params(name="iresnet18", num_features=512, seed=0) -> Dict:
    """Random-weight backbone (architecture tests without ArcFace weights)."""
    rng = np.random.RandomState(seed)
    layers = IRESNET_LAYERS[name]

    def conv_p(cin, cout, k):
        return jnp.asarray(
            rng.randn(k, k, cin, cout).astype(np.float32) / np.sqrt(cin * k * k))

    def bn_p(c):
        return {"scale": jnp.ones(c, jnp.float32),
                "shift": jnp.zeros(c, jnp.float32)}

    params = {
        "conv1_w": conv_p(3, 64, 3), "bn1": bn_p(64),
        "prelu": jnp.full((64,), 0.25, jnp.float32),
    }
    inplanes = 64
    for li, (planes, blocks) in enumerate(zip([64, 128, 256, 512], layers)):
        layer = []
        for bi in range(blocks):
            cin = inplanes if bi == 0 else planes
            blk = {
                "bn1": bn_p(cin), "conv1": conv_p(cin, planes, 3),
                "bn2": bn_p(planes),
                "prelu": jnp.full((planes,), 0.25, jnp.float32),
                "conv2": conv_p(planes, planes, 3), "bn3": bn_p(planes),
            }
            if bi == 0:  # stride-2 entry block always needs a projection
                blk["down_w"] = conv_p(cin, planes, 1)
                blk["down_bn"] = bn_p(planes)
            layer.append(blk)
        params[f"layer{li + 1}"] = layer
        inplanes = planes
    params["bn2"] = bn_p(512)
    params["fc_w"] = jnp.asarray(
        rng.randn(512 * 7 * 7, num_features).astype(np.float32) * 0.01)
    params["fc_b"] = jnp.zeros(num_features, jnp.float32)
    params["feat_scale"] = jnp.ones(num_features, jnp.float32)
    params["feat_shift"] = jnp.zeros(num_features, jnp.float32)
    return params
