"""MDF (multi-scale discriminative feature) loss in JAX.

Behavioral spec: mdfloss.py:5-48 + SinGAN/models.py:7-38 in the reference —
a stack of SinGAN WDiscriminators (ConvBlock = conv/BN/leaky-0.2, a body of
shrinking widths, 1-channel tail); the loss sums, over <=8 scales and the 3
tap points [head_out, body_out, tail_out], the per-sample L2 between the
activations of the two images, then averages over the batch.

The discriminator stack is functional (params pytree); the reference's
pickled Ds_{SISR,Denoising,JPEG}.pth files load through
tools/convert_mdf.py. BatchNorm runs in inference mode (running stats folded
into scale/shift at conversion time).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, b, padding):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b[None, None, None, :]


def _conv_block(x, p, padding):
    """conv -> folded-BN (scale/shift) -> leaky_relu(0.2)
    (SinGAN/models.py:7-12)."""
    x = _conv(x, p["w"], p["b"], padding)
    x = x * p["bn_scale"][None, None, None, :] + p["bn_shift"][None, None, None, :]
    return jax.nn.leaky_relu(x, 0.2)


def wdiscriminator_taps(params: Dict, x, padding=0) -> List:
    """Return [head_out, body_out, tail_out] (models.py:28-36, is_loss=True)."""
    x1 = _conv_block(x, params["head"], padding)
    x2 = x1
    for blk in params["body"]:
        x2 = _conv_block(x2, blk, padding)
    x3 = _conv(x2, params["tail_w"], params["tail_b"], padding)
    return [x1, x2, x3]


def mdf_loss(ds_params: List[Dict], x, y, num_scales=8, is_ascending=True,
             padding=0):
    """Reference MDFLoss.forward (mdfloss.py:16-48). x, y: NHWC."""
    batch = x.shape[0]
    loss = jnp.zeros([batch], jnp.float32)
    num_discs = len(ds_params)
    for scale_idx in range(min(num_scales, num_discs)):
        scale = scale_idx if is_ascending else num_discs - 1 - scale_idx
        d = ds_params[scale]
        pxs = wdiscriminator_taps(d, x, padding)
        pys = wdiscriminator_taps(d, y, padding)
        for px, py in zip(pxs, pys):
            loss = loss + jnp.mean(jnp.square(px - py), axis=(1, 2, 3))
    return jnp.mean(loss)


def make_mdf_loss(ds_params: List[Dict], num_scales=8, padding=0):
    def loss(img, target):
        return mdf_loss(ds_params, img, target, num_scales=num_scales,
                        padding=padding)
    return loss


def random_mdf_params(num_discs=8, nfc=32, min_nfc=32, num_layer=5, nc_im=3,
                      ker_size=3, seed=0) -> List[Dict]:
    """Random WDiscriminator stack with SinGAN's default widths
    (architecture tests without the pickled weights)."""
    rng = np.random.RandomState(seed)

    def conv_p(cin, cout, k):
        return {"w": jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32)
                                 / np.sqrt(cin * k * k)),
                "b": jnp.zeros(cout, jnp.float32)}

    def block_p(cin, cout, k):
        p = conv_p(cin, cout, k)
        p["bn_scale"] = jnp.ones(cout, jnp.float32)
        p["bn_shift"] = jnp.zeros(cout, jnp.float32)
        return p

    ds = []
    for _ in range(num_discs):
        n = nfc
        d = {"head": block_p(nc_im, n, ker_size), "body": []}
        for i in range(num_layer - 2):
            n_out = int(nfc / 2 ** (i + 1))
            d["body"].append(block_p(max(2 * n_out, min_nfc),
                                     max(n_out, min_nfc), ker_size))
            n = max(n_out, min_nfc)
        tail = conv_p(n, 1, ker_size)
        d["tail_w"], d["tail_b"] = tail["w"], tail["b"]
        ds.append(d)
    return ds
