"""Building-block layers for the GANformer (flax.linen, NHWC, equalized LR).

Behavioral spec: the basic-operations section of the reference
training/networks.py (normalize :30-37, get_weight :69-84, get_bias :87-89,
BiasActLayer :117-127, FullyConnectedLayer :131-150, ResnetLayer :154-172,
MLP :179-221, Conv2dLayer :225-250, positional encodings :390-491).

Parameters are stored exactly as the reference stores them (scaled-down by the
equalized-LR runtime coefficient) so converted checkpoints drop straight in;
weights are [in, out] / HWIO instead of torch's [out, in] / OIHW.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from morphganformer_tpu.ops import bias_act, conv2d_resample, setup_filter


def normalize_l2(x, eps=1e-8):
    """Normalize so mean-square over all non-batch dims is 1
    (reference networks.py:30-37, mode='l2'). Always float32."""
    x = x.astype(jnp.float32)
    dims = tuple(range(1, x.ndim))
    factor = jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=dims, keepdims=True) + eps)
    return x * factor


def get_global(ws):
    """Global latent component = last (reference networks.py:108-109)."""
    return ws[:, -1]


def get_components(ws):
    """Local latent components = all but last (reference networks.py:112-113)."""
    return ws[:, :-1]


def get_gain(arch: str) -> float:
    """Resnet branches scaled by 1/sqrt(2) (reference networks.py:104-105)."""
    return math.sqrt(0.5) if arch == "resnet" else 1.0


def weight_init(lrmul: float = 1.0):
    """Equalized-LR storage init: N(0, 1/lrmul), so the effective runtime
    weight (stored * he_std * lrmul) has std he_std.

    Deliberate fix over the reference: networks.py:82 computes
    `torch.randn(shape) / init_std` with init_std = 1/lrmul, i.e. stored std
    = lrmul and effective std = he_std * lrmul^2 — for the mapping network
    (lrmul=0.01) that collapses all fresh-init outputs to ~constant. The
    original TF StyleGAN2 initializes with std init_std = 1/lrmul (the
    convention restored here); converted checkpoints are unaffected since
    they overwrite the init."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) / lrmul
    return init


def runtime_coef(fan_in: int, gain: float = 1.0, lrmul: float = 1.0) -> float:
    """He-std runtime multiplier (reference networks.py:71-76)."""
    return gain / math.sqrt(fan_in) * lrmul


class FullyConnected(nn.Module):
    """act(x @ w + b) with equalized LR (reference FullyConnectedLayer,
    networks.py:131-150). Operates on the last axis of arbitrarily-shaped x."""
    features: int
    use_bias: bool = True
    act: str = "linear"
    gain: float = 1.0
    lrmul: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param("weight", weight_init(self.lrmul), (in_features, self.features))
        coef = runtime_coef(in_features, self.gain, self.lrmul)
        y = x @ (w * coef).astype(x.dtype)
        b = None
        if self.use_bias:
            b = self.param(
                "bias", lambda k, s: jnp.full(s, self.bias_init, jnp.float32),
                (self.features,),
            )
            b = b * self.lrmul
        if self.act == "linear":
            if b is not None:
                y = y + b.astype(y.dtype)
            return y
        return bias_act(y, b, act=self.act)


class BiasAct(nn.Module):
    """Bias + activation + gain + clamp layer (reference BiasActLayer,
    networks.py:117-127). Bias applies to the LAST axis (NHWC)."""
    num_channels: int
    use_bias: bool = True
    act: str = "linear"
    lrmul: float = 1.0
    bias_init: float = 0.0
    clamp: Optional[float] = None
    gain: float = 1.0

    @nn.compact
    def __call__(self, x, return_bias: bool = False):
        from morphganformer_tpu.ops.bias_act import activation_funcs

        b = None
        if self.use_bias:
            b = self.param(
                "bias", lambda k, s: jnp.full(s, self.bias_init, jnp.float32),
                (self.num_channels,),
            )
            b = b * self.lrmul
        if return_bias:
            # Fused kernels apply bias+act themselves; expose the runtime
            # bias through the same param path so the tree is unchanged.
            return b if b is not None else jnp.zeros(self.num_channels)
        out_gain = activation_funcs[self.act].def_gain * self.gain
        out_clamp = self.clamp * self.gain if self.clamp is not None else None
        return bias_act(x, b, act=self.act, gain=out_gain, clamp=out_clamp)


class ResnetLayer(nn.Module):
    """fc0(act) -> fc1 -> lrelu(x + skip) (reference ResnetLayer,
    networks.py:154-172; the final lrelu has no sqrt(2) gain)."""
    channels: int
    act: str = "linear"
    lrmul: float = 1.0

    @nn.compact
    def __call__(self, x, skip):
        x = FullyConnected(self.channels, act=self.act, lrmul=self.lrmul, name="fc0")(x)
        x = FullyConnected(self.channels, lrmul=self.lrmul, name="fc1")(x)
        return jax.nn.leaky_relu(x + skip, 0.2)


class Conv2dLayer(nn.Module):
    """Conv + resample + bias/act for the discriminator and skip branches
    (reference Conv2dLayer, networks.py:225-250). NHWC / HWIO."""
    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    act: str = "linear"
    up: int = 1
    down: int = 1
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    gain: float = 1.0
    packed: bool = False    # lane-packed [B, H, G, 128] in/out (TPU pipeline)

    @nn.compact
    def __call__(self, x, resid=None):
        """`resid` (packed paths only): skip-branch tensor shaped like the
        output, added in-kernel after the activation (the D resnet
        block's former explicit `y + x`)."""
        k = self.kernel_size
        w = self.param("weight", weight_init(1.0),
                       (k, k, self.in_channels, self.out_channels))
        coef = runtime_coef(self.in_channels * k * k)
        f = setup_filter(list(self.resample_kernel))
        if self.packed and self.up == 2:
            # Packed-pipeline skip branch: unmodulated 1x1 conv + FIR up2
            # as one lane-packed pallas pass; the (linear, no-bias) BiasAct
            # reduces to the gain factor. Cin > 128 (the b256 block) runs
            # the channel-split variant on the pixel NHWC input.
            from morphganformer_tpu.ops.pallas_conv import (
                fused_packed_upconv2, fused_packed_upconv2_c256)
            assert (self.down, k) == (1, 1) and not self.use_bias \
                and self.act == "linear" and resid is None
            if self.in_channels > 128:
                return fused_packed_upconv2_c256(
                    x, (w * coef).astype(jnp.float32), None, f, None, None,
                    self.gain, 1.0, False, False)
            return fused_packed_upconv2(
                x, (w * coef).astype(jnp.float32), None, f, None, None,
                self.gain, 1.0, False, False)
        if self.packed:
            # Packed D tower (see ops/pallas_conv.py packed-discriminator
            # section): down-conv, same-res conv, and the frgb entry all
            # keep the [N, H, G, 128] lane-packed representation, with
            # bias + lrelu (+ the resnet skip-add) fused in-kernel.
            from morphganformer_tpu.ops.bias_act import activation_funcs
            from morphganformer_tpu.ops.pallas_conv import (
                fused_modconv3x3_lrelu, fused_packed_dconv2)

            act_gain = float(activation_funcs[self.act].def_gain * self.gain)
            alpha = 0.2 if self.act == "lrelu" else 1.0
            assert self.act in ("lrelu", "linear")
            b = (BiasAct(self.out_channels, act=self.act, name="biasAct")(
                None, return_bias=True) if self.use_bias else None)
            if self.down == 2:
                return fused_packed_dconv2(
                    x, (w * coef).astype(jnp.float32), f, b, resid,
                    act_gain, alpha, True)
            if k == 3:
                assert self.in_channels == self.out_channels
                ones = jnp.ones((x.shape[0], self.in_channels), x.dtype)
                return fused_modconv3x3_lrelu(
                    x, (w * coef).astype(jnp.float32), ones, None, b, resid,
                    act_gain, alpha, False, True)
            # frgb entry: pixel [N, R, R, img_ch] -> packed
            # [N, R, G, Q*out]; the 1x1 conv is a tiny per-pixel matmul.
            assert k == 1 and self.up == 1 and self.down == 1
            n, r, _, cin = x.shape
            q = 128 // self.out_channels
            g = r // q
            y = jnp.einsum(
                "nhgqc,cd->nhgqd", x.reshape(n, r, g, q, cin),
                (w[0, 0] * coef).astype(x.dtype))
            y = y.astype(jnp.float32)
            if b is not None:
                y = y + b
            if alpha != 1.0:
                y = jnp.where(y >= 0, y, y * alpha)
            y = (y * act_gain).reshape(n, r, g, q * self.out_channels)
            if resid is not None:
                y = y + resid.astype(jnp.float32)
            return y.astype(x.dtype)
        x = conv2d_resample(
            x, (w * coef).astype(x.dtype), f=f, up=self.up, down=self.down,
            padding=k // 2, flip_weight=(self.up == 1),
        )
        x = BiasAct(self.out_channels, use_bias=self.use_bias, act=self.act,
                    gain=self.gain, name="biasAct")(x)
        if resid is not None:
            x = x + resid.astype(x.dtype)
        return x


# ----------------------------------------------------------------------------
# Positional encodings (reference networks.py:390-491). All static numpy.
# ----------------------------------------------------------------------------


def sinusoidal_encoding(size: int, dim: int, num: int = 2) -> np.ndarray:
    """2D sinusoidal grid embedding [size, size, dim]
    (reference get_sinusoidal_encoding, networks.py:406-440)."""
    if num == 2:
        c = np.linspace(-1.0, 1.0, size)[:, None]                  # [S, 1]
        i = np.arange(dim // 4, dtype=np.float64)                  # [dim/4]
        pe_sin = np.sin(c / np.power(10000.0, 4 * i / dim))        # [S, dim/4]
        pe_cos = np.cos(c / np.power(10000.0, 4 * i / dim))
        sin_x = np.tile(pe_sin[None, :, :], (size, 1, 1))          # varies along axis 1 (x)
        cos_x = np.tile(pe_cos[None, :, :], (size, 1, 1))
        sin_y = np.tile(pe_sin[:, None, :], (1, size, 1))          # varies along axis 0 (y)
        cos_y = np.tile(pe_cos[:, None, :], (1, size, 1))
        emb = np.concatenate([sin_x, cos_x, sin_y, cos_y], axis=-1)
    else:
        theta = np.arange(0, math.pi, math.pi / num)
        dirs = np.stack([np.cos(theta), np.sin(theta)], axis=-1)   # [num, 2]
        c = np.linspace(-1.0, 1.0, size)
        x = np.tile(c[None, :], (size, 1))
        y = np.tile(c[:, None], (1, size))
        xy = np.stack([x, y], axis=-1)                              # [S, S, 2]
        lens = np.sum(xy[:, :, None, :] * dirs, axis=-1, keepdims=True)  # [S,S,num,1]
        i = np.arange(dim // (2 * num), dtype=np.float64)
        sins = np.sin(lens / np.power(10000.0, 2 * num * i / dim))
        coss = np.cos(lens / np.power(10000.0, 2 * num * i / dim))
        emb = np.concatenate([sins, coss], axis=-1).reshape(size, size, dim)
    return emb.astype(np.float32)


def linear_encoding_dirs(size: int, num: int) -> np.ndarray:
    """Direction-projected grid lengths [size, size, num, 1] for the linear
    encoding (reference get_linear_encoding, networks.py:390-402); multiplied
    by a trainable [num, dim/num] embedding inside the model."""
    theta = np.arange(0, math.pi, math.pi / num)
    dirs = np.stack([np.cos(theta), np.sin(theta)], axis=-1)
    c = np.linspace(-1.0, 1.0, size)
    x = np.tile(c[None, :], (size, 1))
    y = np.tile(c[:, None], (1, size))
    xy = np.stack([x, y], axis=-1)
    lens = np.sum(xy[:, :, None, :] * dirs, axis=-1, keepdims=True)
    return lens.astype(np.float32)


class GridPositionalEncoding(nn.Module):
    """Per-resolution 2D positional encoding of the image grid, flattened to
    [res*res, pos_dim] row-major (reference get_positional_encoding,
    networks.py:458-483). 'sinus'/'linear' are fixed; 'trainable'/'trainable2d'
    are parameters."""
    res: int
    pos_dim: int
    pos_type: str = "sinus"
    pos_init: str = "uniform"
    pos_directions_num: int = 2
    shared: bool = False

    @nn.compact
    def __call__(self):
        s, d = self.res, self.pos_dim
        initializer = (nn.initializers.uniform(scale=1.0) if self.pos_init == "uniform"
                       else nn.initializers.normal(stddev=1.0))
        if self.pos_type == "sinus":
            emb = jnp.asarray(sinusoidal_encoding(s, d, self.pos_directions_num))
        elif self.pos_type == "linear":
            lens = jnp.asarray(linear_encoding_dirs(s, self.pos_directions_num))
            embs = self.param("pos0", initializer,
                              (self.pos_directions_num, d // self.pos_directions_num))
            emb = (lens * embs).reshape(s, s, d)
        elif self.pos_type == "trainable2d":
            emb = self.param("pos0", initializer, (s, s, d))
        else:  # trainable
            xemb = self.param("pos0", initializer, (s, d // 2))
            yemb = xemb if self.shared else self.param("pos1", initializer, (s, d // 2))
            emb = jnp.concatenate([
                jnp.tile(xemb[None, :, :], (s, 1, 1)),
                jnp.tile(yemb[:, None, :], (1, s, 1)),
            ], axis=-1)
        return emb.reshape(s * s, d)


def logits_mask(x, mask):
    """-10000 where mask==0 (reference networks.py:379-380)."""
    return x + (1.0 - mask.astype(jnp.float32)) * -10000.0


def random_dp_binary(rng, shape, dropout: float):
    """Random keep-mask with drop probability `dropout`
    (reference networks.py:366-371)."""
    if dropout == 0.0:
        return jnp.ones(shape, dtype=jnp.float32)
    eps = jax.random.uniform(rng, shape)
    return (eps >= dropout).astype(jnp.float32)
