"""StyleGAN2-style discriminator (reference training/networks.py:1339-1510).

Resnet downsampling blocks + minibatch-std layer + epilogue with optional
conditional projection. NHWC, optional bfloat16 compute with float32 output.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from morphganformer_tpu.models.config import DiscriminatorConfig
from morphganformer_tpu.models.layers import Conv2dLayer, FullyConnected, get_gain
from morphganformer_tpu.ops import downsample2d, setup_filter


class DiscriminatorBlock(nn.Module):
    """Reference DiscriminatorBlock (networks.py:1339-1396)."""
    cfg: DiscriminatorConfig
    res: int

    @nn.compact
    def __call__(self, x, img):
        cfg = self.cfg
        arch = cfg.architecture
        stem = self.res == cfg.img_resolution
        in_channels = cfg.channels(self.res)
        out_channels = cfg.channels(self.res // 2)
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

        if x is not None:
            assert x.shape[1:] == (self.res, self.res, in_channels)
            x = x.astype(dtype)

        if stem or arch == "skip":
            y = Conv2dLayer(cfg.img_channels, in_channels, 1, act=cfg.act,
                            name="fromrgb")(img.astype(dtype))
            x = x + y if x is not None else y
            img = (downsample2d(img, setup_filter(list(cfg.resample_kernel)))
                   if arch == "skip" else None)

        if arch == "resnet":
            y = Conv2dLayer(in_channels, out_channels, 1, use_bias=False, down=2,
                            resample_kernel=cfg.resample_kernel,
                            gain=get_gain(arch), name="skip")(x)
            x = Conv2dLayer(in_channels, in_channels, 3, act=cfg.act,
                            name="conv0")(x)
            x = Conv2dLayer(in_channels, out_channels, 3, down=2,
                            resample_kernel=cfg.resample_kernel, act=cfg.act,
                            gain=get_gain(arch), name="conv1")(x)
            x = y + x
        else:
            x = Conv2dLayer(in_channels, in_channels, 3, act=cfg.act,
                            name="conv0")(x)
            x = Conv2dLayer(in_channels, out_channels, 3, down=2,
                            resample_kernel=cfg.resample_kernel, act=cfg.act,
                            gain=get_gain(arch), name="conv1")(x)
        return x, img


def minibatch_std(x, group_size, num_channels):
    """Minibatch standard-deviation features (reference MinibatchStdLayer,
    networks.py:1399-1420). x: NHWC."""
    n, h, w, c = x.shape
    g = min(group_size, n) if group_size is not None else n
    assert n % g == 0, f"batch {n} not divisible by mbstd group {g}"
    f = num_channels
    cc = c // f
    y = x.astype(jnp.float32).reshape(g, n // g, h, w, f, cc)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)            # [n/g, h, w, f, cc]
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))                # [n/g, f]
    y = jnp.tile(y[:, None, None, :], (g, h, w, 1))  # replicate over group+pixels
    return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    """Reference DiscriminatorEpilogue (networks.py:1423-1472)."""
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, x, img, c=None):
        cfg = self.cfg
        in_channels = cfg.channels(4)
        assert x.shape[1:] == (4, 4, in_channels)
        x = x.astype(jnp.float32)

        if cfg.architecture == "skip":
            x = x + Conv2dLayer(cfg.img_channels, in_channels, 1, act=cfg.act,
                                name="fromrgb")(img.astype(jnp.float32))
        if cfg.mbstd_num_channels > 0:
            x = minibatch_std(x, cfg.mbstd_group_size, cfg.mbstd_num_channels)
        x = Conv2dLayer(in_channels + cfg.mbstd_num_channels, in_channels, 3,
                        act=cfg.act, name="conv")(x)
        x = FullyConnected(in_channels, act=cfg.act, name="fc")(
            x.reshape(x.shape[0], -1))
        x = FullyConnected(max(cfg.c_dim, 1), name="out")(x)
        if cfg.c_dim > 0:
            x = jnp.sum(x * c, axis=1, keepdims=True)
        return x


class Discriminator(nn.Module):
    """Reference Discriminator (networks.py:1475-1510)."""
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, img, c=None):
        cfg = self.cfg
        assert img.shape[1:] == (cfg.img_resolution, cfg.img_resolution,
                                 cfg.img_channels)
        x = None
        for res in cfg.block_resolutions:
            x, img = DiscriminatorBlock(cfg, res, name=f"b{res}")(x, img)
        return DiscriminatorEpilogue(cfg, name="b4")(x, img, c)
