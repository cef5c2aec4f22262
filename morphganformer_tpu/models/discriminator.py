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


def packed_d_structural_ok(cfg, res) -> bool:
    """Shape/architecture requirements for a lane-packed D block, shared
    between the production gate and the parity tests (one predicate so
    the tested path can never drift from production's — ADVICE r2)."""
    if cfg.architecture != "resnet" or cfg.act != "lrelu":
        return False
    in_ch = cfg.channels(res)
    out_ch = cfg.channels(res // 2)
    return (in_ch <= 128 and 128 % in_ch == 0
            and out_ch == 2 * in_ch and out_ch <= 128
            and res * in_ch % 128 == 0
            and (res * in_ch // 128) % 8 == 0)


def packed_d_block_eligible(cfg, res) -> bool:
    """Gate for the lane-packed D tower (mirror of the synthesis-side
    packed_block_eligible): the >=512^2 low-channel blocks whose XLA conv
    layouts are narrow-lane run as [N, H, G, 128] packed pallas kernels
    (frgb entry, same-res conv0, fused down-conv1 with the resnet
    skip-add in-kernel). Default-on on TPU; MGT_PACKED_D=0 disables."""
    import os

    import jax

    from morphganformer_tpu.ops.packed_override import packed_paths_disabled

    if packed_paths_disabled():
        return False   # second-order autodiff context (R1 reg)
    if os.environ.get("MGT_PACKED_D", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    return res >= 512 and packed_d_structural_ok(cfg, res)


class DiscriminatorBlock(nn.Module):
    """Reference DiscriminatorBlock (networks.py:1339-1396)."""
    cfg: DiscriminatorConfig
    res: int

    @nn.compact
    def __call__(self, x, img, packed: bool = False):
        cfg = self.cfg
        arch = cfg.architecture
        stem = self.res == cfg.img_resolution
        in_channels = cfg.channels(self.res)
        out_channels = cfg.channels(self.res // 2)
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

        if packed:
            # Lane-packed [N, H, G, 128] representation; when the NEXT
            # block is unpacked and out_channels == 128 the packed output
            # IS pixel NHWC (P = 1), so no relayout is ever needed.
            assert arch == "resnet"
            g_in = self.res * in_channels // 128
            if x is not None:
                assert x.shape[1:] == (self.res, g_in, 128), x.shape
                x = x.astype(dtype)
            if stem:
                x = Conv2dLayer(cfg.img_channels, in_channels, 1,
                                act=cfg.act, packed=True,
                                name="fromrgb")(img.astype(dtype))
            y = Conv2dLayer(in_channels, out_channels, 1, use_bias=False,
                            down=2, resample_kernel=cfg.resample_kernel,
                            gain=get_gain(arch), packed=packed,
                            name="skip")(x)
            x = Conv2dLayer(in_channels, in_channels, 3, act=cfg.act,
                            packed=packed, name="conv0")(x)
            # conv1 absorbs the resnet add into its fused epilogue.
            x = Conv2dLayer(in_channels, out_channels, 3, down=2,
                            resample_kernel=cfg.resample_kernel, act=cfg.act,
                            gain=get_gain(arch), packed=packed,
                            name="conv1")(x, resid=y)
            return x, None

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
                            gain=get_gain(arch), name="conv1")(x, resid=y)
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
        packed = False
        for res in cfg.block_resolutions:
            use_packed = packed_d_block_eligible(cfg, res)
            # A packed prefix can only start at the stem (the frgb entry
            # produces the packed representation).
            if use_packed and not packed and res != cfg.img_resolution:
                use_packed = False
            if packed and not use_packed:
                # Leave the packed domain: [N, H, G, P*C] -> pixel NHWC
                # is a pure reshape (identity when P == 1).
                c_in = cfg.channels(res)
                n, h, g, lanes = x.shape
                x = x.reshape(n, h, g * (lanes // c_in), c_in)
            x, img = DiscriminatorBlock(cfg, res, name=f"b{res}")(
                x, img, packed=use_packed)
            packed = use_packed
        if packed:
            c_in = cfg.channels(4)
            n, h, g, lanes = x.shape
            x = x.reshape(n, h, g * (lanes // c_in), c_in)
        return DiscriminatorEpilogue(cfg, name="b4")(x, img, c)
