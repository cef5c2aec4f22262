"""FIR up/down resampling of 2D feature maps, TPU-native.

Behavioral spec: `torch_utils/ops/upfirdn2d.py` in the MorphGANformer reference
(`_upfirdn2d_ref`, reference upfirdn2d.py:161-200): for each channel,

  1. zero-insert upsample by `up` (N-1 zeros AFTER each pixel),
  2. pad (negative = crop) w.r.t. the upsampled image,
  3. correlate with the FIR filter `f` (flipped first unless `flip_filter`),
  4. keep every `down`-th pixel.

Instead of a custom CUDA kernel (reference upfirdn2d.cu), the whole pipeline is
one XLA `lax.conv_general_dilated` call: `lhs_dilation` performs the
zero-insertion, explicit (possibly negative) padding performs pad/crop, and
`window_strides` performs the decimation. The conv is depthwise
(`feature_group_count = C`), layout NHWC (TPU-native). XLA fuses the
surrounding elementwise work; gradients come from JAX autodiff and satisfy the
same adjoint relation the reference hand-codes (up/down swapped, filter
flipped, padding adjusted — reference upfirdn2d.py:238-256).

Unlike the reference (NCHW), all image tensors here are NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _parse_scaling(scaling):
    """Scaling argument -> (sx, sy). Mirrors reference upfirdn2d.py:_parse_scaling."""
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    """Padding argument -> (px0, px1, py0, py1). Mirrors reference _parse_padding."""
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def _get_filter_size(f):
    """Filter -> (fw, fh). None counts as a 1x1 impulse."""
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a 2D FIR filter for `upfirdn2d`.

    Mirrors reference upfirdn2d.py:setup_filter (semantics identical; returns a
    float32 jnp array of shape [fh, fw] (non-separable) or [taps] (separable)).
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float64)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(f, dtype=jnp.float32)


@functools.lru_cache(maxsize=None)
def nearest_neighbors_kernel(factor=2):
    """Nearest-neighbor upsampling kernel (reference networks.py:54-55)."""
    return setup_filter([1] * factor)


def _depthwise_conv(x, f2d, *, up, down, pad, channels):
    """Depthwise correlation with an already-flipped/gained 2D filter.

    x: [N,H,W,C]; f2d: [fh,fw]; pad: ((py0,py1),(px0,px1)) w.r.t. the
    zero-inserted (torch-style, trailing zeros) upsampled image.
    """
    upx, upy = up
    downx, downy = down
    (py0, py1), (px0, px1) = pad
    # lhs_dilation yields size (H-1)*up+1; torch-style zero-insertion yields
    # H*up (trailing up-1 zeros). Fold the difference into high padding.
    pad_h = (py0, py1 + (upy - 1))
    pad_w = (px0, px1 + (upx - 1))
    kernel = jnp.broadcast_to(
        f2d.astype(x.dtype)[:, :, None, None], (*f2d.shape, 1, channels)
    )
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=(pad_h, pad_w),
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
    )


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Pad, upsample, FIR-filter, and downsample a batch of NHWC images.

    Args mirror reference upfirdn2d.py:upfirdn2d (x is NHWC here, not NCHW).
    `f` is a [fh,fw] / [taps] float32 filter from `setup_filter`, or None
    (identity). `padding` is [x0,x1,y0,y1] / [x,y] / int, w.r.t. the upsampled
    image; negative pads crop.
    """
    assert x.ndim == 4, "upfirdn2d expects NHWC input"
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    channels = x.shape[3]

    if f.ndim == 1:
        # Separable: W pass then H pass, sqrt(gain) each (reference
        # upfirdn2d.py:229-231 does the same with the CUDA kernel).
        fx = f * (float(gain) ** 0.5)
        fy = f * (float(gain) ** 0.5)
        if not flip_filter:
            fx, fy = fx[::-1], fy[::-1]
        x = _depthwise_conv(
            x, fx[None, :], up=(upx, 1), down=(downx, 1),
            pad=((0, 0), (px0, px1)), channels=channels,
        )
        x = _depthwise_conv(
            x, fy[:, None], up=(1, upy), down=(1, downy),
            pad=((py0, py1), (0, 0)), channels=channels,
        )
        return x

    f2d = f * float(gain)
    if not flip_filter:
        f2d = f2d[::-1, ::-1]
    return _depthwise_conv(
        x, f2d, up=(upx, upy), down=(downx, downy),
        pad=((py0, py1), (px0, px1)), channels=channels,
    )


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """SAME-padded FIR filtering (reference upfirdn2d.py:filter2d)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """FIR upsampling with magnitude-preserving gain (reference upsample2d)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """FIR downsampling (reference downsample2d)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
