"""2D convolution with fused FIR up/downsampling, TPU-native.

Behavioral spec: `torch_utils/ops/conv2d_resample.py` in the MorphGANformer
reference (conv2d_resample.py:51-146): pad once w.r.t. the upsampled image,
then zero-insert-upsample -> FIR -> convolve -> decimate, with fast paths that
reorder the stages when mathematically equivalent.

TPU-first redesign (not a translation):
  * NHWC activations, HWIO weights — the layouts XLA tiles onto the MXU.
  * The upsampling fast path is a single base-dilated `lax.conv_general_dilated`
    (`lhs_dilation=up`) followed by the residual FIR pass, replacing the
    reference's conv_transpose2d + weight-transpose gymnastics
    (conv2d_resample.py:117-135). Derivation: valid correlations compose in
    either order, and padding p moves across a correlation with kernel size k
    as p -> p-(k-1) around a full correlation; so
        conv(upfirdn(x, f, up, p, up^2))
      = upfirdn(conv_full(dilate_up(x), w), f, pad=p-(k-1), gain=up^2).
  * 1x1 kernels reorder conv/resample exactly as the reference fast paths do
    (downsample-first / upsample-last) to keep convs at the cheap resolution.

Gradients (including the reference's conv2d_gradfix arbitrary-order behavior,
conv2d_gradfix.py:17-35) come from JAX autodiff for free.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Toggle for the FIR-composed single-conv resampling paths (benchmarking
# escape hatch; both paths are golden-tested).
_FUSE_FIR = os.environ.get("MGT_FUSE_FIR", "1") != "0"

from morphganformer_tpu.ops.upfirdn2d import (
    _get_filter_size,
    _parse_padding,
    upfirdn2d,
)

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _compose_kernel_fir(w, f, flip_weight, flip_filter, gain=1.0):
    """Compose conv kernel w with FIR filter f into one kernel.

    Both stages are correlations; corr(corr(z, w'), f') == corr(z, K) with
    K[t] = sum_j f'[j] * w'[t - j] (the full convolution of the two kernels),
    size (kh+fh-1, kw+fw-1). Folding the FIR into the conv removes the
    full-resolution depthwise pass entirely — the whole resample runs on the
    MXU as one conv."""
    if not flip_weight:
        w = w[::-1, ::-1]
    if f.ndim == 1:
        f = jnp.outer(f, f)
    f = f * gain
    if not flip_filter:
        f = f[::-1, ::-1]
    kh, kw, ci, co = w.shape
    fh, fw = f.shape
    # Full convolution of w with f per (ci, co) pair via a depthwise-style
    # conv: treat w's spatial dims as the image, f as the kernel.
    w2 = w.reshape(kh, kw, ci * co).transpose(2, 0, 1)[..., None]  # [CC,kh,kw,1]
    fk = f[::-1, ::-1].astype(w.dtype)[:, :, None, None]           # flip->true conv
    out = jax.lax.conv_general_dilated(
        w2, fk, window_strides=(1, 1),
        padding=((fh - 1, fh - 1), (fw - 1, fw - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k = out[..., 0].transpose(1, 2, 0).reshape(kh + fh - 1, kw + fw - 1, ci, co)
    return k


def _conv(x, w, *, stride=1, padding=((0, 0), (0, 0)), groups=1, lhs_dilation=(1, 1),
          flip_weight=True):
    """Grouped 2D correlation. `flip_weight=False` = true convolution
    (spatially flipped kernel), matching reference _conv2d_wrapper:21-46."""
    if not flip_weight:
        w = w[::-1, ::-1]
    if isinstance(stride, int):
        stride = (stride, stride)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=(1, 1),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )


def _conv_up2_polyphase(x, k, py0, py1, px0, px1, groups):
    """2x-upsampling conv via polyphase decomposition.

    The base-dilated conv with composed kernel K (size L=6 per axis from
    k=3 + 4-tap FIR) splits into 4 phase convs of 3x3 taps at the INPUT
    resolution: output pixel (2n+r_y, 2m+r_x) uses only taps of parity
    (p0+r) mod 2 per axis. Stacking the 4 phase kernels along the output-
    channel axis yields ONE dense [3,3,I,4O] conv + depth-to-space — the
    mathematically exact FLOPs with full MXU lane utilization (the dilated
    form wastes 3/4 of its taps on zeros, and a 4x wider output channel
    dim keeps low-channel synthesis layers on full 128-lane tiles).

    Only valid when the phase offsets agree across phases, which holds for
    the synthesis hot path (k=3, fw=4, padding=1 -> p0=3, p1=2); the caller
    checks. x: [B,H,W,I]; k: [6,6,I,O]; returns [B,2H,2W,O]."""
    lh, lw, ci, co = k.shape
    b, h, wdt, _ = x.shape

    def taps(r, p0):
        t0 = (p0 + r) % 2
        return [t0, t0 + 2, t0 + 4]

    # Phase kernels: K_r[j] = K[t0r + 2j]; shared input offset o = -1 for
    # the standard (p0=3) pattern -> symmetric (1,1) padding.
    phases = []
    for ry in (0, 1):
        for rx in (0, 1):
            kr = k[jnp.asarray(taps(ry, py0))][:, jnp.asarray(taps(rx, px0))]
            phases.append(kr)                       # [3,3,I,O]
    k4 = jnp.concatenate(phases, axis=-1)           # [3,3,I,4O]

    y = jax.lax.conv_general_dilated(
        x, k4.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS,
        feature_group_count=groups)
    # Depth-to-space with (r_y, r_x) phase ordering.
    y = y.reshape(b, h, wdt, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * wdt, co)


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False):
    """2D convolution with optional FIR up/downsampling.

    Args:
        x: input activations, NHWC [N, H, W, C_in].
        w: weights, HWIO [kh, kw, C_in // groups, C_out].
        f: FIR filter from `setup_filter`, or None (identity).
        up / down: integer resampling factors.
        padding: int / [x,y] / [x0,x1,y0,y1], w.r.t. the upsampled image.
        groups: feature group count.
        flip_weight: False = convolution, True = correlation.
        flip_filter: False = convolution, True = correlation (for f).

    Returns NHWC output. Semantics match reference conv2d_resample.py:51-146
    with NCHW<->NHWC / OIHW<->HWIO layout translation.
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding for up/downsampling (reference conv2d_resample.py:90-100).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # Fast path: 1x1 + downsampling only => downsample first, then convolve.
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv(x, w, groups=groups, flip_weight=flip_weight)

    # Fast path: 1x1 + upsampling only => convolve first, then upsample.
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                         flip_filter=flip_filter)

    # Fast path: downsampling only => ONE strided conv with the FIR composed
    # into the kernel (stride subsamples the composed correlation).
    if down > 1 and up == 1:
        if not _FUSE_FIR:
            x = upfirdn2d(x, f, padding=[px0, px1, py0, py1],
                          flip_filter=flip_filter)
            return _conv(x, w, stride=down, groups=groups,
                         flip_weight=flip_weight)
        if f is not None:
            k = _compose_kernel_fir(w, f, flip_weight, flip_filter)
        else:
            k = w if flip_weight else w[::-1, ::-1]
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=(down, down),
            padding=((py0, py1), (px0, px1)),
            dimension_numbers=_DIMNUMS, feature_group_count=groups,
        )

    # Fast path: upsampling => ONE base-dilated conv with the FIR composed
    # into the kernel (see _compose_kernel_fir). The trailing up-1 zeros of
    # torch-style zero insertion fold into high padding.
    if up > 1:
        if not _FUSE_FIR:
            x = _conv(
                x, w, groups=groups, flip_weight=flip_weight,
                lhs_dilation=(up, up),
                padding=((kh - 1, kh - 1 + up - 1), (kw - 1, kw - 1 + up - 1)))
            x = upfirdn2d(
                x, f, padding=[px0 - (kw - 1), px1 - (kw - 1),
                               py0 - (kh - 1), py1 - (kh - 1)],
                gain=up ** 2, flip_filter=flip_filter)
            if down > 1:
                x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
            return x
        if f is not None:
            k = _compose_kernel_fir(w, f, flip_weight, flip_filter,
                                    gain=float(up ** 2))
        else:
            k = (w if flip_weight else w[::-1, ::-1]) * float(up ** 2)
        # Synthesis hot path (k=3 + 4-tap FIR, SAME padding): exact polyphase
        # decomposition — one dense conv at input resolution.
        if (up == 2 and down == 1 and groups == 1 and k.shape[0] == 6
                and k.shape[1] == 6 and (py0, py1, px0, px1) == (3, 2, 3, 2)):
            return _conv_up2_polyphase(x, k, py0, py1, px0, px1, groups)
        x = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=(1, 1),
            padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
            lhs_dilation=(up, up), rhs_dilation=(1, 1),
            dimension_numbers=_DIMNUMS, feature_group_count=groups,
        )
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Fast path: plain conv with symmetric non-negative padding.
    if up == 1 and down == 1 and px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
        if px0 == 1 and py0 == 1:
            # Opt-in lane-packed pallas kernel (2.15x vs XLA in isolation,
            # but it breaks XLA's fusion of the surrounding style/noise/act
            # elementwise chain — net slower in the full model until the
            # fused modconv kernel lands; see pallas_conv.py docstring).
            import os
            if os.environ.get("MGT_PALLAS_CONV") == "1":
                from morphganformer_tpu.ops.pallas_conv import (
                    conv3x3_same_packed, pallas_conv_eligible)
                if pallas_conv_eligible(x.shape, w.shape, groups):
                    k = w if flip_weight else w[::-1, ::-1]
                    return conv3x3_same_packed(x, k.astype(x.dtype))
        return _conv(x, w, padding=((py0, py0), (px0, px0)), groups=groups,
                     flip_weight=flip_weight)

    # Generic fallback (reference conv2d_resample.py:141-146).
    x = upfirdn2d(x, f if up > 1 else None, up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter)
    x = _conv(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
