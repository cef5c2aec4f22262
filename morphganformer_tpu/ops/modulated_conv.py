"""Style-modulated convolution (StyleGAN2 mod/demod), TPU-native.

Behavioral spec: `modulated_conv2d` in the MorphGANformer reference
(training/networks.py:253-328). The reference has two execution strategies:

  * fused (networks.py:295-308): per-sample weights + grouped conv with
    groups=batch — efficient on cuDNN, hostile to the TPU MXU (XLA lowers
    batch-grouped convs poorly, and the per-sample [N,O,I,kh,kw] weight tensor
    blows HBM at 1024^2).
  * non-fused (networks.py:309-326): scale the activations by the style before
    the conv and by the demodulation coefficient after it.

Both are algebraically identical for per-sample styles:
    conv(x, w * s * d) == d * conv(x * s, w)
so this implementation always uses the scaling form — one shared-weight conv
that XLA tiles straight onto the MXU, with the style/demod scales fused into
the conv epilogue. The demodulation coefficient itself reduces to a tiny
matmul:  d[b,o] = rsqrt( sum_i s[b,i]^2 * wsq[i,o] + 1e-8 ),
with wsq = sum_{kh,kw} w^2 precomputed from the shared weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from morphganformer_tpu.ops.conv2d_resample import conv2d_resample


def modulated_conv2d(
    x,                      # Input of shape [N, H, W, C_in] (NHWC).
    weight,                 # Weight of shape [kh, kw, C_in, C_out] (HWIO).
    styles,                 # Modulation coefficients [N, C_in].
    noise=None,             # Optional noise added to the output.
    up=1,                   # Integer upsampling factor.
    down=1,                 # Integer downsampling factor.
    padding=0,              # Padding w.r.t. the upsampled image.
    resample_kernel=None,   # FIR filter from setup_filter().
    demodulate=True,        # Apply weight demodulation?
    flip_weight=True,       # False = convolution, True = correlation.
    modulate=True,          # False = plain convolution (reference networks.py:268-272).
):
    if not modulate:
        x = conv2d_resample(x, weight, f=resample_kernel, up=up, down=down,
                            padding=padding, flip_weight=flip_weight)
        if noise is not None:
            x = x + noise.astype(x.dtype)
        return x

    batch = x.shape[0]
    assert styles.shape == (batch, x.shape[3])

    # Modulate activations before the conv (equivalent to scaling the weight).
    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(x, weight, f=resample_kernel, up=up, down=down,
                        padding=padding, flip_weight=flip_weight)

    d = None
    if demodulate:
        # d = rsqrt(sum_{i,kh,kw} (w*s)^2 + 1e-8), per (batch, out_channel).
        # Always computed in float32: the eps and the reduction need the range.
        wsq = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(0, 1))  # [I, O]
        ssq = jnp.square(styles.astype(jnp.float32))                         # [N, I]
        d = jax.lax.rsqrt(ssq @ wsq + 1e-8)                                  # [N, O]

    if demodulate and noise is not None:
        x = x * d.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
    elif demodulate:
        x = x * d.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
