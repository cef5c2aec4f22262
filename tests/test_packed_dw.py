"""In-kernel weight gradients (dw taps) of the packed pallas convs.

The training path differentiates the conv weights; round-3 moved the
weight cotangent in-kernel (pallas_conv.py use_dw blocks): the adjoint
launches accumulate the packed-space kernel cotangent from the very
windows the dx conv already slices, and the callers fold it back onto
the pixel kernel through the exact transposes of the packing chain
(_unpack_kernel_grad / linear_transpose of _pack_upconv_kernel +
_compose_kernel_fir). These tests pin that fused dw against pure-XLA
autodiff of the unpacked reference composition (the executable spec,
SURVEY.md §4.1) — run in interpret mode on CPU.

Gradient-of-the-gradient correctness for the same ops is covered by
tests/test_second_order_packed.py; model-level dw parity by
tests/test_packed_pipeline.py::test_packed_training_grads_match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphganformer_tpu.ops.modulated_conv import modulated_conv2d
from morphganformer_tpu.ops.pallas_conv import (
    fused_modconv3x3_lrelu,
    fused_packed_dconv2,
    fused_packed_upconv2,
)
from morphganformer_tpu.ops.conv2d_resample import conv2d_resample
from morphganformer_tpu.ops.upfirdn2d import setup_filter


def _rand(seed, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32) * scale


def _lrelu(y, gain, alpha):
    return jnp.where(y >= 0, y, alpha * y) * gain


@pytest.mark.parametrize("packed_io", [False, True])
def test_modconv_dw_matches_unpacked(packed_io):
    n, h, wdt, c, o = 2, 16, 16, 8, 8
    pack = 128 // max(c, o)
    x = _rand(0, (n, h, wdt, c))
    w = _rand(1, (3, 3, c, o), 0.3)
    s = _rand(2, (n, c), 0.5) + 1.0
    noise = _rand(3, (h, wdt), 0.1)
    b = _rand(4, (o,), 0.1)
    gtan = _rand(5, (n, h, wdt, o))

    def ref(ww):
        y = modulated_conv2d(x, ww, styles=s, padding=1, demodulate=True,
                             flip_weight=True)
        y = y + noise[None, :, :, None] + b[None, None, None, :]
        return jnp.sum(_lrelu(y, 1.4, 0.2) * gtan)

    xin = x.reshape(n, h, wdt // pack, pack * c) if packed_io else x
    gt = (gtan.reshape(n, h, wdt // pack, pack * o) if packed_io else gtan)

    def fused(xx, ww, ss):
        y = fused_modconv3x3_lrelu(xx, ww, ss, noise, b, None, 1.4, 0.2,
                                   True, packed_io)
        return jnp.sum(y * gt)

    # All-inputs grad: the adjoint launch runs and dw comes from the
    # in-kernel taps (the production training structure).
    _, dw_kernel, _ = jax.grad(fused, argnums=(0, 1, 2))(xin, w, s)
    dw_ref = jax.grad(ref)(w)
    np.testing.assert_allclose(np.asarray(dw_kernel), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)

    # w-only grad: the adjoint launch is skipped and dw falls back to the
    # XLA tap-einsums — must agree with both.
    dw_fallback = jax.grad(lambda ww: fused(xin, ww, s))(w)
    np.testing.assert_allclose(np.asarray(dw_fallback), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("per_sample_noise", [False, True])
def test_upconv_dw_matches_unpacked(per_sample_noise):
    n, h_in, cin, cout = 2, 8, 16, 8
    P = 128 // cin
    wdt = 16
    G = wdt // P
    Q = 2 * P
    x = _rand(0, (n, h_in, G, P * cin))
    w = _rand(1, (3, 3, cin, cout), 0.3)
    s = _rand(2, (n, cin), 0.5) + 1.0
    f = setup_filter([1, 3, 3, 1])
    nshape = ((n, 2 * h_in, 2 * wdt) if per_sample_noise
              else (2 * h_in, 2 * wdt))
    noise = _rand(3, nshape, 0.1)
    b = _rand(4, (cout,), 0.1)
    gtan = _rand(5, (n, 2 * h_in, G, Q * cout))

    x_px = x.reshape(n, h_in, G, P, cin).reshape(n, h_in, wdt, cin)
    gt_px = gtan.reshape(n, 2 * h_in, G, Q, cout).reshape(
        n, 2 * h_in, 2 * wdt, cout)

    def ref(ww):
        y = modulated_conv2d(x_px, ww, styles=s, up=2, padding=1,
                             resample_kernel=f, demodulate=True,
                             flip_weight=False)
        nz = noise[..., None] if per_sample_noise else noise[None, ..., None]
        y = y + nz + b[None, None, None, :]
        return jnp.sum(_lrelu(y, 1.4, 0.2) * gt_px)

    def fused(xx, ww, ss):
        y = fused_packed_upconv2(xx, ww, ss, f, noise, b, 1.4, 0.2,
                                 True, False)
        return jnp.sum(y * gtan)

    _, dw_kernel, _ = jax.grad(fused, argnums=(0, 1, 2))(x, w, s)
    dw_ref = jax.grad(ref)(w)
    np.testing.assert_allclose(np.asarray(dw_kernel), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)

    # w-only grad: XLA vjp-of-composition fallback.
    dw_fallback = jax.grad(lambda ww: fused(x, ww, s))(w)
    np.testing.assert_allclose(np.asarray(dw_fallback), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # interpret-mode shape variant: 1x1-skip variant of the upconv adjoint covered above
def test_upconv_dw_unmodulated_1x1_skip():
    """The resnet-skip 1x1-up (styles=None, no demod, L=4: half the
    packed blocks structurally zero — exercises the dw_mask skip)."""
    n, h_in, cin, cout = 2, 8, 16, 8
    P = 128 // cin
    wdt = 16
    G = wdt // P
    Q = 2 * P
    x = _rand(0, (n, h_in, G, P * cin))
    w = _rand(1, (1, 1, cin, cout), 0.3)
    f = setup_filter([1, 3, 3, 1])
    gtan = _rand(5, (n, 2 * h_in, G, Q * cout))

    x_px = x.reshape(n, h_in, G, P, cin).reshape(n, h_in, wdt, cin)
    gt_px = gtan.reshape(n, 2 * h_in, G, Q, cout).reshape(
        n, 2 * h_in, 2 * wdt, cout)

    def ref(ww):
        y = conv2d_resample(x_px, ww, f=f, up=2, padding=0,
                            flip_weight=False)
        return jnp.sum(y * gt_px)

    def fused(xx, ww):
        y = fused_packed_upconv2(xx, ww, None, f, None, None, 1.0, 1.0,
                                 False, False)
        return jnp.sum(y * gtan)

    _, dw_kernel = jax.grad(fused, argnums=(0, 1))(x, w)
    dw_ref = jax.grad(ref)(w)
    np.testing.assert_allclose(np.asarray(dw_kernel), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # interpret-mode shape variant: b256 wide-lane variant of the adjoint covered by the default shapes
def test_upconv_dw_wide_lane_c256_shape():
    """The b256 wide-lane geometry (P=1, Q=2, 256 lanes) at miniature
    spatial size: cin = 2*128 lanes in one group."""
    n, h_in, cin, cout = 1, 8, 256, 128
    P, Q = 1, 2
    G = 8                       # width = G*P = 8 pixels
    x = _rand(0, (n, h_in, G, P * cin))
    w = _rand(1, (3, 3, cin, cout), 0.1)
    s = _rand(2, (n, cin), 0.3) + 1.0
    f = setup_filter([1, 3, 3, 1])
    b = _rand(4, (cout,), 0.1)
    gtan = _rand(5, (n, 2 * h_in, G, Q * cout))

    x_px = x                    # P = 1: packed form IS pixel NHWC
    gt_px = gtan.reshape(n, 2 * h_in, G, Q, cout).reshape(
        n, 2 * h_in, 2 * G, cout)

    def ref(ww):
        y = modulated_conv2d(x_px, ww, styles=s, up=2, padding=1,
                             resample_kernel=f, demodulate=True,
                             flip_weight=False)
        y = y + b[None, None, None, :]
        return jnp.sum(_lrelu(y, 1.4, 0.2) * gt_px)

    def fused(xx, ww, ss):
        y = fused_packed_upconv2(xx, ww, ss, f, None, b, 1.4, 0.2,
                                 True, False)
        return jnp.sum(y * gtan)

    _, dw_kernel, _ = jax.grad(fused, argnums=(0, 1, 2))(x, w, s)
    dw_ref = jax.grad(ref)(w)
    np.testing.assert_allclose(np.asarray(dw_kernel), np.asarray(dw_ref),
                               rtol=3e-4, atol=3e-4)


def test_dconv_dw_matches_unpacked():
    """The D-tower down-conv's dw rides the adjoint up-conv launch
    (in-kernel taps, folded back through linear_transpose of the packing
    chain) — pin it against the reference composition, and the w-only
    XLA-vjp fallback against both."""
    n, h, cin, cout = 2, 16, 8, 16
    Q = 128 // cin
    P = Q // 2
    G = 2
    wdt = G * Q
    x = _rand(0, (n, h, G, Q * cin))
    w = _rand(1, (3, 3, cin, cout), 0.3)
    f = setup_filter([1, 3, 3, 1])
    b = _rand(4, (cout,), 0.1)
    gtan = _rand(5, (n, h // 2, G, P * cout))

    x_px = x.reshape(n, h, G, Q, cin).reshape(n, h, wdt, cin)
    gt_px = gtan.reshape(n, h // 2, G, P, cout).reshape(
        n, h // 2, wdt // 2, cout)

    def ref(ww):
        y = conv2d_resample(x_px, ww, f=f, down=2, padding=1,
                            flip_weight=True)
        y = y + b[None, None, None, :]
        return jnp.sum(_lrelu(y, 1.4, 0.2) * gt_px)

    def fused(xx, ww):
        y = fused_packed_dconv2(xx, ww, f, b, None, 1.4, 0.2, True)
        return jnp.sum(y * gtan)

    _, dw_fused = jax.grad(fused, argnums=(0, 1))(x, w)
    dw_ref = jax.grad(ref)(w)
    np.testing.assert_allclose(np.asarray(dw_fused), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)

    # w-only grad: the adjoint launch is skipped and dw falls back to the
    # XLA vjp of the composition.
    dw_fallback = jax.grad(lambda ww: fused(x, ww))(w)
    np.testing.assert_allclose(np.asarray(dw_fallback), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # interpret-mode shape variant: resid/FIR-none variant of the dconv adjoint covered above
def test_dconv_dw_with_resid_and_fir_none():
    """dconv dw through the resnet-skip epilogue (resid added in-kernel)
    and with f=None (no FIR composition in the fold-back chain)."""
    n, h, cin, cout = 2, 8, 8, 16
    Q = 128 // cin
    P = Q // 2
    G = 2
    wdt = G * Q
    x = _rand(0, (n, h, G, Q * cin))
    w = _rand(1, (3, 3, cin, cout), 0.3)
    resid = _rand(2, (n, h // 2, G, P * cout), 0.5)
    gtan = _rand(5, (n, h // 2, G, P * cout))

    x_px = x.reshape(n, h, G, Q, cin).reshape(n, h, wdt, cin)
    gt_px = gtan.reshape(n, h // 2, G, P, cout).reshape(
        n, h // 2, wdt // 2, cout)
    resid_px = resid.reshape(n, h // 2, G, P, cout).reshape(
        n, h // 2, wdt // 2, cout)

    def ref(ww):
        y = conv2d_resample(x_px, ww, f=None, down=2, padding=1,
                            flip_weight=True)
        y = _lrelu(y, 1.4, 0.2) + resid_px
        return jnp.sum(y * gt_px)

    def fused(xx, ww):
        y = fused_packed_dconv2(xx, ww, None, None, resid, 1.4, 0.2, True)
        return jnp.sum(y * gtan)

    _, dw_fused = jax.grad(fused, argnums=(0, 1))(x, w)
    dw_ref = jax.grad(ref)(w)
    np.testing.assert_allclose(np.asarray(dw_fused), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)
