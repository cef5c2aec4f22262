"""Parity tests for conv2d_resample and modulated_conv2d.

Golden spec: generic composition  upfirdn(up) -> correlate(w) -> upfirdn(down)
with the padding adjustment of reference conv2d_resample.py:90-100, written
independently in numpy, cross-checked against torch.nn.functional.conv2d.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from morphganformer_tpu.ops import conv2d_resample, modulated_conv2d, setup_filter
from tests.test_upfirdn2d import golden_upfirdn2d


def golden_conv2d_resample(x_nhwc, w_hwio, f, up=1, down=1, padding=0,
                           flip_weight=True, flip_filter=False):
    """Numpy/torch spec of the generic path (valid for every fast path)."""
    fh, fw = (f.shape if f is not None else (1, 1))
    kh, kw, _, _ = w_hwio.shape
    if isinstance(padding, int):
        padding = [padding] * 4
    px0, px1, py0, py1 = padding
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

    x = golden_upfirdn2d(x_nhwc, f if up > 1 else None, up=up,
                         padding=[px0, px1, py0, py1], gain=up ** 2,
                         flip_filter=flip_filter)
    # Correlation (torch conv2d) with optional spatial flip.
    w_oihw = np.transpose(w_hwio, (3, 2, 0, 1)).copy()
    if not flip_weight:
        w_oihw = w_oihw[:, :, ::-1, ::-1].copy()
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()).double()
    wt = torch.from_numpy(w_oihw).double()
    y = F.conv2d(xt, wt).numpy()
    y = np.transpose(y, (0, 2, 3, 1))
    if down > 1:
        y = golden_upfirdn2d(y, f, down=down, flip_filter=flip_filter)
    return y


@pytest.mark.parametrize("up,down,k,padding,flip_weight", [
    (1, 1, 3, 1, True),
    (1, 1, 3, 1, False),
    (1, 1, 1, 0, True),
    (2, 1, 3, 1, False),   # synthesis conv0 hot path (up=2, flipped weight)
    (2, 1, 1, 0, True),    # resnet skip (1x1, up=2)
    (1, 2, 3, 1, True),    # discriminator downsample conv
    (1, 2, 1, 0, True),    # discriminator skip (1x1, down=2)
    (2, 2, 3, 1, True),
    (2, 1, 4, [1, 2, 1, 2], True),
])
def test_conv2d_resample_matches_golden(up, down, k, padding, flip_weight):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    w = (rng.randn(k, k, 5, 6) * 0.3).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(conv2d_resample(x, w, f=f, up=up, down=down, padding=padding,
                                     flip_weight=flip_weight))
    want = golden_conv2d_resample(x, w, np.asarray(f), up=up, down=down,
                                  padding=padding, flip_weight=flip_weight)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv2d_resample_output_resolutions():
    """SAME-padded synthesis usage: up=2 doubles, down=2 halves."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 8).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    assert conv2d_resample(x, w, f=f, up=2, padding=1, flip_weight=False).shape == (1, 32, 32, 8)
    assert conv2d_resample(x, w, f=f, down=2, padding=1).shape == (1, 8, 8, 8)
    assert conv2d_resample(x, w, padding=1).shape == (1, 16, 16, 8)


def test_modulated_conv2d_demod_unit_variance():
    """Demodulation normalizes per-sample output std to ~1 for unit inputs."""
    rng = np.random.RandomState(2)
    x = rng.randn(4, 16, 16, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32) / np.sqrt(9 * 8)
    s = np.exp(rng.randn(4, 8)).astype(np.float32)
    y = np.asarray(modulated_conv2d(x, w, s, padding=1))
    assert y.shape == (4, 16, 16, 16)
    assert abs(np.std(y) - 1.0) < 0.15


def test_modulated_conv2d_matches_explicit_per_sample_weights():
    """Scaling form == fused per-sample-weight form (the algebra identity
    that replaces the reference's grouped conv, networks.py:287-308)."""
    rng = np.random.RandomState(3)
    n, h, ci, co, k = 3, 8, 4, 5, 3
    x = rng.randn(n, h, h, ci).astype(np.float32)
    w = rng.randn(k, k, ci, co).astype(np.float32)
    s = np.exp(0.3 * rng.randn(n, ci)).astype(np.float32)
    noise = rng.randn(n, h, h, 1).astype(np.float32)

    got = np.asarray(modulated_conv2d(x, w, s, noise=noise, padding=1))

    # Explicit fused computation in torch (per-sample weights, batch loop).
    want = np.zeros((n, h, h, co), dtype=np.float64)
    for b in range(n):
        wb = w.astype(np.float64) * s[b][None, None, :, None]          # [kh,kw,I,O]
        d = 1.0 / np.sqrt((wb ** 2).sum(axis=(0, 1, 2)) + 1e-8)        # [O]
        wb = wb * d[None, None, None, :]
        xt = torch.from_numpy(np.transpose(x[b:b + 1], (0, 3, 1, 2)).copy()).double()
        wt = torch.from_numpy(np.transpose(wb, (3, 2, 0, 1)).copy()).double()
        yb = F.conv2d(xt, wt, padding=1).numpy()
        want[b] = np.transpose(yb[0], (1, 2, 0)) + noise[b]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_modulated_conv2d_no_modulate_is_plain_conv():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    w = rng.randn(1, 1, 4, 3).astype(np.float32)
    s = rng.randn(2, 4).astype(np.float32)
    got = np.asarray(modulated_conv2d(x, w, s, modulate=False))
    want = np.asarray(conv2d_resample(x, w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_polyphase_up2_matches_dilated_path():
    """The polyphase decomposition must equal the generic dilated conv
    exactly (same math, different schedule) — both fwd and grads."""
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.ops.conv2d_resample import (
        _compose_kernel_fir, _conv_up2_polyphase)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])

    for flip_weight in (True, False):
        k = _compose_kernel_fir(w, f, flip_weight, False, gain=4.0)
        poly = _conv_up2_polyphase(x, k, 3, 2, 3, 2, 1)
        import jax.lax as lax
        dil = lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((3, 3), (3, 3)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(poly), np.asarray(dil),
                                   rtol=1e-4, atol=1e-4)

    # Full conv2d_resample grads through the polyphase path stay finite.
    loss = lambda xx, ww: jnp.sum(conv2d_resample(
        xx, ww, f=f, up=2, padding=1, flip_weight=False) ** 2)
    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.all(np.isfinite(np.asarray(gx)))
    assert float(jnp.abs(gw).sum()) > 0


def test_conv2d_resample_gradients_flow():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])

    loss = lambda xx, ww: jnp.sum(conv2d_resample(xx, ww, f=f, up=2, padding=1,
                                                  flip_weight=False) ** 2)
    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.all(np.isfinite(np.asarray(gx)))
    assert np.all(np.isfinite(np.asarray(gw)))
    assert float(jnp.abs(gx).sum()) > 0 and float(jnp.abs(gw).sum()) > 0
