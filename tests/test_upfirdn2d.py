"""Kernel parity tests for upfirdn2d against an independent numpy golden spec.

The golden implementation below re-derives the op from its definition
(zero-insert upsample -> pad/crop -> correlate -> decimate); it is the
executable spec the reference encodes as `_upfirdn2d_ref`
(reference upfirdn2d.py:161-200).
"""

import numpy as np
import pytest

from morphganformer_tpu.ops import (
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)


def golden_upfirdn2d(x_nhwc, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Straightforward numpy spec. x: [N,H,W,C], f: [fh,fw] or [taps] or None."""
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    upx, upy = up
    downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    if len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    px0, px1, py0, py1 = padding

    if f is None:
        f = np.ones((1, 1), dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    if f.ndim == 1:
        # Separable filter == outer product with gain handled once overall.
        f = np.outer(f, f)
    f = f * gain
    if not flip_filter:
        f = f[::-1, ::-1]

    x = np.asarray(x_nhwc, dtype=np.float64)
    n, h, w, c = x.shape

    # 1. Zero-insert upsample (trailing zeros per pixel).
    up_arr = np.zeros((n, h * upy, w * upx, c))
    up_arr[:, ::upy, ::upx, :] = x

    # 2. Pad / crop.
    padded = np.zeros((n, h * upy + max(py0, 0) + max(py1, 0),
                       w * upx + max(px0, 0) + max(px1, 0), c))
    padded[:, max(py0, 0):max(py0, 0) + h * upy,
           max(px0, 0):max(px0, 0) + w * upx, :] = up_arr
    padded = padded[:, max(-py0, 0):padded.shape[1] - max(-py1, 0),
                    max(-px0, 0):padded.shape[2] - max(-px1, 0), :]

    # 3. Valid correlation with f.
    fh, fw = f.shape
    oh = padded.shape[1] - fh + 1
    ow = padded.shape[2] - fw + 1
    out = np.zeros((n, oh, ow, c))
    for i in range(fh):
        for j in range(fw):
            out += f[i, j] * padded[:, i:i + oh, j:j + ow, :]

    # 4. Decimate.
    return out[:, ::downy, ::downx, :]


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 0),
    (1, 1, 2),
    (2, 1, [1, 1, 1, 1]),
    (1, 2, [1, 1, 1, 1]),
    (2, 2, [2, 1, 2, 1]),
    (1, 1, [-1, 1, 2, -1]),
    (4, 1, [2, 2, 2, 2]),
    (1, 4, [3, 3, 3, 3]),
])
@pytest.mark.parametrize("flip_filter", [False, True])
def test_upfirdn2d_matches_golden(up, down, padding, flip_filter):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(upfirdn2d(x, f, up=up, down=down, padding=padding,
                               flip_filter=flip_filter, gain=2.0))
    want = golden_upfirdn2d(x, np.asarray(f), up=up, down=down, padding=padding,
                            flip_filter=flip_filter, gain=2.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_asymmetric_filter():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 7, 2).astype(np.float32)
    f = np.asarray(setup_filter(rng.rand(3, 5), normalize=False))
    got = np.asarray(upfirdn2d(x, f, up=2, down=1, padding=[2, 2, 1, 1]))
    want = golden_upfirdn2d(x, f, up=2, down=1, padding=[2, 2, 1, 1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_separable_filter():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    taps = rng.rand(8).astype(np.float32)
    f_sep = setup_filter(taps, separable=True)
    assert f_sep.ndim == 1
    f_2d = setup_filter(taps, separable=False)
    got = np.asarray(upfirdn2d(x, f_sep, up=2, padding=[3, 3, 3, 3], gain=3.0))
    want = golden_upfirdn2d(x, np.asarray(f_2d), up=2, padding=[3, 3, 3, 3], gain=3.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upfirdn2d_identity():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 5, 4).astype(np.float32)
    np.testing.assert_allclose(np.asarray(upfirdn2d(x, None)), x, rtol=1e-6)


def test_upsample_downsample_roundtrip_shapes():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    assert up.shape == (2, 32, 32, 3)
    down = downsample2d(up, f)
    assert down.shape == (2, 16, 16, 3)
    filt = filter2d(x, f)
    assert filt.shape == x.shape


def test_upsample2d_preserves_dc():
    # Magnitude-preserving gain: a constant image stays constant (interior).
    x = np.ones((1, 16, 16, 1), dtype=np.float32)
    f = setup_filter([1, 3, 3, 1])
    y = np.asarray(upsample2d(x, f))
    np.testing.assert_allclose(y[0, 4:-4, 4:-4, 0], 1.0, rtol=1e-5)


def test_nearest_neighbor_upsample_exact():
    from morphganformer_tpu.ops import nearest_neighbors_kernel
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 4, 2).astype(np.float32)
    y = np.asarray(upsample2d(x, nearest_neighbors_kernel(2)))
    want = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)


def test_grad_adjoint_roundtrip():
    """Autodiff gradient must equal the hand-derived adjoint the reference
    implements (upfirdn with up/down swapped + flipped filter),
    checked numerically via the inner-product (adjoint) identity."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])

    def fwd(z):
        return upfirdn2d(z, f, up=2, padding=[1, 1, 1, 1])

    y, vjp = jax.vjp(fwd, x)
    ct = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    (gx,) = vjp(ct)
    # <fwd(x), ct> == <x, vjp(ct)> for the linear op.
    lhs = jnp.vdot(y, ct)
    rhs = jnp.vdot(x, gx)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)
