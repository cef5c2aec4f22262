"""Pallas VMEM-resident conv kernel: parity vs XLA conv (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphganformer_tpu.ops.pallas_conv import conv3x3_same


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,co", [
    ((1, 16, 24, 8), 16),
    ((2, 32, 32, 32), 32),
    ((1, 8, 8, 3), 5),
])
def test_pallas_conv_matches_xla(shape, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[-1], co).astype(np.float32)) * 0.2
    got = conv3x3_same(x, w)
    want = _xla_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_pallas_conv_grads_match_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32)) * 0.2

    f_p = lambda a, b: jnp.sum(conv3x3_same(a, b) ** 2)
    f_x = lambda a, b: jnp.sum(_xla_conv(a, b) ** 2)
    gx_p, gw_p = jax.grad(f_p, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(f_x, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Fused modulated-conv epilogue (style/demod/noise/bias/lrelu in-kernel).
# ---------------------------------------------------------------------------

from morphganformer_tpu.ops.pallas_conv import fused_modconv3x3_lrelu


def _modconv_ref(x, w, styles, noise, bias, resid, gain, alpha,
                 demodulate=True):
    """Unfused reference: scale-activations form of modulated conv + tail."""
    xs = x * styles[:, None, None, :]
    y = jax.lax.conv_general_dilated(
        xs, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if demodulate:
        wsq = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(0, 1))
        d = jax.lax.rsqrt(jnp.square(styles.astype(jnp.float32)) @ wsq + 1e-8)
        y = y * d[:, None, None, :].astype(y.dtype)
    if noise is not None:
        y = y + noise[None, :, :, None]
    if bias is not None:
        y = y + bias
    y = jnp.where(y >= 0, y, alpha * y) * gain
    if resid is not None:
        y = y + resid
    return y


@pytest.mark.parametrize(
    "shape,co,use_noise,use_bias,use_resid,gain,alpha,demod", [
        ((2, 8, 8, 8), 8, True, True, False, 1.41, 0.2, True),
        ((1, 16, 16, 4), 4, False, False, False, 1.0, 1.0, True),
        ((1, 8, 16, 16), 8, True, False, False, 2.0, 0.2, False),
        ((2, 8, 8, 8), 8, True, True, True, 1.41, 0.2, True),
        ((1, 16, 16, 4), 4, False, False, True, 1.0, 1.0, True),
    ])
def test_fused_modconv_matches_unfused(shape, co, use_noise, use_bias,
                                       use_resid, gain, alpha, demod):
    rng = np.random.RandomState(0)
    n, h, wd, c = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32)) * 0.3
    s = jnp.asarray(rng.rand(n, c).astype(np.float32)) + 0.5
    noise = (jnp.asarray(rng.randn(h, wd).astype(np.float32)) * 0.1
             if use_noise else None)
    bias = (jnp.asarray(rng.randn(co).astype(np.float32)) * 0.1
            if use_bias else None)
    resid = (jnp.asarray(rng.randn(n, h, wd, co).astype(np.float32))
             if use_resid else None)

    got = fused_modconv3x3_lrelu(x, w, s, noise, bias, resid, gain, alpha,
                                 demod)
    want = _modconv_ref(x, w, s, noise, bias, resid, gain, alpha, demod)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # Projection pattern: only x and styles are differentiated (weight/noise/
    # bias are closure constants -> the dw einsums must be skipped, which
    # this exercises via symbolic_zeros).
    f_p = lambda a, b: jnp.sum(jnp.sin(fused_modconv3x3_lrelu(
        a, w, b, noise, bias, resid, gain, alpha, demod)))
    f_r = lambda a, b: jnp.sum(jnp.sin(_modconv_ref(
        a, w, b, noise, bias, resid, gain, alpha, demod)))
    gp = jax.grad(f_p, argnums=(0, 1))(x, s)
    gr = jax.grad(f_r, argnums=(0, 1))(x, s)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)

    # Training pattern: everything differentiated (incl. the demod chain
    # into dw, the noise/bias reductions, and the identity resid cotangent).
    args = [x, w, s] + ([noise] if use_noise else []) \
        + ([bias] if use_bias else []) + ([resid] if use_resid else [])

    def _call(fn, *a):
        i = 3
        nz = a[i] if use_noise else None
        i += int(use_noise)
        bz = a[i] if use_bias else None
        i += int(use_bias)
        rz = a[i] if use_resid else None
        return jnp.sum(jnp.sin(fn(a[0], a[1], a[2], nz, bz, rz, gain, alpha,
                                  demod)))

    gp = jax.grad(lambda *a: _call(fused_modconv3x3_lrelu, *a),
                  argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(lambda *a: _call(_modconv_ref, *a),
                  argnums=tuple(range(len(args))))(*args)
    for i, (a, b) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"cotangent {i}")
