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
