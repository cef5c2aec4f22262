"""Parity tests for bias_act against the activation table spec
(reference bias_act.py:15-25, _bias_act_ref:86-115)."""

import numpy as np
import pytest

from morphganformer_tpu.ops import activation_funcs, bias_act


def _np_act(name, x, alpha):
    if name == "linear":
        return x
    if name == "relu":
        return np.maximum(x, 0)
    if name == "lrelu":
        return np.where(x >= 0, x, x * alpha)
    if name == "tanh":
        return np.tanh(x)
    if name == "sigmoid":
        return 1 / (1 + np.exp(-x))
    if name == "elu":
        return np.where(x >= 0, x, np.expm1(x))
    if name == "selu":
        lam, a = 1.0507009873554805, 1.6732632423543772
        return lam * np.where(x >= 0, x, a * np.expm1(x))
    if name == "softplus":
        return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)
    if name == "swish":
        return x / (1 + np.exp(-x))
    raise KeyError(name)


@pytest.mark.parametrize("act", sorted(activation_funcs))
def test_all_activations_match_numpy(act):
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7).astype(np.float32) * 3
    b = rng.randn(7).astype(np.float32)
    spec = activation_funcs[act]
    got = np.asarray(bias_act(x, b, dim=-1, act=act))
    want = _np_act(act, x + b[None, :], spec.def_alpha) * spec.def_gain
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-4)


def test_default_gains():
    assert activation_funcs["lrelu"].def_gain == pytest.approx(np.sqrt(2))
    assert activation_funcs["linear"].def_gain == 1.0
    assert activation_funcs["swish"].def_gain == pytest.approx(np.sqrt(2))


def test_bias_dim_and_clamp():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 4, 5).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    got = np.asarray(bias_act(x, b, dim=1, act="linear", gain=2.0, clamp=1.0))
    want = np.clip((x + b[None, :, None, None]) * 2.0, -1.0, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lrelu_custom_alpha_and_gain():
    x = np.array([-2.0, 2.0], dtype=np.float32)
    got = np.asarray(bias_act(x, act="lrelu", alpha=0.5, gain=3.0))
    np.testing.assert_allclose(got, [-3.0, 6.0], rtol=1e-6)


def test_second_order_gradients_exist():
    """The reference CUDA op supports 2nd-order grads (bias_act.cu:44-58);
    JAX autodiff must provide the same for the regularizer paths."""
    import jax
    import jax.numpy as jnp

    f = lambda z: jnp.sum(bias_act(z, act="swish") ** 2)
    g = jax.grad(lambda z: jnp.sum(jax.grad(f)(z)))(jnp.ones((3,)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
