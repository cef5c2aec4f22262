"""Fused bias + activation + gain + clamp.

Behavioral spec: `torch_utils/ops/bias_act.py` in the MorphGANformer reference
(`_bias_act_ref`, bias_act.py:86-115, and the activation table bias_act.py:15-25).

On TPU this is a plain elementwise composition: XLA fuses it into the
surrounding matmul/conv epilogue, so no custom kernel (the reference's
bias_act.cu exists only because eager PyTorch cannot fuse). First- and
second-order gradients come from JAX autodiff.

Layout note: the framework is NHWC / channels-last everywhere, so the default
bias dimension is -1 (the reference's NCHW default is dim=1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class _ActSpec:
    func: callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    # Table mirrors reference bias_act.py:15-25 (names, def_alpha, def_gain).
    "linear": _ActSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, alpha: jax.nn.relu(x), 0.0, float(np.sqrt(2))),
    "lrelu": _ActSpec(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, float(np.sqrt(2))),
    "tanh": _ActSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, float(np.sqrt(2))),
}


def bias_act(x, b=None, dim=-1, act="linear", alpha=None, gain=None, clamp=None):
    """y = clamp(gain * act(x + b), [-clamp, clamp]).

    Args:
        x: input tensor of any shape.
        b: 1D bias matching x.shape[dim], or None.
        dim: dimension of x the bias maps onto (default -1, channels-last).
        act: activation name from `activation_funcs`.
        alpha: activation shape parameter (None = table default).
        gain: output scale (None = table default, e.g. sqrt(2) for lrelu).
        clamp: clamp output to [-clamp, clamp] (None = off).
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1
        dim = dim % x.ndim
        assert b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
