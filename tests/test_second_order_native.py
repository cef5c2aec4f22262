"""Numerical validation of the hand-derived second-order modconv formulas
(ops/second_order_native.py) against autodiff — the executable groundwork
for the round-5 in-kernel second-order route (see ROADMAP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphganformer_tpu.ops import second_order_native as sn

GAIN, ALPHA = float(np.sqrt(2.0)), 0.2


def _pieces(demod, with_noise=True, with_bias=True, seed=0):
    rng = np.random.RandomState(seed)
    n, h, ci, co = 2, 8, 4, 5
    x = jnp.asarray(rng.randn(n, h, h, ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.4, jnp.float32)
    s = jnp.asarray(rng.rand(n, ci) + 0.5, jnp.float32)
    noise = jnp.asarray(rng.randn(n, h, h), jnp.float32) if with_noise \
        else None
    bias = jnp.asarray(rng.randn(co) * 0.1, jnp.float32) if with_bias \
        else None
    g = jnp.asarray(rng.randn(n, h, h, co), jnp.float32)
    return x, w, s, noise, bias, g


def _auto_bwd(x, w, s, noise, bias, g, demod):
    args = [a for a in (x, w, s, noise, bias) if a is not None]

    def fwd(*a):
        it = iter(a)
        xx, ww, ss = next(it), next(it), next(it)
        nn = next(it) if noise is not None else None
        bb = next(it) if bias is not None else None
        return sn.modconv_fwd_explicit(xx, ww, ss, nn, bb, GAIN, ALPHA,
                                       demod)

    return jax.vjp(fwd, *args)[1](g)


@pytest.mark.parametrize("demod", [False, True])
@pytest.mark.parametrize("with_extras", [False, True])
def test_first_order_bwd_matches_autodiff(demod, with_extras):
    x, w, s, noise, bias, g = _pieces(demod, with_extras, with_extras)
    dx, dw, ds, dn, db = sn.modconv_bwd_explicit(
        x, w, s, noise, bias, g, GAIN, ALPHA, demod)
    auto = _auto_bwd(x, w, s, noise, bias, g, demod)
    hand = [dx, dw, ds] + ([dn, db] if with_extras else [])
    assert len(auto) == len(hand)
    for a, b in zip(auto, hand):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("demod", [False, True])
@pytest.mark.parametrize("with_extras", [False, True])
def test_second_order_vjp_matches_autodiff(demod, with_extras):
    """VJP-of-the-backward: hand formulas (mask locally constant) vs
    jax.vjp of jax.vjp — autodiff's lrelu second derivative is also zero
    a.e., so the match is exact up to float association."""
    x, w, s, noise, bias, g = _pieces(demod, with_extras, with_extras)
    rng = np.random.RandomState(99)
    cdx = jnp.asarray(rng.randn(*x.shape), jnp.float32)
    cdw = jnp.asarray(rng.randn(*w.shape), jnp.float32)
    cds = jnp.asarray(rng.randn(*s.shape), jnp.float32)
    cdn = jnp.asarray(rng.randn(*noise.shape), jnp.float32) if with_extras \
        else None
    cdb = jnp.asarray(rng.randn(*bias.shape), jnp.float32) if with_extras \
        else None

    args = [a for a in (x, w, s, noise, bias) if a is not None] + [g]

    def first_order(*a):
        it = iter(a)
        xx, ww, ss = next(it), next(it), next(it)
        nn = next(it) if noise is not None else None
        bb = next(it) if bias is not None else None
        gg = next(it)
        outs = sn.modconv_bwd_explicit(xx, ww, ss, nn, bb, gg, GAIN, ALPHA,
                                       demod)
        return tuple(o for o in outs if o is not None)

    cots_in = tuple(c for c in (cdx, cdw, cds, cdn, cdb) if c is not None)
    auto = jax.vjp(first_order, *args)[1](cots_in)

    cx, cw, cs, cn, cb, cg = sn.modconv_bwd_vjp_explicit(
        x, w, s, noise, bias, g, (cdx, cdw, cds, cdn, cdb), GAIN, ALPHA,
        demod)
    hand = [cx, cw, cs] + ([cn, cb] if with_extras else []) + [cg]
    assert len(auto) == len(hand)
    names = ["cx", "cw", "cs"] + (["cnoise", "cbias"] if with_extras
                                  else []) + ["cg"]
    for name, a, b in zip(names, auto, hand):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5, err_msg=name)


@pytest.mark.parametrize("demod", [False, True])
def test_second_order_vjp_upconv_geometry(demod):
    """The same DAG with the 2x-up conv primitives (lhs-dilation-2, L=4 —
    the composed-FIR geometry of fused_packed_upconv2): proves the
    derivation is conv-geometry-agnostic, so the round-5 mapping covers
    the up-2 op with the same formula set."""
    ops = sn.upconv2_conv_ops()
    rng = np.random.RandomState(3)
    n, h, ci, co = 2, 6, 3, 4
    x = jnp.asarray(rng.randn(n, h, h, ci), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.4, jnp.float32)
    s = jnp.asarray(rng.rand(n, ci) + 0.5, jnp.float32)
    noise = jnp.asarray(rng.randn(n, 2 * h, 2 * h), jnp.float32)
    bias = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(n, 2 * h, 2 * h, co), jnp.float32)
    cdx = jnp.asarray(rng.randn(*x.shape), jnp.float32)
    cdw = jnp.asarray(rng.randn(*w.shape), jnp.float32)
    cds = jnp.asarray(rng.randn(*s.shape), jnp.float32)
    cdn = jnp.asarray(rng.randn(*noise.shape), jnp.float32)
    cdb = jnp.asarray(rng.randn(*bias.shape), jnp.float32)

    def first_order(xx, ww, ss, nn, bb, gg):
        return sn.modconv_bwd_explicit(xx, ww, ss, nn, bb, gg, GAIN, ALPHA,
                                       demod, conv_ops=ops)

    auto = jax.vjp(first_order, x, w, s, noise, bias, g)[1](
        (cdx, cdw, cds, cdn, cdb))
    hand = sn.modconv_bwd_vjp_explicit(
        x, w, s, noise, bias, g, (cdx, cdw, cds, cdn, cdb), GAIN, ALPHA,
        demod, conv_ops=ops)
    for name, a, b in zip(["cx", "cw", "cs", "cnoise", "cbias", "cg"],
                          auto, hand):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5, err_msg=name)
