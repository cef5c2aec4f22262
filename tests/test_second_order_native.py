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
@pytest.mark.parametrize("live", ["all", "pl", "r1"])
def test_second_order_vjp_from_y_matches_autodiff(demod, live):
    """Round-5 saved-residual route: the hand VJP of the backward
    WRITTEN AGAINST THE SAVED y (modconv_bwd_vjp_from_y) vs jax.vjp of
    modconv_bwd_from_y_explicit with y as an independent input. The
    `live` axis exercises the structural-zero cotangent skips (PL keeps
    cdx/cds, R1 keeps only cdx)."""
    x, w, s, noise, bias, g = _pieces(demod)
    y = sn.modconv_fwd_explicit(x, w, s, noise, bias, GAIN, ALPHA, demod)
    rng = np.random.RandomState(7)
    cdx = jnp.asarray(rng.randn(*x.shape), jnp.float32)
    cdw = jnp.asarray(rng.randn(*w.shape), jnp.float32)
    cds = jnp.asarray(rng.randn(*s.shape), jnp.float32)
    cdn = jnp.asarray(rng.randn(*noise.shape), jnp.float32)
    cdb = jnp.asarray(rng.randn(*bias.shape), jnp.float32)
    if live == "pl":
        cdw = cdn = cdb = None
    elif live == "r1":
        cdw = cds = cdn = cdb = None

    def first_order(xx, ww, ss, nn, bb, yy, gg):
        return sn.modconv_bwd_from_y_explicit(xx, ww, ss, nn, bb, yy, gg,
                                              GAIN, ALPHA, demod)

    cots_in = tuple(c if c is not None else jnp.zeros_like(p)
                    for c, p in zip((cdx, cdw, cds, cdn, cdb),
                                    first_order(x, w, s, noise, bias, y, g)))
    auto = jax.vjp(first_order, x, w, s, noise, bias, y, g)[1](cots_in)

    hand = sn.modconv_bwd_vjp_from_y(
        x, w, s, noise, bias, y, g, (cdx, cdw, cds, cdn, cdb), GAIN, ALPHA,
        demod)
    names = ["cx", "cw", "cs", "cnoise", "cbias", "cy", "cg"]
    for name, a, b in zip(names, auto, hand):
        if b is None:
            b = jnp.zeros_like(a)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5, err_msg=name)


@pytest.mark.parametrize("demod", [False, True])
def test_from_y_split_consistency(demod):
    """The split total must equal the recompute total: vjp_from_y's cots
    PLUS c_y routed through jax.vjp of the forward == jax.vjp of the
    recompute-based backward (the round-4 semantics). This pins the
    claim that the fake z-recovery dependences (c_d/c_noise/c_bias
    terms) cancel exactly against the y-route — i.e. that routing c_y
    through the apply op's backward reproduces [L5]/[L6]."""
    x, w, s, noise, bias, g = _pieces(demod, seed=4)
    rng = np.random.RandomState(11)
    cots = tuple(jnp.asarray(rng.randn(*t.shape), jnp.float32)
                 for t in (x, w, s, noise, bias))

    full = sn.modconv_bwd_vjp_explicit(x, w, s, noise, bias, g, cots,
                                       GAIN, ALPHA, demod)

    y, fwd_vjp = jax.vjp(
        lambda xx, ww, ss, nn, bb: sn.modconv_fwd_explicit(
            xx, ww, ss, nn, bb, GAIN, ALPHA, demod), x, w, s, noise, bias)
    cx, cw, cs, cn, cb, cy, cg = sn.modconv_bwd_vjp_from_y(
        x, w, s, noise, bias, y, g, cots, GAIN, ALPHA, demod)
    if cy is None:
        cy = jnp.zeros_like(y)
    ax, aw, as_, an, ab = fwd_vjp(cy)
    split = (cx + ax, cw + aw, cs + as_, cn + an, cb + ab, cg)
    for name, a, b in zip(["cx", "cw", "cs", "cnoise", "cbias", "cg"],
                          full, split):
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
