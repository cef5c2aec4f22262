"""Gated packed second-order (MGT_PACKED_SECOND_ORDER=1) parity.

tests/test_second_order_packed.py pins the DEFAULT behavior: PL/R1
grad-of-grad traces fall back to the unpacked XLA layers via
force_unpacked, because a bare pallas launch in the consumed trace has
no JVP rule. This file tests the opt-in alternative
(ops/second_order.py): with the gate set, each packed op routes its
custom VJP through protected wrappers so reverse-over-reverse works
with every first-order primal still on the packed kernels. Parity is
pinned against pure-XLA autodiff of the unpacked reference composition
(the executable spec, SURVEY.md §4.1) — run on CPU where the launches
take their interpret path.

Reference anchor: training/loss.py:92-107 (PL via
torch.autograd.grad(create_graph=True)), :149-159 (R1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphganformer_tpu.ops.pallas_conv import (
    fused_modconv3x3_lrelu,
    fused_packed_dconv2,
    fused_packed_upconv2,
)
from morphganformer_tpu.ops.second_order import (
    dconv_ref,
    modconv_ref,
    packed_second_order,
    upconv_ref,
)
from morphganformer_tpu.ops.upfirdn2d import setup_filter


@pytest.fixture
def so_gate(monkeypatch):
    monkeypatch.setenv("MGT_PACKED_SECOND_ORDER", "1")
    assert packed_second_order()


def _rand(seed, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32) * scale


def _check_second_order(packed_fn, ref_fn, x, params, seed):
    """Compare d/dparams of a PL/R1-shaped penalty of the inner grad:
        inner(x) = d/dx sum(op(x; params) * t)
        outer(params) = sum((inner field)^2-ish nonlinearity)
    between the gated packed op and the pure-XLA reference."""
    t = _rand(seed, jax.eval_shape(lambda: ref_fn(x, *params)).shape)

    def make_outer(fn):
        def outer(*ps):
            inner = jax.grad(lambda xx: jnp.sum(fn(xx, *ps) * t))(x)
            # R1-shaped: sum of squares; keeps the outer cotangent dense.
            return jnp.sum(jnp.square(inner))
        return outer

    o_p, g_p = jax.value_and_grad(make_outer(packed_fn),
                                  argnums=tuple(range(len(params))))(*params)
    o_r, g_r = jax.value_and_grad(make_outer(ref_fn),
                                  argnums=tuple(range(len(params))))(*params)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(g_p, g_r):
        if b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    return g_p


@pytest.mark.slow
def test_modconv_second_order_matches_ref(so_gate):
    n, h, wdt, c, o = 1, 8, 16, 8, 8
    x = _rand(0, (n, h, wdt, c))
    w = _rand(1, (3, 3, c, o), 0.3)
    s = _rand(2, (n, c), 0.5) + 1.0
    noise = _rand(3, (h, wdt), 0.1)
    b = _rand(4, (o,), 0.1)

    packed = lambda xx, ww, ss: fused_modconv3x3_lrelu(
        xx, ww, ss, noise, b, None, 1.4, 0.2, True, False)
    ref = lambda xx, ww, ss: modconv_ref(
        xx, ww, ss, noise, b, None, 1.4, 0.2, True, False)
    _check_second_order(packed, ref, x, (w, s), seed=5)


@pytest.mark.slow
def test_modconv_second_order_packed_io_resid(so_gate):
    n, h, wdt, c = 1, 8, 16, 8
    pack = 128 // c
    x = _rand(0, (n, h, wdt // pack, pack * c))
    w = _rand(1, (3, 3, c, c), 0.3)
    s = _rand(2, (n, c), 0.5) + 1.0
    resid = _rand(3, (n, h, wdt // pack, pack * c))

    packed = lambda xx, ww, ss: fused_modconv3x3_lrelu(
        xx, ww, ss, None, None, resid, 1.0, 0.2, True, True)
    ref = lambda xx, ww, ss: modconv_ref(
        xx, ww, ss, None, None, resid, 1.0, 0.2, True, True)
    _check_second_order(packed, ref, x, (w, s), seed=6)


@pytest.mark.slow
def test_upconv_second_order_matches_ref(so_gate):
    n, h_in, cin, cout = 1, 4, 16, 8
    P = 128 // cin
    wdt = 16
    G = wdt // P
    x = _rand(0, (n, h_in, G, P * cin))
    w = _rand(1, (3, 3, cin, cout), 0.3)
    s = _rand(2, (n, cin), 0.5) + 1.0
    f = setup_filter([1, 3, 3, 1])
    noise = _rand(3, (2 * h_in, 2 * wdt), 0.1)
    b = _rand(4, (cout,), 0.1)

    packed = lambda xx, ww, ss: fused_packed_upconv2(
        xx, ww, ss, f, noise, b, 1.4, 0.2, True, False)
    ref = lambda xx, ww, ss: upconv_ref(
        xx, ww, ss, f, noise, b, 1.4, 0.2, True, False)
    _check_second_order(packed, ref, x, (w, s), seed=7)


@pytest.mark.slow
def test_upconv_skip_k1_second_order_matches_ref(so_gate):
    """The unmodulated 1x1 skip branch (Conv2dLayer packed up=2): k=1 +
    4-tap FIR => L=4/p0=2 tap path. This config produced the round-3
    second OOM (its ref previously fell back to conv2d_resample, whose
    conv weight-grad transposes materialize [Ci,2H,2W,Co] temps)."""
    n, h_in, cin, cout = 1, 4, 16, 8
    P = 128 // cin
    wdt = 16
    G = wdt // P
    x = _rand(0, (n, h_in, G, P * cin))
    w = _rand(1, (1, 1, cin, cout), 0.3)
    f = setup_filter([1, 3, 3, 1])

    packed = lambda xx, ww: fused_packed_upconv2(
        xx, ww, None, f, None, None, 0.5, 1.0, False, False)
    ref = lambda xx, ww: upconv_ref(
        xx, ww, None, f, None, None, 0.5, 1.0, False, False)
    _check_second_order(packed, ref, x, (w,), seed=11)


@pytest.mark.slow
def test_dconv_second_order_matches_ref(so_gate):
    n, h, cin = 1, 8, 16
    cout = 2 * cin
    Q = 128 // cin
    P = Q // 2
    wdt = 16
    G = wdt // Q
    x = _rand(0, (n, h, G, Q * cin))
    w = _rand(1, (3, 3, cin, cout), 0.3)
    f = setup_filter([1, 3, 3, 1])
    b = _rand(4, (cout,), 0.1)

    packed = lambda xx, ww: fused_packed_dconv2(
        xx, ww, f, b, None, 1.4, 0.2, True)
    ref = lambda xx, ww: dconv_ref(xx, ww, f, b, None, 1.4, 0.2, True)
    _check_second_order(packed, ref, x, (w,), seed=8)


@pytest.mark.slow
def test_scope_routes_without_env(monkeypatch):
    """second_order_scope() routes the packed VJPs per-trace with the
    env unset — the shape training/loss.py's reg stages use so the
    first-order main stages keep the lean saved-residual backward."""
    monkeypatch.delenv("MGT_PACKED_SECOND_ORDER", raising=False)
    from morphganformer_tpu.ops.second_order import (reg_stage_second_order,
                                                     second_order_scope)
    assert not packed_second_order()
    # Default policy since round 4's native launch legs: SCOPED for both
    # stages (on-chip PL 260.8 ms vs 324.0 force_unpacked, R1 219.1 vs
    # 496.9); MGT_PACKED_SECOND_ORDER=0 is the force_unpacked fallback.
    assert reg_stage_second_order("pl")
    assert reg_stage_second_order("r1")

    n, h, wdt, c, o = 1, 8, 16, 8, 8
    x = _rand(0, (n, h, wdt, c))
    w = _rand(1, (3, 3, c, o), 0.3)
    s = _rand(2, (n, c), 0.5) + 1.0

    packed = lambda xx, ww, ss: fused_modconv3x3_lrelu(
        xx, ww, ss, None, None, None, 1.4, 0.2, True, False)
    ref = lambda xx, ww, ss: modconv_ref(
        xx, ww, ss, None, None, None, 1.4, 0.2, True, False)

    with second_order_scope():
        assert packed_second_order()
        _check_second_order(packed, ref, x, (w, s), seed=9)
    assert not packed_second_order()

    # Outside the scope the packed op is first-order-only again.
    t = _rand(9, jax.eval_shape(lambda: ref(x, w, s)).shape)
    with pytest.raises(Exception):
        jax.grad(lambda ww: jnp.sum(jnp.square(
            jax.grad(lambda xx: jnp.sum(packed(xx, ww, s) * t))(x))))(w)


def test_reg_stage_policy_tristate(monkeypatch):
    from morphganformer_tpu.ops import second_order as so
    monkeypatch.setenv("MGT_PACKED_SECOND_ORDER", "1")
    assert so.reg_stage_second_order("pl") and so.reg_stage_second_order("r1")
    monkeypatch.setenv("MGT_PACKED_SECOND_ORDER", "0")
    assert not so.reg_stage_second_order("pl")
    assert not so.reg_stage_second_order("r1")
    monkeypatch.delenv("MGT_PACKED_SECOND_ORDER")
    for stage in ("pl", "r1"):
        assert (so.reg_stage_second_order(stage)
                == so._DEFAULT_REG_SECOND_ORDER[stage])


@pytest.mark.slow
def test_gate_on_first_order_unchanged(so_gate):
    """The routed path must leave FIRST-order values/grads identical to
    the ungated packed path (same launches, same numbers)."""
    n, h, wdt, c, o = 2, 8, 8, 8, 8
    x = _rand(0, (n, h, wdt, c))
    w = _rand(1, (3, 3, c, o), 0.3)
    s = _rand(2, (n, c), 0.5) + 1.0
    noise = _rand(3, (h, wdt), 0.1)

    def loss(xx, ww, ss):
        return jnp.sum(jnp.sin(fused_modconv3x3_lrelu(
            xx, ww, ss, noise, None, None, 1.4, 0.2, True, False)))

    v_on, g_on = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, s)

    import os
    os.environ["MGT_PACKED_SECOND_ORDER"] = "0"
    try:
        v_off, g_off = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, s)
    finally:
        os.environ["MGT_PACKED_SECOND_ORDER"] = "1"
    np.testing.assert_allclose(np.asarray(v_on), np.asarray(v_off),
                               rtol=0, atol=0)
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
