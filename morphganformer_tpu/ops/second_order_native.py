"""Hand-derived second-order (VJP-of-the-backward) formulas for the fused
modulated conv — executable groundwork for the in-kernel second-order
route (ROADMAP round-4 'Round-5 recipe').

Context: the packed pallas ops' reg-stage grad-of-grad currently rides
XLA (PL 324 ms with the dots remat, R1 497 ms at 1024^2 batch 4) because
every attempted re-routing — recompute wrappers, tap-form refs — lost its
on-chip A/B (ops/second_order.py header). The genuinely better design is
the reference's own bias_act pattern lifted to the fused conv: emit the
second-order terms analytically, with the lrelu mask treated as locally
constant (zero second derivative a.e. — exactly what autodiff of
`where(u>=0, u, a*u)` also produces), so every x-sized term is one of
the THREE existing packed launch geometries (forward conv, transpose
conv, weight-grad taps) with swapped operands.

This module validates that derivation numerically, in pixel space, with
the conv primitives spelled as the linear ops the launches realize:

  _conv(a, k)   = 3x3 same-padding correlation      (fused fwd launch,
                  styles pre-applied, demod off, alpha=gain=1)
  _convT(a, k)  = its transpose in `a`              (adjoint launch dx,
                  alpha=gain=1 degenerates the mask to 1)
  _wg(a, b)     = its transpose in `k`              (adjoint launch's
                  in-kernel dw taps)

`modconv_bwd_explicit` is the first-order backward written against these
primitives (pinned against jax.vjp of the reference composition), and
`modconv_bwd_vjp_explicit` is the hand-derived VJP of that backward
(pinned against jax.vjp-of-jax.vjp). Everything that is NOT a primitive
call operates on [N,Co] / [Ci,Co] / [3,3,Ci,Co]-sized tensors —
negligible next to the conv launches.

Mapping to pallas (round 5): replace each _conv/_convT/_wg call with the
corresponding packed launch; fold the elementwise pre/post scalings into
the launches' existing style/demod/epilogue slots; recover z and the
mask from the saved y via the act-inverse identity the kernels already
use. Reference anchor: bias_act.cu:44-58 (in-kernel 2nd-order grads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _conv(a, k):
    """3x3 same-padding correlation (the launches' tap geometry; identical
    to second_order.modconv_ref's _taps_conv3x3)."""
    n, h, w, _ = a.shape
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for i in range(3):
        for j in range(3):
            t = jnp.einsum("nhwc,co->nhwo", ap[:, i:i + h, j:j + w, :],
                           k[i, j])
            out = t if out is None else out + t
    return out


def _convT(a, k):
    """Transpose of _conv in its first argument (dx of the adjoint launch
    with alpha=gain=1)."""
    zeros = jnp.zeros(a.shape[:3] + (k.shape[2],), a.dtype)
    return jax.vjp(lambda x_: _conv(x_, k), zeros)[1](a)[0]


def _wg(a, b):
    """Transpose of _conv in its kernel argument: the weight-grad taps.
    a: [N,H,W,Ci] (input side), b: [N,H,W,Co] (cotangent side)."""
    zeros = jnp.zeros((3, 3, a.shape[-1], b.shape[-1]), a.dtype)
    return jax.vjp(lambda k_: _conv(a, k_), zeros)[1](b)[0]


def _mask(u, gain, alpha):
    """act'(u) for y = gain * lrelu_alpha(u), a.e. (the second derivative
    is zero a.e. — both here and under autodiff of jnp.where)."""
    return jnp.where(u >= 0, gain, gain * alpha)


def default_conv_ops():
    """(conv, convT, wg) for the same-res 3x3 op."""
    return _conv, _convT, _wg


def upconv2_conv_ops():
    """(conv, convT, wg) for the 2x-up conv (lhs-dilation 2 with a kxk
    kernel — the geometry of fused_packed_upconv2's composed-FIR conv;
    the exact FIR composition is a fixed linear map folded into k).
    The derivation below is agnostic to WHICH linear conv these realize —
    validating with this set proves the same DAG serves the up-2 op."""
    def up(a, k):
        # L=4 kernel, pad (2,2): out = (2H-1) + 4 - 4 + 1 = 2H exactly.
        return jax.lax.conv_general_dilated(
            a, k, window_strides=(1, 1),
            padding=[(2, 2)] * 2, lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def upT(a, k):
        zeros_shape = (a.shape[0], a.shape[1] // 2, a.shape[2] // 2,
                       k.shape[2])
        z = jnp.zeros(zeros_shape, a.dtype)
        return jax.vjp(lambda x_: up(x_, k), z)[1](a)[0]

    def upwg(a, b):
        z = jnp.zeros((4, 4, a.shape[-1], b.shape[-1]), a.dtype)
        return jax.vjp(lambda k_: up(a, k_), z)[1](b)[0]

    return up, upT, upwg


def _forward_pieces(x, w, s, noise, bias, gain, alpha, demodulate,
                    conv_ops=None):
    """Recompute the forward intermediates the backward consumes. (In the
    launch mapping, z/u/m come from the saved y via the act-inverse
    identity instead.)"""
    conv, _, _ = conv_ops or default_conv_ops()
    xs = x * s[:, None, None, :]
    z = conv(xs, w)
    if demodulate:
        wsq = jnp.sum(jnp.square(w), axis=(0, 1))              # [Ci,Co]
        q = jnp.square(s) @ wsq                                # [N,Co]
        d = jax.lax.rsqrt(q + _EPS)
    else:
        wsq = None
        d = jnp.ones((x.shape[0], w.shape[-1]), x.dtype)
    u = z * d[:, None, None, :]
    if noise is not None:
        # [N,H,W] per-sample or [H,W] batch-shared (broadcasts over N).
        u = u + noise[..., None]
    if bias is not None:
        u = u + bias
    m = _mask(u, gain, alpha)
    return xs, z, wsq, d, u, m


def modconv_fwd_explicit(x, w, s, noise, bias, gain, alpha, demodulate,
                         conv_ops=None):
    """y = gain * lrelu(conv(x*s, w)*d + noise + bias)."""
    _, _, _, _, u, _ = _forward_pieces(x, w, s, noise, bias, gain, alpha,
                                       demodulate, conv_ops)
    return jnp.where(u >= 0, u, alpha * u) * gain


def modconv_bwd_explicit(x, w, s, noise, bias, g, gain, alpha, demodulate,
                         conv_ops=None):
    """First-order backward, spelled against the launch primitives.
    Returns (dx, dw, ds, dnoise, dbias)."""
    conv, convT, wg = conv_ops or default_conv_ops()
    xs, z, wsq, d, _, m = _forward_pieces(x, w, s, noise, bias, gain, alpha,
                                          demodulate, conv_ops)
    gu = g * m
    if noise is None:
        dnoise = None
    elif noise.ndim == 2:          # batch-shared [H,W]
        dnoise = jnp.sum(gu, axis=(0, -1))
    else:                          # per-sample [N,H,W]
        dnoise = jnp.sum(gu, axis=-1)
    dbias = None if bias is None else jnp.sum(gu, axis=(0, 1, 2))
    dz = gu * d[:, None, None, :]
    dxs = convT(dz, w)
    dx = dxs * s[:, None, None, :]
    ds = jnp.sum(x * dxs, axis=(1, 2))
    dw = wg(xs, dz)
    if demodulate:
        dd = jnp.sum(gu * z, axis=(1, 2))                      # [N,Co]
        dq = -0.5 * d ** 3 * dd
        ds = ds + 2.0 * s * (dq @ wsq.T)
        dwsq = jnp.square(s).T @ dq                            # [Ci,Co]
        dw = dw + 2.0 * w * dwsq[None, None]
    return dx, dw, ds, dnoise, dbias


def _recover_from_y(y_act, noise, bias, d, gain, alpha):
    """(mask, z) from the saved activation output instead of a forward
    launch: u = act_inv(y) = y/m exactly on both lrelu branches, and
    z = (u - noise - bias)/d. The round-5 saved-residual route — the
    value recovery replaces `_forward_pieces`'s conv launch, while z's
    INPUT-dependence is handled by routing c_y back through the apply
    op's backward (see modconv_bwd_vjp_from_y)."""
    m = _mask(y_act, gain, alpha)
    v = y_act / m
    if noise is not None:
        v = v - noise[..., None]
    if bias is not None:
        v = v - bias
    z = v / d[:, None, None, :]
    return m, z


def modconv_bwd_from_y_explicit(x, w, s, noise, bias, y_act, g, gain, alpha,
                                demodulate, conv_ops=None):
    """First-order backward as a function of the SAVED output y_act
    (pre-resid activation output) instead of recomputing the forward:
    identical values to modconv_bwd_explicit when y_act is the true
    forward output, but with y treated as an independent input — the
    split whose VJP is modconv_bwd_vjp_from_y. Returns
    (dx, dw, ds, dnoise, dbias)."""
    conv, convT, wg = (conv_ops or default_conv_ops())[:3]
    if demodulate:
        wsq = jnp.sum(jnp.square(w), axis=(0, 1))
        d = jax.lax.rsqrt(jnp.square(s) @ wsq + _EPS)
    else:
        wsq = None
        d = jnp.ones((x.shape[0], w.shape[-1]), x.dtype)
    m, z = _recover_from_y(y_act, noise, bias, d, gain, alpha)
    xs = x * s[:, None, None, :]
    gu = g * m
    if noise is None:
        dnoise = None
    elif noise.ndim == 2:
        dnoise = jnp.sum(gu, axis=(0, -1))
    else:
        dnoise = jnp.sum(gu, axis=-1)
    dbias = None if bias is None else jnp.sum(gu, axis=(0, 1, 2))
    dz = gu * d[:, None, None, :]
    dxs = convT(dz, w)
    dx = dxs * s[:, None, None, :]
    ds = jnp.sum(x * dxs, axis=(1, 2))
    dw = wg(xs, dz)
    if demodulate:
        dd = jnp.sum(gu * z, axis=(1, 2))
        dq = -0.5 * d ** 3 * dd
        ds = ds + 2.0 * s * (dq @ wsq.T)
        dwsq = jnp.square(s).T @ dq
        dw = dw + 2.0 * w * dwsq[None, None]
    return dx, dw, ds, dnoise, dbias


def modconv_bwd_vjp_from_y(x, w, s, noise, bias, y_act, g, cots, gain, alpha,
                           demodulate, conv_ops=None, adj_op=None,
                           conv_resid=None):
    """Hand-derived VJP of modconv_bwd_from_y_explicit at output
    cotangents `cots = (cdx, cdw, cds, cdnoise, cdbias)` (entries may be
    None = structurally zero: the corresponding launches are SKIPPED —
    in PL only cdx/cds are live, in R1 only cdx). Returns
    (c_x, c_w, c_s, c_noise, c_bias, c_y, c_g) — c_y is the cotangent of
    y_act, which the caller routes back through the apply op's backward
    (one adjoint launch that ALREADY fires for the other y consumers);
    that route carries what [L5]/[L6] of modconv_bwd_vjp_explicit
    computed as separate launches, which is the point of the split.

    Launch inventory (vs 8 in the recompute DAG):
      A  = adj_op(dz, c_dxs, w)  -> (dxs, wg(c_dxs, dz))   [one launch]
      B  = convT(dz, cdw)                                  [iff cdw]
      L2 = conv(xs, cdw)                                   [iff cdw]
      L3 = conv(c_dxs, w) [+L2 via the launch's resid slot when
           conv_resid is provided]
    Everything else is [N,Co]/[Ci,Co]-sized algebra or XLA-fused
    elementwise. The fake z-dependence introduced by the y-recovery
    (c_d/c_noise/c_bias recovery terms below) cancels exactly against
    the y-route through the apply backward — see the split-consistency
    test in tests/test_second_order_native.py."""
    cdx, cdw, cds, cdn, cdb = cots
    conv, convT, wg = (conv_ops or default_conv_ops())[:3]
    if adj_op is None:
        def adj_op(g_, x_, k_):
            return convT(g_, k_), wg(x_, g_)
    f32 = jnp.float32
    # Dtype discipline on the hot path (bf16 production tensors): every
    # x-sized stream stays in its input dtype; [N,C]/[C,O] demod algebra
    # and all pixel reductions accumulate in f32 (casts fuse into the
    # reduce pass — zero extra bytes). Matches _modconv_bwd_impl's
    # first-order discipline.
    s32 = s.astype(f32)
    if demodulate:
        wsq = jnp.sum(jnp.square(w.astype(f32)), axis=(0, 1))
        d = jax.lax.rsqrt(jnp.square(s32) @ wsq + _EPS)
    else:
        wsq = None
        d = jnp.ones((x.shape[0], w.shape[-1]), f32)
    m, z = _recover_from_y(y_act, noise, bias, d.astype(y_act.dtype),
                           gain, alpha)
    sNx = s.astype(x.dtype)[:, None, None, :]
    dNg = d.astype(g.dtype)[:, None, None, :]
    gu = g * m
    dz = gu * dNg

    def red(t):
        """sum over pixels -> [N, ch], f32 accumulator."""
        return jnp.sum(t.astype(f32), axis=(1, 2))

    c_gu = jnp.zeros_like(gu)
    c_x = jnp.zeros_like(x)
    c_w = jnp.zeros(w.shape, f32)
    c_s = jnp.zeros(s.shape, f32)
    c_d = jnp.zeros(d.shape, f32)

    if cdb is not None:
        c_gu = c_gu + cdb.astype(c_gu.dtype)[None, None, None, :]
    if cdn is not None:
        cdn_b = cdn[None, :, :, None] if cdn.ndim == 2 else cdn[..., None]
        c_gu = c_gu + cdn_b.astype(c_gu.dtype)

    # dx = dxs*s ; ds_conv = sum x*dxs, with dxs = convT(dz, w): launch A
    # serves dxs from its dx slot and wg(c_dxs, dz) (the w-dependence of
    # dxs) from its in-kernel dw taps — one streamed pass over (dz,
    # c_dxs) where the recompute DAG took two.
    c_dxs = None
    if cdx is not None:
        c_dxs = cdx * sNx
    if cds is not None:
        t = cds.astype(x.dtype)[:, None, None, :] * x
        c_dxs = t if c_dxs is None else c_dxs + t
    # dw_conv = wg(xs, dz): its xs/dz dependences ([B]/[L2], iff cdw).
    c_xs = t2 = None
    if cdw is not None:
        xs = x * sNx
        c_xs = convT(dz, cdw)                                    # [B]
        t2 = conv(xs, cdw)                                       # [L2]

    c_dz = t2
    if c_dxs is not None:
        dxs, cw_a = adj_op(dz, c_dxs, w)                         # [A]
        c_w = c_w + cw_a.astype(f32)
        if cdx is not None:
            c_s = c_s + red(cdx * dxs)
        if cds is not None:
            c_x = c_x + (cds.astype(dxs.dtype)[:, None, None, :]
                         * dxs).astype(c_x.dtype)
        if t2 is not None and conv_resid is not None:
            c_dz = conv_resid(c_dxs, w, t2)                      # [L3]+resid
        else:
            t3 = conv(c_dxs, w)                                  # [L3]
            c_dz = t3 if c_dz is None else c_dz + t3

    # Demod chain of the primal (dd/dq/dwsq): only live when cds or cdw.
    c_z = None
    if demodulate and (cds is not None or cdw is not None):
        dd = red(gu * z)
        dq = -0.5 * d ** 3 * dd
        c_dq = jnp.zeros_like(dq)
        c_wsq = jnp.zeros_like(wsq)
        if cds is not None:
            cds32 = cds.astype(f32)
            c_s = c_s + 2.0 * cds32 * (dq @ wsq.T)
            c_dq = c_dq + 2.0 * jnp.einsum("ni,ni,io->no", cds32, s32, wsq)
            c_wsq = c_wsq + 2.0 * jnp.einsum("ni,ni,no->io", cds32, s32, dq)
        if cdw is not None:
            cdw32 = cdw.astype(f32)
            dwsq = jnp.square(s32).T @ dq
            c_w = c_w + 2.0 * cdw32 * dwsq[None, None]
            c_dwsq = 2.0 * jnp.sum(cdw32 * w.astype(f32), axis=(0, 1))
            c_s = c_s + 2.0 * s32 * jnp.einsum("io,no->ni", c_dwsq, dq)
            c_dq = c_dq + jnp.einsum("io,ni->no", c_dwsq, jnp.square(s32))
        c_d = c_d + (-1.5) * d ** 2 * dd * c_dq
        c_dd = -0.5 * d ** 3 * c_dq
        c_ddN = c_dd.astype(gu.dtype)[:, None, None, :]
        c_gu = c_gu + z.astype(gu.dtype) * c_ddN
        c_z = gu * c_ddN
    elif demodulate:
        c_wsq = jnp.zeros_like(wsq)
    else:
        c_wsq = None

    # dz = gu*d
    if c_dz is not None:
        c_gu = c_gu + c_dz.astype(c_gu.dtype) * dNg
        c_d = c_d + red(gu * c_dz.astype(gu.dtype))

    # z = (y/m - nz - b)/d: the recovery's own (fake) dependences — the
    # y part is the REAL route (apply-backward), the noise/bias/d parts
    # cancel against it exactly (split-consistency test).
    c_y = None
    c_n = None if noise is None else jnp.zeros(noise.shape, f32)
    c_b = None if bias is None else jnp.zeros(bias.shape, f32)
    if c_z is not None:
        dNy = d.astype(c_z.dtype)[:, None, None, :]
        c_y = c_z / (m.astype(c_z.dtype) * dNy)
        czd = c_z / dNy
        if noise is not None:
            rr = jnp.sum(czd.astype(f32), axis=-1)
            c_n = -(jnp.sum(rr, axis=0) if noise.ndim == 2 else rr)
        if bias is not None:
            c_b = -jnp.sum(jnp.sum(czd.astype(f32), axis=(1, 2)), axis=0)
        c_d = c_d - red(z.astype(czd.dtype) * czd)

    # xs = x*s (from the cdw branch's c_xs)
    if c_xs is not None:
        c_x = c_x + (c_xs * sNx.astype(c_xs.dtype)).astype(c_x.dtype)
        c_s = c_s + red(x * c_xs.astype(x.dtype))

    # d = rsqrt(q+eps), q = s^2 @ wsq, wsq = sum w^2
    if demodulate:
        c_q = -0.5 * d ** 3 * c_d
        c_s = c_s + 2.0 * s32 * (c_q @ wsq.T)
        c_wsq = c_wsq + jnp.square(s32).T @ c_q
        c_w = c_w + 2.0 * w.astype(f32) * c_wsq[None, None]

    c_g = m * c_gu
    return c_x, c_w, c_s, c_n, c_b, c_y, c_g


def modconv_bwd_vjp_explicit(x, w, s, noise, bias, g, cots, gain, alpha,
                             demodulate, conv_ops=None):
    """Hand-derived VJP of modconv_bwd_explicit at output cotangents
    `cots = (cdx, cdw, cds, cdnoise, cdbias)`; returns cotangents
    (cx, cw, cs, cnoise, cbias, cg). The lrelu mask is locally constant,
    matching autodiff exactly (a.e.).

    Launch-shaped calls are marked [L#]; everything else is [N,Co],
    [N,Ci], [Ci,Co] or [3,3,Ci,Co]-sized algebra."""
    cdx, cdw, cds, cdn, cdb = cots
    conv, convT, wg = conv_ops or default_conv_ops()
    xs, z, wsq, d, _, m = _forward_pieces(x, w, s, noise, bias, gain, alpha,
                                          demodulate, conv_ops)
    sN = s[:, None, None, :]
    dN = d[:, None, None, :]
    gu = g * m
    dz = gu * dN
    dxs = convT(dz, w)                                        # [L0] primal

    c_gu = jnp.zeros_like(gu)
    c_dz = jnp.zeros_like(dz)
    c_dxs = jnp.zeros_like(dxs)
    c_z = jnp.zeros_like(z)
    c_xs = jnp.zeros_like(xs)
    c_x = jnp.zeros_like(x)
    c_w = jnp.zeros_like(w)
    c_s = jnp.zeros_like(s)
    c_d = jnp.zeros_like(d)

    # outputs -> immediate feeders
    if cdb is not None:
        c_gu = c_gu + cdb[None, None, None, :]
    if cdn is not None:
        cdn_b = cdn[None, :, :, None] if cdn.ndim == 2 else cdn[..., None]
        c_gu = c_gu + cdn_b
    # dx = dxs * s
    c_dxs = c_dxs + cdx * sN
    c_s = c_s + jnp.sum(cdx * dxs, axis=(1, 2))
    # ds_conv = sum_hw x * dxs
    cdsN = cds[:, None, None, :]
    c_x = c_x + cdsN * dxs
    c_dxs = c_dxs + cdsN * x
    # dw_conv = WG(xs, dz). Transpose identities (<cdw, wg(a,b)> =
    # <conv(a,cdw), b>): the vjp in `a` is convT(b, cdw), in `b` is
    # conv(a, cdw) — both are the SAME launch geometries with the
    # cotangent kernel cdw in the kernel slot.
    c_xs = c_xs + convT(dz, cdw)                                # [L1]
    c_dz = c_dz + conv(xs, cdw)                                 # [L2]

    if demodulate:
        dd = jnp.sum(gu * z, axis=(1, 2))
        dq = -0.5 * d ** 3 * dd
        dwsq = jnp.square(s).T @ dq
        c_dq = jnp.zeros_like(dq)
        c_wsq = jnp.zeros_like(wsq)
        # ds_dm = 2 s (dq @ wsq^T)
        c_s = c_s + 2.0 * cds * (dq @ wsq.T)
        c_dq = c_dq + 2.0 * jnp.einsum("ni,ni,io->no", cds, s, wsq)
        c_wsq = c_wsq + 2.0 * jnp.einsum("ni,ni,no->io", cds, s, dq)
        # dw_dm = 2 w dwsq
        c_w = c_w + 2.0 * cdw * dwsq[None, None]
        c_dwsq = 2.0 * jnp.sum(cdw * w, axis=(0, 1))
        # dwsq = s^2^T @ dq
        c_s = c_s + 2.0 * s * jnp.einsum("io,no->ni", c_dwsq, dq)
        c_dq = c_dq + jnp.einsum("io,ni->no", c_dwsq, jnp.square(s))
        # dq = -1/2 d^3 dd
        c_d = c_d + (-1.5) * d ** 2 * dd * c_dq
        c_dd = -0.5 * d ** 3 * c_dq
        # dd = sum_hw gu * z
        c_gu = c_gu + z * c_dd[:, None, None, :]
        c_z = c_z + gu * c_dd[:, None, None, :]
    else:
        c_wsq = None

    # dxs = convT(dz, w). Transposes (<a, convT(b,k)> = <conv(a,k), b>):
    # in `dz` the vjp is conv(c_dxs, w); in `w` it is wg(c_dxs, dz).
    c_dz = c_dz + conv(c_dxs, w)                                # [L3]
    c_w = c_w + wg(c_dxs, dz)                                   # [L4]
    # dz = gu * d
    c_gu = c_gu + c_dz * dN
    c_d = c_d + jnp.sum(gu * c_dz, axis=(1, 2))
    # z = conv(xs, w)
    c_xs = c_xs + convT(c_z, w)                               # [L5]
    c_w = c_w + wg(xs, c_z)                                   # [L6]
    # xs = x * s
    c_x = c_x + c_xs * sN
    c_s = c_s + jnp.sum(x * c_xs, axis=(1, 2))
    # d = rsqrt(q + eps); q = s^2 @ wsq; wsq = sum_k w^2
    if demodulate:
        c_q = -0.5 * d ** 3 * c_d
        c_s = c_s + 2.0 * s * (c_q @ wsq.T)
        c_wsq = c_wsq + jnp.square(s).T @ c_q
        c_w = c_w + 2.0 * w * c_wsq[None, None]
    # gu = g * m (m locally constant)
    c_g = m * c_gu

    # noise/bias enter the backward only through the (locally constant)
    # mask — their cotangents are exactly zero, as under autodiff.
    c_n = None if noise is None else jnp.zeros(noise.shape, x.dtype)
    c_b = None if bias is None else jnp.zeros(bias.shape, x.dtype)
    return c_x, c_w, c_s, c_n, c_b, c_g
