"""Pallas TPU kernel: VMEM-resident SAME 3x3 convolution (NHWC).

Why: on this hardware XLA's conv lowering for the synthesis network's
high-resolution low-channel layers (32-64 ch at 512^2-1024^2, batch 1)
re-reads the input from HBM per tap — measured ~2.3 ms for a 3x3/32ch/1024^2
conv whose HBM roofline is ~0.2 ms. This kernel keeps the input in HBM,
DMAs each row tile (plus 1-row halo) into VMEM once, accumulates the 9 taps
as MXU matmuls from VMEM, and writes the tile once.

STATUS: correct (golden-tested fwd + custom-vjp grads incl. the packed
variant; runs compiled on TPU). With lane packing (conv3x3_same_packed:
4 W-pixels x 32 ch per 128-lane group via a block-structured kernel) and
double-buffered row DMA it measures 2.15x over XLA's conv in isolation
(1.14 ms vs 2.45 ms at C=32/1024^2 bf16; 1.44x at C=64/512^2). However,
wired into the full synthesis network it is a net LOSS (~0.7x end to end):
the pallas call is a fusion barrier, so XLA can no longer fold the
surrounding style-scale/demod/noise/bias/lrelu elementwise chain into the
conv, adding full-image HBM passes. It is therefore opt-in
(MGT_PALLAS_CONV=1). Round-2 plan: grow the kernel to cover the whole
modulated-conv epilogue (style scale in, demod+noise+bias+lrelu out), at
which point the fusion barrier disappears and the isolated 2x carries over.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_hbm, w_ref, o_ref, x_vmem, sems, *, tile_h, width):
    """Grid: (batch, row_tiles). x_hbm: padded input [N, H+2, Wp, C] in HBM;
    w_ref: [3,3,C,O] in VMEM; o_ref: VMEM out block [1, tile_h, W, O];
    x_vmem: double-buffered scratch [2, tile_h+2, Wp, C]. The next row
    tile's DMA is issued before computing the current one (the scratch and
    semaphores persist across the sequential grid steps)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    c = x_vmem.shape[-1]
    o = o_ref.shape[-1]
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def dma(s, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(tile_idx * tile_h, tile_h + 2)],
            x_vmem.at[s], sems.at[s])

    @pl.when(i == 0)
    def _():
        dma(slot, i).start()

    @pl.when(i + 1 < n_i)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    x = x_vmem[slot]                               # [tile_h+2, Wp, C]
    acc = jnp.zeros((tile_h * width, o), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = x[dy:dy + tile_h, dx:dx + width, :].reshape(
                tile_h * width, c)
            acc = acc + jnp.dot(win, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(tile_h, width, o).astype(o_ref.dtype)


def _conv3x3_epilogue_kernel(x_hbm, w_ref, noise_ref, bias_ref, o_ref,
                             x_vmem, sems, *, tile_h, width, gain, alpha):
    """Fused synthesis-layer tail: conv + noise + bias + leaky_relu*gain.

    Same double-buffered row pipeline as _conv3x3_kernel; noise_ref is a
    regular pipelined block [1, tile_h, W, O] (pre-scaled, channel-
    broadcast), bias_ref a [1, O] vector."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    c = x_vmem.shape[-1]
    o = o_ref.shape[-1]
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def dma(s, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(tile_idx * tile_h, tile_h + 2)],
            x_vmem.at[s], sems.at[s])

    @pl.when(i == 0)
    def _():
        dma(slot, i).start()

    @pl.when(i + 1 < n_i)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    x = x_vmem[slot]
    acc = jnp.zeros((tile_h * width, o), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = x[dy:dy + tile_h, dx:dx + width, :].reshape(
                tile_h * width, c)
            acc = acc + jnp.dot(win, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    y = acc.reshape(tile_h, width, o)
    y = y + noise_ref[0].astype(jnp.float32)
    y = y + bias_ref[0][None, None, :].astype(jnp.float32)
    y = jnp.where(y >= 0, y, y * alpha) * gain
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_tile_h(h, c, o, w):
    budget = 7 * 1024 * 1024  # leave headroom for double-buffered out blocks
    for tile in (128, 64, 32, 16, 8, 4, 2, 1):
        if h % tile:
            continue
        in_bytes = 2 * (tile + 2) * (w + 8) * c * 2  # double-buffered
        out_bytes = 2 * tile * w * max(o, 128) * 2   # pipelined x2
        acc_bytes = tile * w * max(o, 128) * 4
        if in_bytes + out_bytes + acc_bytes <= budget:
            return tile
    return 1


def conv3x3_same_pallas(x, w):
    """SAME-padded stride-1 3x3 correlation. x: [N,H,W,C]; w: [3,3,C,O]."""
    n, h, width, c = x.shape
    o = w.shape[-1]
    # Mosaic DMA slices need the sublane (W) extent 8-aligned and the lane
    # (C) extent 128-aligned. The tiled HBM layout pads lanes to 128
    # physically anyway, so widening C is free in traffic terms.
    wpad = -(-(width + 2) // 8) * 8
    cpad = -(-c // 128) * 128
    tile_h = _pick_tile_h(h, cpad, o, width)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - width - 1), (0, cpad - c)))
    w = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))
    c = cpad

    return pl.pallas_call(
        functools.partial(_conv3x3_kernel, tile_h=tile_h, width=width),
        out_shape=jax.ShapeDtypeStruct((n, h, width, o), x.dtype),
        grid=(n, h // tile_h),
        interpret=jax.default_backend() == "cpu",  # tests run interpreted
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # stays in HBM
            pl.BlockSpec((3, 3, c, o), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, width, o),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wpad, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, w.astype(x.dtype))


@jax.custom_vjp
def conv3x3_same(x, w):
    """Differentiable VMEM-resident SAME 3x3 conv (correlation)."""
    return conv3x3_same_pallas(x, w)


def _fwd(x, w):
    return conv3x3_same_pallas(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dx: correlate g with the spatially-flipped, IO-swapped kernel.
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_same_pallas(g, w_t.astype(g.dtype))
    # dw[dy,dx,c,o] = sum_{n,y,x} xpad[n, y+dy, x+dx, c] * g[n, y, x, o].
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, width = x.shape[1], x.shape[2]
    taps = []
    for dy in range(3):
        row = []
        for dxx in range(3):
            win = xp[:, dy:dy + h, dxx:dxx + width, :]
            row.append(jnp.einsum("nhwc,nhwo->co",
                                  win.astype(jnp.float32),
                                  g.astype(jnp.float32)))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv3x3_same.defvjp(_fwd, _bwd)


def _pack_kernel(w, pack):
    """Build the block-structured packed-space kernel.

    Packing `pack` consecutive W-pixels x C channels into one lane group
    turns a pixel-space 3x3 conv into a packed-space 3x3 conv over groups:
    K'[dy, gx, u*C+ci, j*C+co] = K[dy, dx, ci, co] with
    dx = pack*(gx-1) + u - j + 1 when 0 <= dx < 3 (else zero)."""
    kh, kw, c, o = w.shape
    kp = jnp.zeros((kh, 3, pack * c, pack * o), w.dtype)
    for gx in range(3):
        for u in range(pack):
            for j in range(pack):
                dx = pack * (gx - 1) + u - j + 1
                if 0 <= dx < kw:
                    kp = kp.at[:, gx, u * c:(u + 1) * c,
                               j * o:(j + 1) * o].set(w[:, dx])
    return kp


def conv3x3_same_packed(x, w, pack=None):
    """Lane-packed variant of conv3x3_same_pallas: reinterpret [H, W, C] as
    [H, W/pack, pack*C] (a free reshape in NHWC layout) so low-channel
    convs run on full 128-lane MXU tiles. Exact — zero taps for the
    out-of-window block entries."""
    n, h, width, c = x.shape
    o = w.shape[-1]
    if pack is None:
        pack = max(1, 128 // max(c, o))
    while pack > 1 and width % pack:
        pack //= 2
    if pack == 1:
        return conv3x3_same_pallas(x, w)
    xp = x.reshape(n, h, width // pack, pack * c)
    kp = _pack_kernel(w, pack)
    # Route through the custom-vjp wrapper: its backward reuses the kernel
    # for dx and an einsum for d(kp); d(kp)->dw flows through _pack_kernel's
    # scatter automatically.
    y = conv3x3_same(xp, kp)
    return y.reshape(n, h, width, o)


def _conv3x3_epilogue_pallas(x, k, noise, bias, gain, alpha):
    """Packed-space fused conv+noise+bias+lrelu. x/noise packed NHWC;
    k packed [3,3,PC,PO]; bias [PO]."""
    n, h, width, c = x.shape
    o = k.shape[-1]
    wpad = -(-(width + 2) // 8) * 8
    cpad = -(-c // 128) * 128
    tile_h = _pick_tile_h(h, cpad, o, width)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - width - 1), (0, cpad - c)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))

    return pl.pallas_call(
        functools.partial(_conv3x3_epilogue_kernel, tile_h=tile_h,
                          width=width, gain=float(gain), alpha=float(alpha)),
        out_shape=jax.ShapeDtypeStruct((n, h, width, o), x.dtype),
        grid=(n, h // tile_h),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, cpad, o), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, width, o), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, width, o),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wpad, cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, k.astype(x.dtype), noise, bias[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_conv3x3_epilogue(x, k, noise, bias, gain, alpha, pack):
    """y = leaky_relu(conv3x3(x, k) + noise + bias, alpha) * gain, with x
    lane-packed by `pack` W-pixels. All in one VMEM-resident pallas pass.

    x: [N,H,W,C]; k: pixel-space [3,3,C,O]; noise: [N,H,W,1] (pre-scaled);
    bias: [O]. Returns [N,H,W,O]."""
    return _fused_fwd_impl(x, k, noise, bias, gain, alpha, pack)


def _fused_fwd_impl(x, k, noise, bias, gain, alpha, pack):
    n, h, width, c = x.shape
    o = k.shape[-1]
    xp = x.reshape(n, h, width // pack, pack * c)
    kp = _pack_kernel(k, pack)
    noise_p = jnp.broadcast_to(noise, (n, h, width, o)).reshape(
        n, h, width // pack, pack * o).astype(x.dtype)
    bias_p = jnp.tile(bias.astype(x.dtype), pack)
    y = _conv3x3_epilogue_pallas(xp, kp, noise_p, bias_p, gain, alpha)
    return y.reshape(n, h, width, o)


def _fused_fwd(x, k, noise, bias, gain, alpha, pack):
    y = _fused_fwd_impl(x, k, noise, bias, gain, alpha, pack)
    return y, (x, k, y)


def _fused_bwd(gain, alpha, pack, res, g):
    x, k, y = res
    # leaky_relu preserves sign, so the pre-activation mask == sign(y).
    g_pre = (g.astype(jnp.float32) * gain *
             jnp.where(y >= 0, 1.0, alpha)).astype(g.dtype)
    # dx: packed conv with spatially-flipped, IO-transposed kernel.
    k_t = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_same_packed(g_pre, k_t.astype(g_pre.dtype))
    # dk via shifted einsums (same as conv3x3_same's bwd).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, width = x.shape[1], x.shape[2]
    taps = []
    for dy in range(3):
        row = []
        for dxx in range(3):
            win = xp[:, dy:dy + h, dxx:dxx + width, :]
            row.append(jnp.einsum("nhwc,nhwo->co",
                                  win.astype(jnp.float32),
                                  g_pre.astype(jnp.float32)))
        taps.append(jnp.stack(row))
    dk = jnp.stack(taps).astype(k.dtype)
    dnoise = jnp.sum(g_pre.astype(jnp.float32), axis=-1,
                     keepdims=True).astype(g.dtype)
    dbias = jnp.sum(g_pre.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx.astype(x.dtype), dk, dnoise, dbias


fused_conv3x3_epilogue.defvjp(_fused_fwd, _fused_bwd)


def fused_synth_conv_eligible(x_shape, co, groups) -> bool:
    """SynthesisLayer gate for the fused conv+noise+bias+lrelu pallas path.

    Opt-in (MGT_FUSED_SYNTH=1): correct end to end, but currently net
    slower in the full model (fwd 21.3 vs 14.9 ms) — the channel-broadcast
    noise tensor materializes a full-image input per fused layer and the
    dk einsum backward is unoptimized. Round-2: in-kernel noise broadcast
    + pallas dk kernel."""
    import jax

    import os
    if os.environ.get("MGT_FUSED_SYNTH", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if groups != 1:
        return False
    n, h, w, c = x_shape
    return (h == w and h >= 512 and c <= 64 and co <= 64
            and w % max(1, 128 // max(c, co)) == 0)


def pallas_conv_eligible(x_shape, w_shape, groups) -> bool:
    """conv2d_resample gate: plain SAME 3x3, stride 1, no groups, big
    spatial + low channels — where the packed kernel measures ~1.4-2.2x
    over XLA's conv (see module docstring). TPU-only (the CPU path would
    run interpreted)."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    if groups != 1:
        return False
    kh, kw, ci, co = w_shape
    if (kh, kw) != (3, 3):
        return False
    n, h, w, c = x_shape
    return h == w and h >= 512 and c <= 64 and co <= 64 and w % 2 == 0
