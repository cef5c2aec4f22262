"""Pallas TPU kernel: VMEM-resident SAME 3x3 convolution (NHWC).

Why: on this hardware XLA's conv lowering for the synthesis network's
high-resolution low-channel layers (32-64 ch at 512^2-1024^2, batch 1)
re-reads the input from HBM per tap — measured ~2.3 ms for a 3x3/32ch/1024^2
conv whose HBM roofline is ~0.2 ms. This kernel keeps the input in HBM,
DMAs each row tile (plus 1-row halo) into VMEM once, accumulates the 9 taps
as MXU matmuls from VMEM, and writes the tile once.

STATUS: correct (golden-tested fwd + custom-vjp grads; runs compiled on
TPU) but NOT yet faster at the 32-channel target — Mosaic requires the
manual-DMA lane extent 128-aligned, and materializing the channel pad
costs 4x HBM traffic, erasing the single-read win (measured: 3.9 ms vs
XLA 2.5 ms at C=32/1024^2; 1.2x faster at C=128/256^2). The win requires
lane-packing 4 W-pixels x 32 ch into the 128-lane dim (tap shifts become
lane rotates) plus double-buffered DMA — planned; until then
conv2d_resample does not call this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_hbm, w_ref, o_ref, x_vmem, sem, *, tile_h, width):
    """Grid: (batch, row_tiles). x_hbm: padded input [N, H+2, W+2, C] in HBM;
    w_ref: [3,3,C,O] in VMEM; o_ref: VMEM out block [1, tile_h, W, O];
    x_vmem: scratch [tile_h+2, W+2, C]."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = x_vmem.shape[-1]
    o = o_ref.shape[-1]

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_h, tile_h + 2)], x_vmem, sem)
    dma.start()
    dma.wait()

    x = x_vmem[...]                                # [tile_h+2, W+2, C]
    acc = jnp.zeros((tile_h * width, o), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = x[dy:dy + tile_h, dx:dx + width, :].reshape(
                tile_h * width, c)
            acc = acc + jnp.dot(win, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(tile_h, width, o).astype(o_ref.dtype)


def _pick_tile_h(h, c, o, w):
    budget = 7 * 1024 * 1024  # leave headroom for double-buffered out blocks
    for tile in (128, 64, 32, 16, 8, 4, 2, 1):
        if h % tile:
            continue
        in_bytes = (tile + 2) * (w + 8) * c * 2
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
            pltpu.VMEM((tile_h + 2, wpad, c), x.dtype),
            pltpu.SemaphoreType.DMA,
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


def pallas_conv_eligible(x_shape, w_shape, up, down, padding, groups) -> bool:
    """conv2d_resample gate: plain SAME 3x3, stride 1, no groups, and big
    enough that HBM re-reads dominate (the kernel's win case)."""
    if up != 1 or down != 1 or groups != 1:
        return False
    kh, kw = w_shape[0], w_shape[1]
    if (kh, kw) != (3, 3):
        return False
    n, h, w, c = x_shape
    return h == w and h >= 256 and h % 2 == 0 and c <= 128
