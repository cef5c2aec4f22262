"""Pallas TPU kernel: VMEM-resident SAME 3x3 convolution (NHWC).

Why: on this hardware XLA's conv lowering for the synthesis network's
high-resolution low-channel layers (32-64 ch at 512^2-1024^2, batch 1)
re-reads the input from HBM per tap — measured ~2.3 ms for a 3x3/32ch/1024^2
conv whose HBM roofline is ~0.2 ms. This kernel keeps the input in HBM,
DMAs each row tile (plus 1-row halo) into VMEM once, accumulates the 9 taps
as MXU matmuls from VMEM, and writes the tile once.

STATUS (round 3): the production path is the LANE-PACKED high-resolution
pipeline — every >=512^2 synthesis op (skip 1x1-up, conv0 2x-up, conv1,
conv_last, torgb) runs on [N, H, G, 128] lane-packed tensors
(G = W*C/128 pixel groups, resolution-invariant for this architecture):

  * fused_modconv3x3_lrelu — same-res modulated conv + demod + noise +
    bias + lrelu + optional resnet-skip residual, one VMEM-resident pass,
    in-kernel halo (no jnp.pad);
  * fused_packed_upconv2 — 2x-up modulated conv with the FIR composed in,
    parity-blocked packed kernels with static zero-block skip masks; its
    backward dx is the exact adjoint as a packed 6-row-window down-conv
    kernel (same masks);
  * both with symbolic-zeros custom VJPs that skip weight/noise/bias
    cotangents when only the latent is differentiated (projection). The
    backward launches are themselves fused: the adjoint kernel's
    per-channel scale slot carries the style (emitting dx = du*s
    directly) and an in-kernel dot tap reduces the ds = sum x*du partials
    from the f32 accumulator — no separate scale or reduction pass over
    output-resolution tensors, and no bf16 round-trip of du.

Why packed everywhere: profiling showed XLA assigns narrow-lane conv
layouts (T(2,128)) to high-res NHWC C=32/64 tensors and pays a 64 MB
relayout copy at every transition (~4 ms/block even without pallas), and
an isolated pallas call makes its XLA neighbors WORSE (skip upfirdn
0.6 -> 3.0 ms). With the whole chain packed no narrow-lane tensor exists:
the flagship 1024^2 projection step went 35.2 -> 18.7 ms/step
(bench vs_baseline 0.85 -> 1.60 against the <30 s/1000-step target).
Live gates (each guards a working A/B or profiling mode; settled
experiments were pruned in round 4 — ROADMAP.md keeps their records):
  MGT_PACKED_SYNTH=0   disable the packed pipeline (default ON on TPU,
                       models/synthesis.py::packed_block_eligible)
  MGT_PACKED_B256=0    exclude the 256-channel block from the packed
                       chain (tools/profile_b256_ab.py A/B)
  MGT_PACKED_D=0       unpacked discriminator tower (tools/profile_train
                       A/B; the unpacked side OOMs at 1024^2 batch 4)
  MGT_SKIP_DW / MGT_SKIP_DD  dev-profiling: compile out the weight-grad /
                       demod-chain taps to price them (gradients WRONG;
                       tools/profile_dw.py, tools/profile_dd.py only)
  MGT_PACKED_SECOND_ORDER    route PL/R1 through the second-order packed
                       wrappers (ops/second_order.py A/B)
"""

from __future__ import annotations

import functools
import os

from morphganformer_tpu.ops.conv2d_resample import _compose_kernel_fir

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_select(ref, b):
    """ref[b] for a small [N, L] VMEM vector table with a TRACED row index:
    Mosaic cannot lower a dynamic sublane load, so select via mask+sum
    (single nonzero row, so the sum is exact in any dtype)."""
    table = ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, table.shape, 0)
    return jnp.sum(jnp.where(rows == b, table, jnp.zeros_like(table)), axis=0)


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


def _modconv_epilogue_kernel(x_hbm, w_ref, s_ref, d_ref, *rest,
                             tile_h, wg, gain, alpha, use_noise, use_bias,
                             use_resid=False, use_dot=False, use_dd=False,
                             use_dd_noise=False, dd_gain=1.0, dd_alpha=1.0,
                             use_dw=False):
    """Fused modulated-conv synthesis tail, packed space:

        y = lrelu(d * conv3x3(x * s, w) + noise + bias) * gain [+ resid]

    The optional residual is the resnet-block skip branch added in-kernel
    (after the activation/gain, exactly where SynthesisBlock's explicit
    `y_skip + x` add sat) — saving one full read+write pass over the
    output-resolution tensor per block.

    use_dot serves the custom-VJP backward: an extra input tile z (same
    block shape as the output) and a second per-tile output
    dot[b, i] = sum_pixels z * acc — the PRE-d-scale conv result. With the
    d slot carrying the style vector this turns one kernel launch into
    BOTH dx = conv(g*d, w^T) * s and the per-channel partials of
    ds = sum x * conv(g*d, w^T), eliminating the separate dx-scale pass
    and the x*du reduction pass over two output-res tensors.

    Double-buffered row-DMA pipeline over the UNPADDED packed input
    [N, H, Wg, PC] — the SAME-conv halo is assembled in VMEM (zero border
    columns once per slot, zero top/bottom rows at the image edges, three
    row-range DMAs) instead of a jnp.pad, which on the model's hot path
    costs a full-image HBM copy + relayout per layer per step. Style scale
    (s, per input channel) and demodulation (d, per output channel) are
    applied in VMEM, so XLA's lost-fusion penalty around a bare conv call
    disappears. noise (when present) is a pipelined packed block
    [tile_h, wg, PO]; s/d/bias are per-batch vectors."""
    if use_noise:
        noise_ref, rest = rest[0], rest[1:]
    if use_bias:
        bias_ref, rest = rest[0], rest[1:]
    if use_resid:
        resid_ref, rest = rest[0], rest[1:]
    if use_dot:
        dot_in_ref, rest = rest[0], rest[1:]
    if use_dd:
        dd_y_ref, rest = rest[0], rest[1:]
        if use_dd_noise:
            dd_nz_ref, rest = rest[0], rest[1:]
    rest = list(rest)
    o_ref = rest.pop(0)
    dot_ref = rest.pop(0) if use_dot else None
    dd1_ref = rest.pop(0) if use_dd else None
    dd2_ref = rest.pop(0) if use_dd else None
    dw_ref = rest.pop(0) if use_dw else None
    x_vmem, sems = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    pc = x_vmem.shape[-1]
    po = o_ref.shape[-1]
    h = x_hbm.shape[1]
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    # Scratch row r holds image row i*tile_h + r - 1; real columns live at
    # [8, wg+8) — the DMA destination offset must be sublane-aligned (8), so
    # the W halo columns are 7 and wg+8 and the conv windows start at 7+dx.
    # 3 sems per slot: body / top halo row / bottom halo row.
    def dmas(s, tile_idx):
        row0 = tile_idx * tile_h
        ops = [pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0, tile_h)],
            x_vmem.at[s, pl.ds(1, tile_h), pl.ds(8, wg)], sems.at[s, 0])]
        if n_i > 1:
            # Guarded halo rows (the guards must match between start/wait).
            top = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.maximum(row0 - 1, 0), 1)],
                x_vmem.at[s, pl.ds(0, 1), pl.ds(8, wg)], sems.at[s, 1])
            bot = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.minimum(row0 + tile_h, h - 1), 1)],
                x_vmem.at[s, pl.ds(tile_h + 1, 1), pl.ds(8, wg)],
                sems.at[s, 2])
            ops += [top, bot]
        return ops

    @pl.when(i == 0)
    def _():
        # Zero the never-DMA'd border columns of both slots once, and the
        # top/bottom halo rows of the edge tiles (single-tile grids keep
        # halo rows zero and skip halo DMAs entirely).
        x_vmem[:, :, :8] = jnp.zeros_like(x_vmem[:, :, :8])
        x_vmem[:, :, wg + 8:] = jnp.zeros_like(x_vmem[:, :, wg + 8:])
        if n_i == 1:
            x_vmem[:, 0] = jnp.zeros_like(x_vmem[:, 0])
            x_vmem[:, tile_h + 1] = jnp.zeros_like(x_vmem[:, tile_h + 1])
        for op in dmas(slot, i):
            op.start()

    @pl.when(i + 1 < n_i)
    def _():
        for op in dmas(nxt, i + 1):
            op.start()

    for op in dmas(slot, i):
        op.wait()

    if n_i > 1:
        # Edge tiles: overwrite the (cheap, already-landed) clamped halo
        # row with zeros. VPU store, [wgp, pc] — negligible.
        @pl.when(i == 0)
        def _():
            x_vmem[slot, 0] = jnp.zeros_like(x_vmem[slot, 0])

        @pl.when(i == n_i - 1)
        def _():
            x_vmem[slot, tile_h + 1] = jnp.zeros_like(
                x_vmem[slot, tile_h + 1])

    if use_dd:
        # Demod-chain dd taps (custom-VJP backward): the input tile IS gd
        # (the adjoint launch passes s = ones), already streamed to VMEM
        # for the conv — reduce it here against the forward output y
        # (y/mask recovers the pre-activation; mask from sign(y) and the
        # FORWARD's dd_gain/dd_alpha) and the packed noise. The caller
        # combines: dd*d^2 = dd1 - bias*dd2, folded over the pack.
        gd_t = x_vmem[slot, 1:tile_h + 1, 8:8 + wg, :].reshape(
            tile_h * wg, pc).astype(jnp.float32)
        yv = dd_y_ref[...].reshape(tile_h * wg, pc).astype(jnp.float32)
        t = yv * jnp.where(yv >= 0, 1.0 / dd_gain,
                           1.0 / (dd_gain * dd_alpha))
        if use_dd_noise:
            t = t - dd_nz_ref[...].reshape(tile_h * wg, pc).astype(
                jnp.float32)
        tap1 = jnp.sum(gd_t * t, axis=0)
        tap2 = jnp.sum(gd_t, axis=0)
        ddrows = jax.lax.broadcasted_iota(jnp.int32, (8, pc), 0)
        dd1_ref[0] = jnp.where(ddrows == 0, tap1[None, :], 0.0)
        dd2_ref[0] = jnp.where(ddrows == 0, tap2[None, :], 0.0)

    xs = x_vmem[slot] * _row_select(s_ref, b)[None, None, :]
    acc = jnp.zeros((tile_h * wg, po), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = xs[dy:dy + tile_h, 7 + dx:7 + dx + wg, :].reshape(
                tile_h * wg, pc)
            acc = acc + jnp.dot(win, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    if use_dw:
        # Packed-kernel WEIGHT gradient, riding the adjoint launch
        # (training path): with this launch's input x_vmem = gd (haloed,
        # SAME-pad) and dot_in = the x tile, the packed-space weight
        # cotangent is dKp[dy_f, gx_f] = sum_tiles u^T @ win(2-dy_f, 2-gx_f)
        # where u = x*s (the style rides the d slot here, per _modconv_bwd)
        # — the windows are the very slices the dx conv above already
        # takes, so dw costs 9 extra MXU dots and ZERO extra HBM traffic
        # (vs ~full-image f32 tap-einsums in XLA; tools/profile_dw.py
        # priced those at 13.9 ms/step at 1024^2). The output block is
        # grid-invariant: it stays VMEM-resident and accumulates across
        # all (batch, row-tile) steps. Caller folds dKp back to the pixel
        # kernel via _unpack_kernel_grad.
        z = dot_in_ref[0].reshape(tile_h * wg, po)
        u_t = (z.astype(jnp.float32)
               * _row_select(d_ref, b)[None, :]).astype(xs.dtype)

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        for dy in range(3):
            for dx in range(3):
                win = x_vmem[slot][dy:dy + tile_h,
                                   7 + dx:7 + dx + wg, :].reshape(
                    tile_h * wg, pc)
                tap = jax.lax.dot_general(
                    u_t, win, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dw_ref[2 - dy, 2 - dx] += tap
    if use_dot:
        z = dot_in_ref[0].reshape(tile_h * wg, po).astype(jnp.float32)
        partial = jnp.sum(z * acc, axis=0)
        # Mosaic needs >= 8 sublanes per output block: write the partial
        # into row 0 of an 8-row block (rows 1-7 zero; the caller sums).
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, po), 0)
        dot_ref[0] = jnp.where(rows == 0, partial[None, :], 0.0)
    acc = acc * _row_select(d_ref, b)[None, :]
    y = acc.reshape(tile_h, wg, po)
    if use_noise:
        nz = noise_ref[...]
        y = y + nz.reshape(tile_h, wg, po).astype(jnp.float32)
    if use_bias:
        y = y + bias_ref[0][None, None, :]
    if alpha != 1.0:
        y = jnp.where(y >= 0, y, y * alpha)
    if gain != 1.0:
        y = y * gain
    if use_resid:
        y = y + resid_ref[0].astype(jnp.float32)
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
            pl.BlockSpec(memory_space=pl.ANY),          # stays in HBM
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


def _unpack_kernel_grad(dkp, pack, c, o, kw=3):
    """Exact transpose of _pack_kernel's scatter: fold a packed-space
    kernel cotangent dKp [KH, 3, pack*c, pack*o] back onto the pixel
    kernel [KH, kw, c, o]. Entries of dKp at invalid taps (the blocks
    _pack_kernel left zero) are simply never read."""
    kh = dkp.shape[0]
    dw = jnp.zeros((kh, kw, c, o), dkp.dtype)
    for gx in range(3):
        for u in range(pack):
            for j in range(pack):
                dx = pack * (gx - 1) + u - j + 1
                if 0 <= dx < kw:
                    dw = dw.at[:, dx].add(
                        dkp[:, gx, u * c:(u + 1) * c, j * o:(j + 1) * o])
    return dw


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


def _vmem_budget_bytes():
    """Trace-time VMEM budget for the row-tile pickers. Default 10 MB —
    the round-2 conservative figure, now known to leave streaming on the
    table at 1024^2 (tile_h=8 -> 512 tile steps/launch; v5e VMEM is
    128 MB). MGT_VMEM_BUDGET_MB overrides for the round-5 tile-height
    A/B (tools/profile_tile_budget.py); the winning value is baked in
    below once measured."""
    return int(os.environ.get("MGT_VMEM_BUDGET_MB", "10")) * 1024 * 1024


def _mosaic_params():
    """Mosaic compiler params for the packed launches: raise the scoped
    VMEM limit alongside the tile-picker budget (the default Mosaic cap
    rejects tiles above ~10 MB of scratch+blocks; the round-5 sweep
    needs headroom to even compile taller tiles). None when the budget
    is at its default, keeping the shipped program byte-identical."""
    budget = _vmem_budget_bytes()
    if budget <= 10 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(int(budget * 2.2), 120 * 1024 * 1024))


def _pick_tile_h_mod(h, pc, po, wg, use_noise, esize=2, extra_blocks=0,
                     fixed_extra=0):
    """VMEM-budgeted row-tile height for the fused modconv kernel.
    esize: bytes per element of the compute dtype (2 bf16 / 4 f32).
    extra_blocks: additional pipelined output-sized input blocks (the
    backward dd-tap inputs y / packed noise). fixed_extra: tile-height-
    independent VMEM bytes (the grid-resident dw accumulator)."""
    budget = _vmem_budget_bytes() - fixed_extra
    wgp = 8 + (-(-(wg + 1) // 8) * 8)
    for tile in (128, 64, 32, 16, 8, 4, 2, 1):
        if h % tile:
            continue
        in_bytes = 2 * (tile + 2) * wgp * pc * esize      # double-buffered x
        xs_bytes = (tile + 2) * wgp * pc * esize          # style-scaled temp
        out_bytes = 2 * tile * wg * max(po, 128) * esize  # pipelined out
        noise_bytes = (2 * tile * wg * max(po, 128) * esize
                       if use_noise else 0)
        extra_bytes = extra_blocks * 2 * tile * wg * max(pc, 128) * esize
        acc_bytes = tile * wg * max(po, 128) * 4
        if (in_bytes + xs_bytes + out_bytes + noise_bytes + extra_bytes
                + acc_bytes <= budget):
            return tile
    return 1


def _modconv_pallas(xp, kp, s_p, d_p, noise_p, bias_p, gain, alpha,
                    resid_p=None, dot_with=None, dd_with=None,
                    dd_noise=None, dd_gain=1.0, dd_alpha=1.0,
                    dw_taps=False):
    """Run the packed fused modconv kernel. xp: packed [N,H,Wg,PC]
    (unpadded); kp: packed [3,3,PC,PO]; s_p [N,PC] (x dtype); d_p [N,PO]
    f32; noise_p [H,Wg,PO] or None; bias_p [PO] f32 or None; resid_p
    [N,H,Wg,PO] or None (resnet skip branch, added in-kernel); dot_with
    [N,H,Wg,PO] or None — when given, also returns per-tile partials
    dots[n, i, PO] of sum_pixels(dot_with * pre-d conv result) (backward
    ds fusion; see the kernel docstring).

    dd_with (the forward OUTPUT y, [N,H,Wg,PC] — PC lanes: in the
    adjoint launch the kernel input xp is gd at the forward's output
    resolution) enables the demod-chain dd taps: two extra per-tile
    outputs dd1[n,i,PC] = sum_pixels(xp * (y/mask - nz)) and
    dd2[n,i,PC] = sum_pixels(xp), with mask recomputed in-kernel from
    sign(y) and the FORWARD's activation constants dd_gain/dd_alpha
    (the adjoint launch itself runs gain=alpha=1). dd_noise: the packed
    noise [*,H,Wg,PC] or None. This folds the entire XLA-side dd
    reduction pass (2.5 ms/step at 1024^2, tools/profile_dd.py) into
    the tiles the adjoint already streams.

    dw_taps (requires dot_with; adjoint launch only, where the d slot
    carries the style) adds a grid-resident f32 output
    dKp[3, 3, PO, PC] — the packed-space weight cotangent accumulated
    across every (batch, tile) step from the windows the dx conv
    already slices (see the kernel's use_dw block)."""
    n, h, wg, pc = xp.shape
    po = kp.shape[-1]
    use_noise = noise_p is not None
    use_bias = bias_p is not None
    use_resid = resid_p is not None
    use_dot = dot_with is not None
    use_dd = dd_with is not None
    assert not dw_taps or use_dot, "dw_taps needs the dot_with x tile"
    wgp = 8 + (-(-(wg + 1) // 8) * 8)   # data at [8, wg+8) + right border
    tile_h = _pick_tile_h_mod(h, pc, po, wg,
                              use_noise or use_resid or use_dot,
                              esize=xp.dtype.itemsize,
                              extra_blocks=((1 if use_dd else 0)
                                            + (1 if dd_noise is not None
                                               else 0)),
                              fixed_extra=(2 * 9 * po * pc * 4
                                           if dw_taps else 0))

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),              # x stays in HBM
        pl.BlockSpec((3, 3, pc, po), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # styles [N, PC]
        pl.BlockSpec(memory_space=pltpu.VMEM),   # demod  [N, PO]
    ]
    args = [xp, kp, s_p, d_p]
    if use_noise:
        if noise_p.ndim == 4:      # per-sample noise [N, H, wg, PO]
            in_specs.append(pl.BlockSpec((1, tile_h, wg, po),
                                         lambda b, i: (b, i, 0, 0),
                                         memory_space=pltpu.VMEM))
        else:                      # batch-shared noise [H, wg, PO]
            in_specs.append(pl.BlockSpec((tile_h, wg, po),
                                         lambda b, i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
        args.append(noise_p)
    if use_bias:
        in_specs.append(pl.BlockSpec((1, po), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_p[None].astype(jnp.float32))
    if use_resid:
        in_specs.append(pl.BlockSpec((1, tile_h, wg, po),
                                     lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(resid_p)
    if use_dot:
        in_specs.append(pl.BlockSpec((1, tile_h, wg, po),
                                     lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dot_with)
    if use_dd:
        in_specs.append(pl.BlockSpec((1, tile_h, wg, pc),
                                     lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dd_with)
        if dd_noise is not None:
            if dd_noise.ndim == 4:           # per-sample noise
                in_specs.append(pl.BlockSpec((1, tile_h, wg, pc),
                                             lambda b, i: (b, i, 0, 0),
                                             memory_space=pltpu.VMEM))
            else:                            # batch-shared noise
                in_specs.append(pl.BlockSpec((tile_h, wg, pc),
                                             lambda b, i: (i, 0, 0),
                                             memory_space=pltpu.VMEM))
            args.append(dd_noise)

    n_i = h // tile_h
    # 8 sublane rows per reduction tile (partial in row 0) — sum over
    # axis 1 recovers the full reduction.
    out_shapes = [jax.ShapeDtypeStruct((n, h, wg, po), xp.dtype)]
    out_specs_l = [pl.BlockSpec((1, tile_h, wg, po),
                                lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)]
    red_spec = pl.BlockSpec((1, 8, po), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    if use_dot:
        out_shapes.append(jax.ShapeDtypeStruct((n, 8 * n_i, po),
                                               jnp.float32))
        out_specs_l.append(red_spec)
    if use_dd:
        dd_spec = pl.BlockSpec((1, 8, pc), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
        out_shapes += [jax.ShapeDtypeStruct((n, 8 * n_i, pc), jnp.float32),
                       jax.ShapeDtypeStruct((n, 8 * n_i, pc), jnp.float32)]
        out_specs_l += [dd_spec, dd_spec]
    if dw_taps:
        # Grid-invariant block: stays VMEM-resident across every step and
        # is written back once at the end of the launch.
        out_shapes.append(jax.ShapeDtypeStruct((3, 3, po, pc), jnp.float32))
        out_specs_l.append(pl.BlockSpec((3, 3, po, pc),
                                        lambda b, i: (0, 0, 0, 0),
                                        memory_space=pltpu.VMEM))

    single = len(out_shapes) == 1
    out = pl.pallas_call(
        functools.partial(_modconv_epilogue_kernel, tile_h=tile_h, wg=wg,
                          gain=float(gain), alpha=float(alpha),
                          use_noise=use_noise, use_bias=use_bias,
                          use_resid=use_resid, use_dot=use_dot,
                          use_dd=use_dd,
                          use_dd_noise=dd_noise is not None,
                          dd_gain=float(dd_gain), dd_alpha=float(dd_alpha),
                          use_dw=dw_taps),
        out_shape=out_shapes[0] if single else tuple(out_shapes),
        grid=(n, n_i),
        interpret=jax.default_backend() == "cpu",  # tests run interpreted
        in_specs=in_specs,
        out_specs=out_specs_l[0] if single else tuple(out_specs_l),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wgp, pc), xp.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),   # per slot: body/top/bottom
        ],
        compiler_params=_mosaic_params(),
    )(*args)
    return out


def _modconv_pack(c, o, width):
    pack = max(1, 128 // max(c, o))
    while pack > 1 and width % pack:
        pack //= 2
    return pack


def _demod_coef(w, styles, demodulate):
    """d[n,o] = rsqrt(sum_i s^2 * wsq + 1e-8) (reference networks.py:291)."""
    n, o = styles.shape[0], w.shape[-1]
    if not demodulate:
        return jnp.ones((n, o), jnp.float32), None
    wsq = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(0, 1))     # [C,O]
    d = jax.lax.rsqrt(jnp.square(styles.astype(jnp.float32)) @ wsq + 1e-8)
    return d, wsq


def _modconv_geometry(x, w, packed_io):
    """(n, h, width, wg, pack, c, o) for pixel or packed input."""
    c, o = w.shape[2], w.shape[3]
    if packed_io:
        assert c == o, "packed_io modconv requires Cin == Cout"
        n, h, wg, lanes = x.shape
        pack = lanes // c
        width = wg * pack
    else:
        n, h, width, _ = x.shape
        pack = _modconv_pack(c, o, width)
        wg = width // pack
    return n, h, width, wg, pack, c, o


def _modconv_fwd_impl(x, w, styles, noise, bias, gain, alpha, demodulate,
                      packed_io=False, resid=None):
    n, h, width, wg, pack, c, o = _modconv_geometry(x, w, packed_io)
    d, _ = _demod_coef(w, styles, demodulate)

    xp = x if packed_io else x.reshape(n, h, wg, pack * c)
    resid_p = None
    if resid is not None:
        resid_p = (resid if packed_io
                   else resid.reshape(n, h, wg, pack * o)).astype(x.dtype)
    kp = _pack_kernel(w.astype(x.dtype), pack)
    s_p = jnp.tile(styles.astype(x.dtype), (1, pack))
    d_p = jnp.tile(d, (1, pack))
    noise_p = None
    if noise is not None:
        if noise.ndim == 3:        # per-sample [N, H, W]
            noise_p = jnp.broadcast_to(
                noise.reshape(n, h, wg, pack, 1), (n, h, wg, pack, o)
            ).reshape(n, h, wg, pack * o).astype(x.dtype)
        else:                      # batch-shared [H, W]
            noise_p = jnp.broadcast_to(
                noise.reshape(h, wg, pack, 1), (h, wg, pack, o)
            ).reshape(h, wg, pack * o).astype(x.dtype)
    bias_p = jnp.tile(bias.astype(jnp.float32), pack) if bias is not None else None
    y = _modconv_pallas(xp, kp, s_p, d_p, noise_p, bias_p, gain, alpha,
                        resid_p=resid_p)
    return (y if packed_io else y.reshape(n, h, width, o)), d


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_modconv3x3_lrelu(x, w, styles, noise, bias, resid, gain, alpha,
                           demodulate=True, packed_io=False):
    """Fused modulated 3x3 SAME conv + demod + noise + bias + leaky_relu:

        y = lrelu(d * conv3x3(x * styles, w) + noise + bias, alpha) * gain
            [+ resid]

    `resid` (or None) is the resnet skip branch, added in-kernel after the
    activation — exactly the block's former explicit `y_skip + x` add, one
    output-res read+write pass cheaper.

    in one VMEM-resident lane-packed pallas pass (style scale, demod, noise
    broadcast and activation all applied in-kernel — no XLA fusion barrier).

    x: [N,H,W,C] NHWC; w: [3,3,C,O] (wscale already applied); styles: [N,C];
    noise: [H,W] pre-scaled by its strength, or None; bias: [O] or None.
    gain/alpha: activation out-gain and leaky slope (alpha=1 -> linear).

    The custom VJP only computes cotangents for inputs that are actually
    differentiated (symbolic_zeros): in latent projection the weight/bias/
    noise are closure constants, so the expensive dw tap-einsums never run —
    the backward is one packed pallas conv (dx) plus fused elementwise
    reductions (dstyles via x*dxs, demod chain via the recovered conv
    output). Replaces the reference's bias_act.cu/upfirdn2d.cu fused tails
    (SURVEY.md §2.1) for the high-resolution synthesis layers.

    With packed_io=True (requires Cin == Cout) x and y stay in the packed
    [N, H, G, 128] representation — used by the packed >=512^2 pipeline to
    chain conv1 -> conv_last without relayouts."""
    y, _ = _modconv_fwd_impl(x, w, styles, noise, bias, gain, alpha,
                             demodulate, packed_io, resid=resid)
    return y


def _skip_dd():
    """Dev-profiling gate (MGT_SKIP_DD=1): drop the demod-chain dd term
    from the packed backwards to price it on-chip. Gradients are WRONG
    with this set — tools/profile_dd.py only. Read at trace time."""
    import os

    return os.environ.get("MGT_SKIP_DD", "0") == "1"


def _skip_dw():
    """Dev-profiling gate (MGT_SKIP_DW=1): return ZERO weight gradients
    from the packed custom VJPs to price the dw computation on-chip
    (training-path XLA weight-grad convs/einsums). Gradients are WRONG
    with this set — tools/profile_dw.py only. Read at trace time."""
    import os

    return os.environ.get("MGT_SKIP_DW", "0") == "1"


def _tok(flag):
    """Encode a trace-time bool in pytree STRUCTURE (() vs None) so the
    backward can branch on it statically (residual leaves become arrays)."""
    return () if flag else None


def _modconv_fwd(x, w, styles, noise, bias, resid, gain, alpha, demodulate,
                 packed_io):
    # symbolic_zeros=True: args are CustomVJPPrimal(value, perturbed).
    noise_v = None if noise is None else noise.value
    bias_v = None if bias is None else bias.value
    resid_v = None if resid is None else resid.value
    flags = (_tok(w.perturbed),
             _tok(noise is not None and noise.perturbed),
             _tok(bias is not None and bias.perturbed),
             _tok(styles.perturbed),
             _tok(x.perturbed),
             _tok(resid is not None and resid.perturbed))
    from morphganformer_tpu.ops.second_order import packed_second_order
    if packed_second_order():
        # Second-order route (MGT_PACKED_SECOND_ORDER=1): the forward
        # launch goes through a protected apply-op so the OUTER
        # differentiation of a grad-of-grad stage (PL/R1) can linearize
        # it; y/d residuals are recomputed inside the routed backward.
        from morphganformer_tpu.ops import second_order as so
        y = so.modconv_apply_so(x.value, w.value, styles.value, noise_v,
                                bias_v, resid_v, gain, alpha, demodulate,
                                packed_io)
        # Save y: the routed backward serves the mask/demod recovery and
        # the second-order z-recovery from it instead of recomputing the
        # forward launch (round-5 saved-residual design).
        return y, (x.value, w.value, styles.value, noise_v, bias_v, resid_v,
                   y, None, flags)
    y, d = _modconv_fwd_impl(x.value, w.value, styles.value, noise_v, bias_v,
                             gain, alpha, demodulate, packed_io,
                             resid=resid_v)
    res = (x.value, w.value, styles.value, noise_v, bias_v, resid_v, y, d,
           flags)
    return y, res


def _modconv_bwd(gain, alpha, demodulate, packed_io, res, g):
    from morphganformer_tpu.ops.second_order import packed_second_order
    if packed_second_order():
        from morphganformer_tpu.ops import second_order as so
        x, w, styles, noise, bias, resid, y, _d, flags = res
        flags_b = tuple(f is not None for f in flags)
        return so.modconv_bwd_so(x, w, styles, noise, bias, resid, y, g,
                                 gain, alpha, demodulate, packed_io,
                                 flags_b)
    return _modconv_bwd_impl(gain, alpha, demodulate, packed_io, res, g)


def _modconv_bwd_impl(gain, alpha, demodulate, packed_io, res, g):
    x, w, styles, noise, bias, resid, y, d, flags = res
    w_p, noise_p, bias_p, styles_p, x_p, resid_p = [
        f is not None for f in flags]
    n, h, width, wg, pack, c, o = _modconv_geometry(x, w, packed_io)
    f32 = jnp.float32

    # The residual is added in-kernel AFTER the activation+gain, so its
    # cotangent is g itself, and the saved y must be peeled back to the
    # activation output before it can drive the lrelu mask / demod-chain
    # recovery below. The subtract stays in y.dtype and fuses into the
    # mask's producer chain.
    dresid = None
    if resid is not None:
        dresid = g.astype(resid.dtype) if resid_p else jnp.zeros_like(resid)
        y = y - resid.astype(y.dtype)

    def grouped(t, ch):
        """View a tensor (pixel or packed) as [N, H, Wg, pack, ch]."""
        return t.reshape(n, h, wg, pack, ch)

    def lane_reduce(t, ch):
        """sum over all pixels -> [N, ch]: reduce the big spatial axes
        FIRST keeping the 128 lanes intact (fast on TPU), then fold the
        pack replicas — a [N, lanes] op. A direct lane-splitting
        sum(reshape(..., pack, ch)) profiles 15x slower at 1024^2."""
        part = jnp.sum(t.reshape(n, h * wg, pack * ch), axis=1)
        return jnp.sum(part.reshape(n, pack, ch), axis=1)

    # d(lrelu*gain): the pre-activation sign == sign(y). Stay in g.dtype
    # (bf16 on the hot path): an f32 g_pre is a 128 MB materialization at
    # 1024^2 once it has two consumers; the reductions below accumulate in
    # f32 regardless.
    mask = jnp.where(y >= 0, jnp.asarray(gain, g.dtype),
                     jnp.asarray(gain * alpha, g.dtype))
    g_pre = g * mask
    d_bcast = (jnp.tile(d, (1, pack))[:, None, None, :] if packed_io
               else d[:, None, None, :])
    gd = g_pre * d_bcast.astype(g.dtype)

    # dx/dstyles both come from the conv transpose w.r.t. u = x*styles:
    #   du = conv3x3(g*d, flip(w)^T);  dx = du*s;  ds[c] = sum_hw x*du.
    # One pallas launch produces BOTH: the kernel's per-output-channel d
    # slot carries s (so it writes dx directly, no separate du*s pass) and
    # its use_dot tap reduces sum_pixels(x * du) per tile from the f32
    # accumulator (no separate x*du pass, and no bf16 du round-trip).
    need_dd = demodulate and (styles_p or w_p) and not _skip_dd()
    want_dw = w_p and not _skip_dw()
    dx = ds = dd1 = dd2 = dkp = None
    if x_p or styles_p:
        w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        kp_t = _pack_kernel(w_t.astype(gd.dtype), pack)
        ones_s = jnp.ones((n, pack * o), gd.dtype)
        s_out = jnp.tile(styles.astype(f32), (1, pack))
        gd_pk = gd if packed_io else gd.reshape(n, h, wg, pack * o)
        dd_kw = {}
        if need_dd:
            # Ride the demod-chain dd reduction on the adjoint launch's
            # tiles (in-kernel taps; see _modconv_pallas) instead of a
            # separate XLA pass over (g, y, noise).
            y_pk = (y if packed_io
                    else y.reshape(n, h, wg, pack * o)).astype(gd.dtype)
            nzp = None
            if noise is not None:
                # Same packed broadcast (and dtype) the forward applied.
                if noise.ndim == 3:
                    nzp = jnp.broadcast_to(
                        noise.reshape(n, h, wg, pack, 1),
                        (n, h, wg, pack, o)).reshape(
                            n, h, wg, pack * o).astype(gd.dtype)
                else:
                    nzp = jnp.broadcast_to(
                        noise.reshape(h, wg, pack, 1),
                        (h, wg, pack, o)).reshape(
                            h, wg, pack * o).astype(gd.dtype)
            dd_kw = dict(dd_with=y_pk, dd_noise=nzp,
                         dd_gain=gain, dd_alpha=alpha)
        # The x tile streams in whenever ds needs its dot tap OR dw its
        # in-kernel taps (training differentiates both, so one block
        # serves both reductions).
        use_dot = styles_p or want_dw
        x_pk = (x if packed_io
                else x.reshape(n, h, wg, pack * c)) if use_dot else None
        outs = _modconv_pallas(gd_pk, kp_t, ones_s, s_out, None, None,
                               1.0, 1.0, dot_with=x_pk,
                               dw_taps=want_dw, **dd_kw)
        outs = list(outs) if isinstance(outs, (tuple, list)) else [outs]
        dx_pk = outs.pop(0)
        if use_dot:
            dots = outs.pop(0)
            if styles_p:
                ds = jnp.sum(jnp.sum(dots, axis=1).reshape(n, pack, c),
                             axis=1)
        if need_dd:
            dd1, dd2 = outs.pop(0), outs.pop(0)
        if want_dw:
            dkp = outs.pop(0)
        if x_p:
            dx = (dx_pk if packed_io
                  else dx_pk.reshape(n, h, width, c)).astype(x.dtype)

    # Demodulation chain: d = rsqrt(e), e = s^2 @ wsq. Needs
    # dd[n,o] = sum_hw g_pre * conv_out with conv_out = (act_inv(y)-nz-b)/d.
    # mask * act_inv(y) == y EXACTLY on both lrelu branches (the gain/alpha
    # factors cancel), so g_pre*act_inv(y) == g*y and
    #   dd = (sum g*y - sum g_pre*nz - b * sum g_pre) / d
    # — no conv_out recovery chain, no full-tensor division, no 1/alpha.
    # Fast path: the adjoint launch's in-kernel dd taps already reduced
    #   dd1 = sum gd*(y/mask - nz),  dd2 = sum gd     (gd = g_pre*d)
    # so dd*d^2 = dd1 - b*dd2, and de = -0.5*dd*d^3 = -0.5*(dd1-b*dd2)*d.
    # The former separate XLA reductions cost 2.5 ms/step at 1024^2
    # (tools/profile_dd.py).
    dwsq = None
    if dd1 is not None:
        t1 = jnp.sum(jnp.sum(dd1, axis=1).reshape(n, pack, o), axis=1)
        t2 = jnp.sum(jnp.sum(dd2, axis=1).reshape(n, pack, o), axis=1)
        raw = t1 - bias.astype(f32)[None] * t2 if bias is not None else t1
        de = -0.5 * raw * d
        wsq = jnp.sum(jnp.square(w.astype(f32)), axis=(0, 1))  # [C,O]
        if styles_p:
            ds = ds + 2.0 * styles.astype(f32) * (de @ wsq.T)
        if w_p:
            dwsq = jnp.square(styles.astype(f32)).T @ de       # [C,O]
    elif need_dd:
        # Adjoint kernel not launched (w differentiated with frozen
        # x/styles) — XLA reduction fallback.
        dd = lane_reduce(g.astype(f32) * y.astype(f32), o)     # [N,O]
        if noise is not None:
            gp5 = grouped(g_pre.astype(f32), o)
            nz = noise.astype(f32)
            if nz.ndim == 3:
                dd = dd - jnp.einsum("nhgpo,nhgp->no", gp5,
                                     nz.reshape(n, h, wg, pack))
            else:
                dd = dd - jnp.einsum("nhgpo,hgp->no", gp5,
                                     nz.reshape(h, wg, pack))
        if bias is not None:
            dd = dd - bias.astype(f32)[None] * lane_reduce(
                g_pre.astype(f32), o)
        dd = dd / d
        wsq = jnp.sum(jnp.square(w.astype(f32)), axis=(0, 1))  # [C,O]
        e = jnp.square(styles.astype(f32)) @ wsq
        de = dd * (-0.5) * jax.lax.rsqrt(e + 1e-8) / (e + 1e-8)  # d^3 = rsqrt/e
        if styles_p:
            ds = ds + 2.0 * styles.astype(f32) * (de @ wsq.T)
        if w_p:
            dwsq = jnp.square(styles.astype(f32)).T @ de       # [C,O]

    dw = None
    if want_dw and dkp is not None:
        # Training path, fused: the adjoint launch accumulated the
        # packed-space weight cotangent in-kernel (zero extra HBM
        # traffic); fold it back onto the 3x3 pixel kernel.
        dw = _unpack_kernel_grad(dkp, pack, c, o)
        if dwsq is not None:
            dw = dw + 2.0 * w.astype(f32) * dwsq[None, None]
        dw = dw.astype(w.dtype)
    elif want_dw:
        # Adjoint launch not taken (w differentiated with frozen
        # x/styles) — XLA tap-einsums over the unpacked tensors:
        # dw[dy,dx,c,o] = sum u_pad[.,y+dy,x+dx,c]*gd'.
        x_px = grouped(x, c).reshape(n, h, width, c) if packed_io else x
        gd_px = grouped(gd, o).reshape(n, h, width, o) if packed_io else gd
        u = (x_px * styles[:, None, None, :].astype(x.dtype))
        up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = []
        for dy in range(3):
            row = []
            for dxx in range(3):
                win = up[:, dy:dy + h, dxx:dxx + width, :]
                row.append(jnp.einsum("nhwc,nhwo->co", win.astype(f32),
                                      gd_px.astype(f32)))
            taps.append(jnp.stack(row))
        dw = jnp.stack(taps)
        if dwsq is not None:
            dw = dw + 2.0 * w.astype(f32) * dwsq[None, None]
        dw = dw.astype(w.dtype)

    dnoise = None
    if noise is not None:
        if noise_p:
            axes = (4,) if noise.ndim == 3 else (0, 4)
            dn = jnp.sum(grouped(g_pre.astype(f32), o), axis=axes)
            dnoise = dn.reshape(noise.shape).astype(noise.dtype)
        else:
            dnoise = jnp.zeros_like(noise)
    dbias = None
    if bias is not None:
        if not bias_p:
            dbias = jnp.zeros_like(bias)
        elif dd2 is not None:
            # sum g_pre = dd2/d per (n, o): the tap already reduced it.
            t2b = jnp.sum(jnp.sum(dd2, axis=1).reshape(n, pack, o), axis=1)
            dbias = jnp.sum(t2b / d, axis=0).astype(bias.dtype)
        else:
            dbias = jnp.sum(grouped(g_pre.astype(f32), o),
                            axis=(0, 1, 2, 3)).astype(bias.dtype)

    return (dx if dx is not None else jnp.zeros_like(x),
            dw if dw is not None else jnp.zeros_like(w),
            ds.astype(styles.dtype) if ds is not None else jnp.zeros_like(styles),
            dnoise, dbias, dresid)


fused_modconv3x3_lrelu.defvjp(_modconv_fwd, _modconv_bwd, symbolic_zeros=True)


def pallas_conv_eligible(x_shape, w_shape, groups) -> bool:
    """conv2d_resample gate: plain SAME 3x3, stride 1, no groups, big
    spatial + low channels — where the packed kernel measures ~1.4-2.2x
    over XLA's conv (see module docstring). TPU-only (the CPU path would
    run interpreted)."""
    import jax

    from morphganformer_tpu.ops.packed_override import packed_paths_disabled

    if packed_paths_disabled():
        return False
    if jax.default_backend() != "tpu":
        return False
    if groups != 1:
        return False
    kh, kw, ci, co = w_shape
    if (kh, kw) != (3, 3):
        return False
    n, h, w, c = x_shape
    return h == w and h >= 512 and c <= 64 and co <= 64 and w % 2 == 0


# ---------------------------------------------------------------------------
# Packed high-resolution pipeline: 2x-upsampling modulated conv whose input
# AND output live in the lane-packed [N, H, G, 128] representation
# (G = W*C/128 pixel groups; for the FFHQ synthesis tail G == 256 at every
# resolution >= 256 because W doubles exactly as C halves).
#
# Why: profiling shows the high-res NHWC C=32/64 tensors are layout poison —
# XLA assigns narrow-lane conv layouts (T(2,128)) and pays a 64 MB relayout
# copy at every producer/consumer transition, and depthwise FIR convs run
# 4-5x off the HBM roofline (SynthesisBlock b1024 baseline: ~4 ms/run of
# pure copies). Keeping every >=512^2 op in one 128-lane packed layout
# removes the narrow tensors altogether. This replaces the reference's
# upfirdn2d.cu fused resampler (reference upfirdn2d.cu:21,90) for the
# synthesis hot path.
#
# Index algebra (derived from the zero-insert upsample semantics of
# conv2d_resample's up path, conv2d_resample.py:200-231): with composed
# pixel kernel K[L, L] and torch-style padding p0, out pixel o depends on
# in pixel m via tap t = 2*(m - o//2) + p0 - (o % 2), valid when 0 <= t < L.
# In the packed domain (in pack P, out pack Q = 2P) the group count is
# resolution-invariant, so the up-conv is a plain 3-group-window block conv
# with parity-dependent row taps; its adjoint (the backward dx) is a
# 6-row-window block conv at the input resolution.
# ---------------------------------------------------------------------------


def _pack_upconv_kernel(kpix, pack_in, pack_out, p0):
    """Packed-domain block kernels for a 2x-up conv with composed pixel
    kernel kpix [L, L, Cin, Cout]. Returns ([2(parity), 3(dy), 3(gx),
    P*Cin, Q*Cout], nonzero-mask [2, 3, 3]); row tap t_y = 2*(dy-1) + p0
    - parity, column tap t_x = 2*(P*(gx-1) + u - v//2) + p0 - (v%2).

    The mask marks blocks whose every tap lands on the zero pad row — a
    STATIC property of the tap geometry (kernel size L, pack, p0), not of
    the weight values. The compute kernel skips those dots entirely: for
    the 1x1-up resnet skip (L=4) about half the 18 block matmuls are
    structurally zero; even the 3x3-up conv (L=6) drops one parity row."""
    L, _, cin, cout = kpix.shape
    P, Q = pack_in, pack_out
    kpad = jnp.concatenate(
        [kpix, jnp.zeros((1, L, cin, cout), kpix.dtype)], axis=0)
    kpad = jnp.concatenate(
        [kpad, jnp.zeros((L + 1, 1, cin, cout), kpix.dtype)], axis=1)

    t_y, t_x, nonzero = _upconv_taps(L, P, Q, p0)
    blk = kpad[t_y, t_x]                                   # [2,3,3,P,Q,ci,co]
    blk = blk.transpose(0, 1, 2, 3, 5, 4, 6)               # [2,3,3,P,ci,Q,co]
    return blk.reshape(2, 3, 3, P * cin, Q * cout), nonzero


def _upconv_taps(L, P, Q, p0):
    """Static tap geometry of the packed 2x-up conv: index arrays
    (t_y, t_x) into the zero-row-padded pixel kernel (invalid taps -> L)
    and the [2][3][3] nonzero-block mask. Pure numpy — callers can get
    the mask without building the block tensor."""
    import numpy as np

    def tap(t):
        return np.where((t >= 0) & (t < L), t, L)

    rho = np.arange(2)[:, None, None, None, None]
    dy = np.arange(3)[None, :, None, None, None]
    gx = np.arange(3)[None, None, :, None, None]
    u = np.arange(P)[None, None, None, :, None]
    v = np.arange(Q)[None, None, None, None, :]
    t_y = tap(2 * (dy - 1) + p0 - rho)                     # [2,3,1,1,1]
    t_x = tap(2 * (P * (gx - 1) + u - v // 2) + p0 - (v % 2))
    t_y = np.broadcast_to(t_y, (2, 3, 3, P, Q))
    t_x = np.broadcast_to(t_x, (2, 3, 3, P, Q))
    nonzero = tuple(tuple(tuple(bool(z) for z in row) for row in par)
                    for par in np.logical_not(
                        np.all((t_y == L) | (t_x == L), axis=(3, 4))))
    return t_y, t_x, nonzero


def _pack_downconv_kernel(kpix, pack_in, pack_out, p0):
    """Adjoint (down) block kernels: dx[m] = sum_o K[2m - o + p0] g[o].
    Returns ([6(dr), 3(gx), Q*Cout, P*Cin], nonzero-mask [6, 3]); row tap
    t_y = p0 + 2 - dr, column tap t_x = 2u - v - Q*(gx-1) + p0. The mask
    is the same static zero-block structure as _pack_upconv_kernel's."""
    import numpy as np

    L, _, cin, cout = kpix.shape
    P, Q = pack_in, pack_out
    kpad = jnp.concatenate(
        [kpix, jnp.zeros((1, L, cin, cout), kpix.dtype)], axis=0)
    kpad = jnp.concatenate(
        [kpad, jnp.zeros((L + 1, 1, cin, cout), kpix.dtype)], axis=1)

    def tap(t):
        return np.where((t >= 0) & (t < L), t, L)

    dr = np.arange(6)[:, None, None, None]
    gx = np.arange(3)[None, :, None, None]
    v = np.arange(Q)[None, None, :, None]
    u = np.arange(P)[None, None, None, :]
    t_y = tap(np.broadcast_to(p0 + 2 - dr, (6, 3, Q, P)))
    t_x = tap(np.broadcast_to(2 * u - v - Q * (gx - 1) + p0, (6, 3, Q, P)))
    nonzero = tuple(tuple(bool(z) for z in row) for row in np.logical_not(
        np.all((t_y == L) | (t_x == L), axis=(2, 3))))
    blk = kpad[t_y, t_x]                                   # [6,3,Q,P,ci,co]
    blk = blk.transpose(0, 1, 2, 5, 3, 4)                  # [6,3,Q,co,P,ci]
    return blk.reshape(6, 3, Q * cout, P * cin), nonzero


def _packed_upconv_kernel(x_hbm, we_ref, wo_ref, s_ref, d_ref, *rest,
                          tile_out, wg, gain, alpha, use_noise, use_bias,
                          masks, use_dw=False):
    """Packed 2x-up modulated conv + demod + noise + bias + lrelu. Output
    tile rows [r0, r0+tile_out) draw on input rows r0//2 - 1 .. r0//2 +
    tile_out//2 (+1 halo each side, same VMEM-halo scheme as
    _modconv_epilogue_kernel). we/wo: parity block kernels [3,3,PC,QO].

    use_dw (dconv-adjoint launches only, styles==1): an extra pipelined
    input block u [tile_out, wg, QO] (the down-conv's saved input x at
    this launch's OUTPUT resolution) and a grid-resident f32 output
    dBlk [2, 3, 3, PC, QO] accumulating the parity block kernels'
    cotangent under <u, output>: dBlk[par, dy, gx] += win(dy,gx)^T @
    u_par — the very window slices the dx dots below already take, so
    the down-conv's WEIGHT gradient costs 9 extra MXU dots per parity
    and zero extra HBM traffic (the caller folds dBlk back through the
    linear packing chain)."""
    if use_noise:
        noise_ref, rest = rest[0], rest[1:]
    if use_bias:
        bias_ref, rest = rest[0], rest[1:]
    if use_dw:
        u_ref, rest = rest[0], rest[1:]
    o_ref, *rest = rest
    if use_dw:
        dw_ref, *rest = rest
    x_vmem, sems = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    pc = x_vmem.shape[-1]
    po = o_ref.shape[-1]
    h_in = x_hbm.shape[1]
    tile_in = tile_out // 2
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def dmas(s, tile_idx):
        row0 = tile_idx * tile_in
        ops = [pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0, tile_in)],
            x_vmem.at[s, pl.ds(1, tile_in), pl.ds(8, wg)], sems.at[s, 0])]
        if n_i > 1:
            top = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.maximum(row0 - 1, 0), 1)],
                x_vmem.at[s, pl.ds(0, 1), pl.ds(8, wg)], sems.at[s, 1])
            bot = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.minimum(row0 + tile_in, h_in - 1), 1)],
                x_vmem.at[s, pl.ds(tile_in + 1, 1), pl.ds(8, wg)],
                sems.at[s, 2])
            ops += [top, bot]
        return ops

    @pl.when(i == 0)
    def _():
        x_vmem[:, :, :8] = jnp.zeros_like(x_vmem[:, :, :8])
        x_vmem[:, :, wg + 8:] = jnp.zeros_like(x_vmem[:, :, wg + 8:])
        if n_i == 1:
            x_vmem[:, 0] = jnp.zeros_like(x_vmem[:, 0])
            x_vmem[:, tile_in + 1] = jnp.zeros_like(x_vmem[:, tile_in + 1])
        for op in dmas(slot, i):
            op.start()

    @pl.when(i + 1 < n_i)
    def _():
        for op in dmas(nxt, i + 1):
            op.start()

    for op in dmas(slot, i):
        op.wait()

    if n_i > 1:
        @pl.when(i == 0)
        def _():
            x_vmem[slot, 0] = jnp.zeros_like(x_vmem[slot, 0])

        @pl.when(i == n_i - 1)
        def _():
            x_vmem[slot, tile_in + 1] = jnp.zeros_like(
                x_vmem[slot, tile_in + 1])

    xs = x_vmem[slot] * _row_select(s_ref, b)[None, None, :]
    if use_dw:
        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
        u = u_ref[0].reshape(tile_in, 2, wg, po)   # rows split by parity
    accs = []
    for par, (w_ref, mask) in enumerate(zip((we_ref, wo_ref), masks)):
        acc = jnp.zeros((tile_in * wg, po), jnp.float32)
        if use_dw:
            u_par = u[:, par].reshape(tile_in * wg, po)
        for dy in range(3):
            for dx in range(3):
                if not mask[dy][dx]:
                    continue  # block is structurally zero (pad-row taps)
                win = xs[dy:dy + tile_in, 7 + dx:7 + dx + wg, :].reshape(
                    tile_in * wg, pc)
                acc = acc + jnp.dot(win, w_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
                if use_dw:
                    dw_ref[par, dy, dx] += jax.lax.dot_general(
                        win, u_par, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        accs.append(acc.reshape(tile_in, 1, wg, po))
    # Interleave even/odd output rows: [tile_in, 2, wg, po] -> [tile_out,...]
    y = jnp.concatenate(accs, axis=1).reshape(tile_out, wg, po)
    y = y * _row_select(d_ref, b)[None, None, :]
    if use_noise:
        nz = noise_ref[...]
        y = y + nz.reshape(tile_out, wg, po).astype(jnp.float32)
    if use_bias:
        y = y + bias_ref[0][None, None, :]
    if alpha != 1.0:
        y = jnp.where(y >= 0, y, y * alpha)
    if gain != 1.0:
        y = y * gain
    o_ref[0] = y.astype(o_ref.dtype)


def _packed_downconv_kernel(g_hbm, w_ref, *rest, tile_s, wg, mask,
                            use_scale=False, use_dot=False,
                            gain=1.0, alpha=1.0, use_bias=False,
                            use_resid=False, use_dd=False,
                            use_dd_noise=False, dd_gain=1.0, dd_alpha=1.0,
                            use_dw=False, dw_mask=None):
    """Strided 2x-down packed conv: output tile rows [s0, s0+tile_s) at
    the HALF resolution read full-res rows [2*s0-2, 2*s0+2*tile_s+2) with
    a 2-row halo each side. w_ref: [6, 3, QO, PC]. Serves two roles with
    the same DMA geometry:

      * the exact adjoint of the packed up-conv (custom-VJP backward) —
        use_scale multiplies the output by a per-(batch, channel) VMEM
        vector (the style s, so du*s costs no extra pass) and use_dot
        adds an input tile z plus a per-tile output dot[b, i] =
        sum_pixels z * acc over the PRE-scale f32 accumulator (the
        ds = sum x*du reduction);
      * the FORWARD 2x-down conv of the discriminator tower
        (fused_packed_dconv2) — the composed conv+FIR kernel, packed by
        _pack_downconv_kernel on its flipped/channel-swapped form, plus
        the fused bias + lrelu(alpha) * gain [+ resid] epilogue that
        replaces the separate BiasAct pass."""
    if use_scale:
        scale_ref, rest = rest[0], rest[1:]
    if use_bias:
        bias_ref, rest = rest[0], rest[1:]
    if use_resid:
        resid_ref, rest = rest[0], rest[1:]
    if use_dot:
        dot_in_ref, rest = rest[0], rest[1:]
    if use_dd:
        dd_y_ref, rest = rest[0], rest[1:]
        if use_dd_noise:
            dd_nz_ref, rest = rest[0], rest[1:]
    rest = list(rest)
    o_ref = rest.pop(0)
    dot_ref = rest.pop(0) if use_dot else None
    dd1_ref = rest.pop(0) if use_dd else None
    dd2_ref = rest.pop(0) if use_dd else None
    dw_ref = rest.pop(0) if use_dw else None
    g_vmem, sems = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    qo = g_vmem.shape[-1]
    pc = o_ref.shape[-1]
    h_out = g_hbm.shape[1]
    rows = 2 * tile_s + 4
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def dmas(s, tile_idx):
        r0 = 2 * tile_idx * tile_s
        ops = [pltpu.make_async_copy(
            g_hbm.at[b, pl.ds(r0, 2 * tile_s)],
            g_vmem.at[s, pl.ds(2, 2 * tile_s), pl.ds(8, wg)], sems.at[s, 0])]
        if n_i > 1:
            top = pltpu.make_async_copy(
                g_hbm.at[b, pl.ds(jnp.maximum(r0 - 2, 0), 2)],
                g_vmem.at[s, pl.ds(0, 2), pl.ds(8, wg)], sems.at[s, 1])
            bot = pltpu.make_async_copy(
                g_hbm.at[b, pl.ds(jnp.minimum(r0 + 2 * tile_s, h_out - 2), 2)],
                g_vmem.at[s, pl.ds(2 * tile_s + 2, 2), pl.ds(8, wg)],
                sems.at[s, 2])
            ops += [top, bot]
        return ops

    @pl.when(i == 0)
    def _():
        g_vmem[:, :, :8] = jnp.zeros_like(g_vmem[:, :, :8])
        g_vmem[:, :, wg + 8:] = jnp.zeros_like(g_vmem[:, :, wg + 8:])
        if n_i == 1:
            g_vmem[:, 0:2] = jnp.zeros_like(g_vmem[:, 0:2])
            g_vmem[:, 2 * tile_s + 2:] = jnp.zeros_like(
                g_vmem[:, 2 * tile_s + 2:])
        for op in dmas(slot, i):
            op.start()

    @pl.when(i + 1 < n_i)
    def _():
        for op in dmas(nxt, i + 1):
            op.start()

    for op in dmas(slot, i):
        op.wait()

    if n_i > 1:
        @pl.when(i == 0)
        def _():
            g_vmem[slot, 0:2] = jnp.zeros_like(g_vmem[slot, 0:2])

        @pl.when(i == n_i - 1)
        def _():
            g_vmem[slot, 2 * tile_s + 2:] = jnp.zeros_like(
                g_vmem[slot, 2 * tile_s + 2:])

    g = g_vmem[slot]
    if use_dd:
        # Demod-chain dd taps over the full-res interior gd tile (rows
        # [2, 2+2*tile_s)) — see _modconv_epilogue_kernel's dd block.
        gd_t = g[2:2 + 2 * tile_s, 8:8 + wg, :].reshape(
            2 * tile_s * wg, qo).astype(jnp.float32)
        yv = dd_y_ref[...].reshape(2 * tile_s * wg, qo).astype(jnp.float32)
        t = yv * jnp.where(yv >= 0, 1.0 / dd_gain,
                           1.0 / (dd_gain * dd_alpha))
        if use_dd_noise:
            t = t - dd_nz_ref[...].reshape(2 * tile_s * wg, qo).astype(
                jnp.float32)
        tap1 = jnp.sum(gd_t * t, axis=0)
        tap2 = jnp.sum(gd_t, axis=0)
        ddrows = jax.lax.broadcasted_iota(jnp.int32, (8, qo), 0)
        dd1_ref[0] = jnp.where(ddrows == 0, tap1[None, :], 0.0)
        dd2_ref[0] = jnp.where(ddrows == 0, tap2[None, :], 0.0)
    # View rows as (row_pair, parity) so each dr-tap is a contiguous slice.
    g2 = g.reshape(rows // 2, 2, g.shape[1], qo)
    acc = jnp.zeros((tile_s * wg, pc), jnp.float32)
    for dr in range(6):
        for gx in range(3):
            if not mask[dr][gx]:
                continue  # block is structurally zero (pad-row taps)
            win = g2[dr // 2:dr // 2 + tile_s, dr % 2,
                     7 + gx:7 + gx + wg, :].reshape(tile_s * wg, qo)
            acc = acc + jnp.dot(win, w_ref[dr, gx],
                                preferred_element_type=jnp.float32)
    if use_dw:
        # Packed up-conv WEIGHT gradient, riding this adjoint launch
        # (training path): with g_vmem = the haloed output-res gd and
        # dot_in = the input-res x tile, the up-conv's packed block
        # cotangent is dBlk[par, dy, gxf] = sum_tiles u^T @ win(dr, gxw)
        # with dr = 2*(2-dy)+par, gxw = 2-gxf — the SAME window slices the
        # dx conv above takes, so dw costs only the extra MXU dots (the
        # former XLA path re-ran a full conv-transpose weight grad over
        # output-res tensors). Accumulated DOWN-indexed [6, 3, PC, QO] in
        # a grid-invariant VMEM block; the caller remaps to up indices and
        # folds back through _pack_upconv_kernel/_compose_kernel_fir.
        # dw_mask marks blocks structurally zero in the UP kernel.
        z = dot_in_ref[0].reshape(tile_s * wg, pc)
        u_t = (z.astype(jnp.float32)
               * _row_select(scale_ref, b)[None, :]).astype(g.dtype)

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        for dr in range(6):
            for gx in range(3):
                if not dw_mask[dr][gx]:
                    continue
                win = g2[dr // 2:dr // 2 + tile_s, dr % 2,
                         7 + gx:7 + gx + wg, :].reshape(tile_s * wg, qo)
                tap = jax.lax.dot_general(
                    u_t, win, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dw_ref[dr, gx] += tap
    if use_dot:
        z = dot_in_ref[0].reshape(tile_s * wg, pc).astype(jnp.float32)
        partial = jnp.sum(z * acc, axis=0)
        # 8-sublane output block, partial in row 0 (see
        # _modconv_epilogue_kernel's dot tap).
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, pc), 0)
        dot_ref[0] = jnp.where(rows == 0, partial[None, :], 0.0)
    if use_scale:
        acc = acc * _row_select(scale_ref, b)[None, :]
    if use_bias:
        acc = acc + bias_ref[0][None, :]
    if alpha != 1.0:
        acc = jnp.where(acc >= 0, acc, acc * alpha)
    if gain != 1.0:
        acc = acc * gain
    if use_resid:
        acc = acc + resid_ref[0].reshape(tile_s * wg, pc).astype(jnp.float32)
    o_ref[0] = acc.reshape(tile_s, wg, pc).astype(o_ref.dtype)


def _packed_upconv_pallas(xp, blk, s_p, d_p, noise_p, bias_p, gain, alpha,
                          masks=None, dot_with=None, dw_taps=False):
    """Run the packed up-conv kernel. xp: [N, H_in, G, PC]; blk:
    [2, 3, 3, PC, QO] parity kernels; s_p [N, PC]; d_p [N, QO] f32;
    noise_p [H_out, G, QO] or None; bias_p [QO] f32 or None; masks:
    static nonzero-block mask [2][3][3] from _pack_upconv_kernel (None =
    treat every block as nonzero). Returns [N, 2*H_in, G, QO].

    dw_taps (dconv-adjoint launches only; requires dot_with, the saved
    down-conv input [N, H_out, G, QO]): adds a grid-resident f32 output
    dBlk [2, 3, 3, PC, QO] — the parity block kernels' cotangent under
    <dot_with, output>, accumulated across every (batch, tile) step (see
    the kernel's use_dw block). Returns (y, dBlk)."""
    n, h_in, wg, pc = xp.shape
    qo = blk.shape[-1]
    h_out = 2 * h_in
    use_noise = noise_p is not None
    use_bias = bias_p is not None
    assert not dw_taps or dot_with is not None
    wgp = 8 + (-(-(wg + 1) // 8) * 8)

    es = xp.dtype.itemsize
    budget = (10 * 1024 * 1024
              - (2 * 9 * pc * qo * 4 if dw_taps else 0))
    tile_out = 2
    for t in (32, 16, 8, 4, 2):
        if h_out % t:
            continue
        ti = t // 2
        need = (2 * (ti + 2) * wgp * pc * es + 2 * t * wg * qo * es
                + (2 * t * wg * qo * es if use_noise else 0)
                + (2 * t * wg * qo * es if dw_taps else 0)
                + 2 * ti * wg * qo * 4 + (ti + 2) * wgp * pc * es)
        if need <= budget:
            tile_out = t
            break

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 3, pc, qo), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, pc, qo), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # styles [N, PC]
        pl.BlockSpec(memory_space=pltpu.VMEM),   # demod  [N, QO]
    ]
    args = [xp, blk[0], blk[1], s_p, d_p]
    if use_noise:
        if noise_p.ndim == 4:      # per-sample noise [N, H_out, wg, QO]
            in_specs.append(pl.BlockSpec((1, tile_out, wg, qo),
                                         lambda b, i: (b, i, 0, 0),
                                         memory_space=pltpu.VMEM))
        else:                      # batch-shared noise [H_out, wg, QO]
            in_specs.append(pl.BlockSpec((tile_out, wg, qo),
                                         lambda b, i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
        args.append(noise_p)
    if use_bias:
        in_specs.append(pl.BlockSpec((1, qo), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_p[None].astype(jnp.float32))
    if dw_taps:
        in_specs.append(pl.BlockSpec((1, tile_out, wg, qo),
                                     lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dot_with)

    if masks is None:
        masks = (((True,) * 3,) * 3,) * 2

    def kern(x_hbm, we_ref, wo_ref, s_ref, d_ref, *rest):
        _packed_upconv_kernel(x_hbm, we_ref, wo_ref, s_ref, d_ref, *rest,
                              tile_out=tile_out, wg=wg, gain=float(gain),
                              alpha=float(alpha), use_noise=use_noise,
                              use_bias=use_bias, masks=masks,
                              use_dw=dw_taps)

    out_shapes = [jax.ShapeDtypeStruct((n, h_out, wg, qo), xp.dtype)]
    out_specs_l = [pl.BlockSpec((1, tile_out, wg, qo),
                                lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)]
    if dw_taps:
        # Grid-invariant block: stays VMEM-resident across every step and
        # is written back once at the end of the launch.
        out_shapes.append(
            jax.ShapeDtypeStruct((2, 3, 3, pc, qo), jnp.float32))
        out_specs_l.append(pl.BlockSpec((2, 3, 3, pc, qo),
                                        lambda b, i: (0, 0, 0, 0, 0),
                                        memory_space=pltpu.VMEM))

    single = len(out_shapes) == 1
    return pl.pallas_call(
        kern,
        out_shape=out_shapes[0] if single else tuple(out_shapes),
        grid=(n, h_out // tile_out),
        interpret=jax.default_backend() == "cpu",
        in_specs=in_specs,
        out_specs=out_specs_l[0] if single else tuple(out_specs_l),
        scratch_shapes=[
            pltpu.VMEM((2, tile_out // 2 + 2, wgp, pc), xp.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(*args)


def _packed_downconv_pallas(gp, kdown, mask=None, scale=None, dot_with=None,
                            bias_p=None, gain=1.0, alpha=1.0, resid_p=None,
                            dd_with=None, dd_noise=None, dd_gain=1.0,
                            dd_alpha=1.0, dw_taps=False, dw_mask=None):
    """Strided 2x-down packed conv (adjoint of _packed_upconv_pallas, or
    the D tower's forward down-conv). gp: [N, H_out, G, QO]; kdown:
    [6, 3, QO, PC]; mask: static nonzero-block mask [6][3] from
    _pack_downconv_kernel; scale [N, PC] f32 or None (per-channel output
    multiply in-kernel: du -> du*s); dot_with [N, H_in, G, PC] or None
    (also return per-tile partials dots[n, i, PC] of
    sum_pixels(dot_with * pre-scale adjoint) — the ds reduction);
    bias_p [PC] f32 / gain / alpha / resid_p [N, H_in, G, PC]: the fused
    forward epilogue bias + lrelu(alpha) * gain [+ resid].
    Returns [N, H_out//2, G, PC] (plus dots when dot_with is given).

    dw_taps (requires dot_with and scale; adjoint launch only) adds a
    grid-resident f32 output [6, 3, PC, QO] — the up-conv's packed block
    cotangent in DOWN indexing, accumulated across every (batch, tile)
    step (see the kernel's use_dw block). dw_mask: static [6][3]
    nonzero mask of the UP kernel blocks, remapped to down indices."""
    n, h_out, wg, qo = gp.shape
    pc = kdown.shape[-1]
    h_in = h_out // 2
    wgp = 8 + (-(-(wg + 1) // 8) * 8)
    use_scale = scale is not None
    use_dot = dot_with is not None
    use_bias = bias_p is not None
    use_resid = resid_p is not None
    use_dd = dd_with is not None
    assert not dw_taps or (use_dot and use_scale and dw_mask is not None)
    dd_blocks = (1 if use_dd else 0) + (1 if dd_noise is not None else 0)

    es = gp.dtype.itemsize
    budget = 10 * 1024 * 1024 - (2 * 18 * pc * qo * 4 if dw_taps else 0)
    tile_s = 2
    for t in (32, 16, 8, 4, 2):
        if h_in % t:
            continue
        need = (2 * (2 * t + 4) * wgp * qo * es + 2 * t * wg * pc * es
                + t * wg * pc * 4 + (2 * t + 4) * wgp * qo * es
                + (2 * t * wg * pc * es if (use_dot or use_resid) else 0)
                + dd_blocks * 2 * (2 * t) * wg * qo * es)
        if need <= budget:
            tile_s = t
            break

    if mask is None:
        mask = ((True,) * 3,) * 6

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((6, 3, qo, pc), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [gp, kdown]
    if use_scale:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # [N, PC]
        args.append(scale.astype(jnp.float32))
    if use_bias:
        in_specs.append(pl.BlockSpec((1, pc), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_p[None].astype(jnp.float32))
    if use_resid:
        in_specs.append(pl.BlockSpec((1, tile_s, wg, pc),
                                     lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(resid_p)
    if use_dot:
        in_specs.append(pl.BlockSpec((1, tile_s, wg, pc),
                                     lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dot_with)
    if use_dd:
        # dd-tap inputs live at the FULL output resolution (2*tile_s rows
        # per grid step), matching the kernel's interior gd tile.
        in_specs.append(pl.BlockSpec((1, 2 * tile_s, wg, qo),
                                     lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dd_with)
        if dd_noise is not None:
            if dd_noise.ndim == 4:           # per-sample noise
                in_specs.append(pl.BlockSpec((1, 2 * tile_s, wg, qo),
                                             lambda b, i: (b, i, 0, 0),
                                             memory_space=pltpu.VMEM))
            else:                            # batch-shared noise
                in_specs.append(pl.BlockSpec((2 * tile_s, wg, qo),
                                             lambda b, i: (i, 0, 0),
                                             memory_space=pltpu.VMEM))
            args.append(dd_noise)

    n_i = h_in // tile_s
    out_shapes = [jax.ShapeDtypeStruct((n, h_in, wg, pc), gp.dtype)]
    out_specs_l = [pl.BlockSpec((1, tile_s, wg, pc),
                                lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)]
    if use_dot:
        out_shapes.append(jax.ShapeDtypeStruct((n, 8 * n_i, pc),
                                               jnp.float32))
        out_specs_l.append(pl.BlockSpec((1, 8, pc), lambda b, i: (b, i, 0),
                                        memory_space=pltpu.VMEM))
    if use_dd:
        dd_spec = pl.BlockSpec((1, 8, qo), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
        out_shapes += [jax.ShapeDtypeStruct((n, 8 * n_i, qo), jnp.float32),
                       jax.ShapeDtypeStruct((n, 8 * n_i, qo), jnp.float32)]
        out_specs_l += [dd_spec, dd_spec]
    if dw_taps:
        # Grid-invariant block: stays VMEM-resident and accumulates
        # across every step, written back once at the end.
        out_shapes.append(jax.ShapeDtypeStruct((6, 3, pc, qo), jnp.float32))
        out_specs_l.append(pl.BlockSpec((6, 3, pc, qo),
                                        lambda b, i: (0, 0, 0, 0),
                                        memory_space=pltpu.VMEM))

    single = len(out_shapes) == 1
    return pl.pallas_call(
        functools.partial(_packed_downconv_kernel, tile_s=tile_s, wg=wg,
                          mask=mask, use_scale=use_scale, use_dot=use_dot,
                          gain=float(gain), alpha=float(alpha),
                          use_bias=use_bias, use_resid=use_resid,
                          use_dd=use_dd,
                          use_dd_noise=dd_noise is not None,
                          dd_gain=float(dd_gain), dd_alpha=float(dd_alpha),
                          use_dw=dw_taps, dw_mask=dw_mask),
        out_shape=out_shapes[0] if single else tuple(out_shapes),
        grid=(n, n_i),
        interpret=jax.default_backend() == "cpu",
        in_specs=in_specs,
        out_specs=out_specs_l[0] if single else tuple(out_specs_l),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * tile_s + 4, wgp, qo), gp.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(*args)


def _upconv_geometry(x_shape, w_shape, f):
    n, h_in, wg, lanes = x_shape
    kh, kw, cin, cout = w_shape
    assert lanes % cin == 0, (lanes, cin)
    P = lanes // cin
    Q = 2 * P
    assert Q * cout == lanes, \
        f"packed up-conv needs cout == cin/2 (got {cin}->{cout})"
    fw = int(f.shape[-1]) if f is not None else 1
    p0 = kh // 2 + (fw + 1) // 2
    return P, Q, p0


def _packed_upconv_fwd_impl(x, w, styles, f, noise, bias, gain, alpha,
                            demodulate, flip_weight):
    n, h_in, wg, lanes = x.shape
    cin, cout = w.shape[2], w.shape[3]
    P, Q, p0 = _upconv_geometry(x.shape, w.shape, f)
    s = styles if styles is not None else jnp.ones((n, cin), jnp.float32)
    d, _ = _demod_coef(w, s, demodulate)

    kpix = _compose_kernel_fir(w.astype(jnp.float32), f, flip_weight, False,
                               gain=4.0)
    blk, blk_mask = _pack_upconv_kernel(kpix.astype(x.dtype), P, Q, p0)
    s_p = jnp.tile(s.astype(x.dtype), (1, P))
    d_p = jnp.tile(d, (1, Q))
    noise_p = None
    if noise is not None:
        h_out = noise.shape[-2]
        if noise.ndim == 3:        # per-sample [N, H_out, W_out]
            noise_p = jnp.broadcast_to(
                noise.reshape(n, h_out, wg, Q, 1), (n, h_out, wg, Q, cout)
            ).reshape(n, h_out, wg, Q * cout).astype(x.dtype)
        else:                      # batch-shared [H_out, W_out]
            noise_p = jnp.broadcast_to(
                noise.reshape(h_out, wg, Q, 1), (h_out, wg, Q, cout)
            ).reshape(h_out, wg, Q * cout).astype(x.dtype)
    bias_p = jnp.tile(bias.astype(jnp.float32), Q) if bias is not None else None
    y = _packed_upconv_pallas(x, blk, s_p, d_p, noise_p, bias_p, gain, alpha,
                              masks=blk_mask)
    return y, d, kpix


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_packed_upconv2(x, w, styles, f, noise, bias, gain, alpha,
                         demodulate, flip_weight):
    """Lane-packed 2x-upsampling modulated conv + FIR + demod + noise +
    bias + leaky_relu, input and output both in packed [N, H, G, 128] form.

    x: packed input (P = 128//Cin pixels per lane group); w: pixel-space
    [kh, kw, Cin, Cout] with Cout == Cin//2 (so the output lane group holds
    Q = 2P pixels); styles: [N, Cin] or None (None = unmodulated, e.g. the
    resnet skip 1x1); f: FIR taps from setup_filter; noise: [H_out, W_out]
    pre-scaled or None; bias [Cout] or None.

    Replaces conv2d_resample's up=2 path (conv2d_resample.py:200-231) +
    modulated_conv2d epilogue for the high-resolution synthesis blocks —
    the whole thing is one VMEM-resident pallas pass, and the backward dx
    is one packed down-conv pass (the exact adjoint). Weight/FIR gradients
    are only computed when those inputs are actually differentiated
    (training); they fall back to a pure-XLA vjp of the unpacked reference
    composition, which keeps them exactly consistent with the unfused path.
    """
    y, _, _ = _packed_upconv_fwd_impl(x, w, styles, f, noise, bias, gain,
                                      alpha, demodulate, flip_weight)
    return y


def _packed_upconv_fwd(x, w, styles, f, noise, bias, gain, alpha,
                       demodulate, flip_weight):
    styles_v = None if styles is None else styles.value
    noise_v = None if noise is None else noise.value
    bias_v = None if bias is None else bias.value
    flags = (_tok(w.perturbed),
             _tok(noise is not None and noise.perturbed),
             _tok(bias is not None and bias.perturbed),
             _tok(styles is not None and styles.perturbed),
             _tok(x.perturbed))
    from morphganformer_tpu.ops.second_order import packed_second_order
    if packed_second_order():
        # Second-order route — see _modconv_fwd.
        from morphganformer_tpu.ops import second_order as so
        y = so.upconv_apply_so(x.value, w.value, styles_v, f.value, noise_v,
                               bias_v, gain, alpha, demodulate, flip_weight)
        # Save y for the routed backward (round-5 saved-residual design).
        return y, (x.value, w.value, styles_v, f.value, noise_v, bias_v,
                   y, None, None, flags)
    y, d, kpix = _packed_upconv_fwd_impl(
        x.value, w.value, styles_v, f.value, noise_v, bias_v, gain, alpha,
        demodulate, flip_weight)
    res = (x.value, w.value, styles_v, f.value, noise_v, bias_v, y, d,
           kpix, flags)
    return y, res


def _packed_upconv_bwd(gain, alpha, demodulate, flip_weight, res, g):
    from morphganformer_tpu.ops.second_order import packed_second_order
    if packed_second_order():
        from morphganformer_tpu.ops import second_order as so
        x, w, styles, f, noise, bias, y, _d, _kpix, flags = res
        flags_b = tuple(fl is not None for fl in flags)
        return so.upconv_bwd_so(x, w, styles, f, noise, bias, y, g,
                                gain, alpha, demodulate, flip_weight,
                                flags_b)
    return _packed_upconv_bwd_impl(gain, alpha, demodulate, flip_weight,
                                   res, g)


def _packed_upconv_bwd_impl(gain, alpha, demodulate, flip_weight, res, g):
    x, w, styles, f, noise, bias, y, d, kpix, flags = res
    w_p, noise_p, bias_p, styles_p, x_p = [fl is not None for fl in flags]
    n, h_in, wg, lanes = x.shape
    cin, cout = w.shape[2], w.shape[3]
    P, Q, p0 = _upconv_geometry(x.shape, w.shape, f)
    f32 = jnp.float32

    mask = jnp.where(y >= 0, jnp.asarray(gain, g.dtype),
                     jnp.asarray(gain * alpha, g.dtype))
    g_pre = g * mask                                          # [N,Hout,G,QO]
    d_p = jnp.tile(d, (1, Q))
    gd = g_pre * d_p[:, None, None, :].astype(g.dtype)

    # One launch of the adjoint kernel yields BOTH dx (the in-kernel scale
    # slot carries s) and the per-tile partials of ds = sum x*du (the
    # in-kernel dot tap, reduced from the f32 accumulator — no bf16 du
    # round-trip and no separate x*du pass). See _packed_downconv_kernel.
    need_dd = demodulate and (styles_p or w_p) and not _skip_dd()
    want_dw = w_p and not _skip_dw()
    dx = ds = dd1 = dd2 = dw_down = None
    s = styles if styles is not None else jnp.ones((n, cin), f32)
    s_p = jnp.tile(s.astype(f32), (1, P))
    if x_p or styles_p:
        kdown, kd_mask = _pack_downconv_kernel(kpix.astype(g.dtype), P, Q, p0)
        dd_kw = {}
        if need_dd:
            # In-kernel demod-chain dd taps on the adjoint launch (see
            # _modconv_bwd / _packed_downconv_pallas).
            nzp = None
            if noise is not None:
                h_out = noise.shape[-2]
                lead = (n,) if noise.ndim == 3 else ()
                nzp = jnp.broadcast_to(
                    noise.reshape(*lead, h_out, wg, Q, 1),
                    (*lead, h_out, wg, Q, cout)).reshape(
                        *lead, h_out, wg, Q * cout).astype(gd.dtype)
            dd_kw = dict(dd_with=y.astype(gd.dtype), dd_noise=nzp,
                         dd_gain=gain, dd_alpha=alpha)
        dw_kw = {}
        if want_dw:
            # In-kernel dw taps: skip blocks structurally zero in the UP
            # kernel, remapped to the adjoint's down indices
            # (dr = 2*(2-dy)+par, gxw = 2-gxf).
            up_mask = _upconv_taps(kpix.shape[0], P, Q, p0)[2]
            dw_kw = dict(dw_taps=True, dw_mask=tuple(
                tuple(up_mask[dr % 2][2 - dr // 2][2 - gxw]
                      for gxw in range(3)) for dr in range(6)))
        # The x tile streams in for the ds dot tap and/or the dw taps.
        use_dot = styles_p or want_dw
        outs = _packed_downconv_pallas(gd, kdown, mask=kd_mask, scale=s_p,
                                       dot_with=(x if use_dot else None),
                                       **dd_kw, **dw_kw)
        outs = list(outs) if isinstance(outs, (tuple, list)) else [outs]
        dxq = outs.pop(0)
        if use_dot:
            dots = outs.pop(0)
            if styles_p:
                ds = jnp.sum(jnp.sum(dots, axis=1).reshape(n, P, cin),
                             axis=1)
        if need_dd:
            dd1, dd2 = outs.pop(0), outs.pop(0)
        if want_dw:
            dw_down = outs.pop(0)
        if x_p:
            dx = dxq.astype(x.dtype)

    def lane_reduce(t, pk, ch):
        """sum over pixels -> [N, ch], lane-preserving first (see
        _modconv_bwd.lane_reduce)."""
        part = jnp.sum(t.reshape(n, -1, pk * ch), axis=1)
        return jnp.sum(part.reshape(n, pk, ch), axis=1)

    dwsq = None
    if dd1 is not None:
        # dd[n,o] = sum_p g_pre*conv_out; mask*act_inv(y) == y exactly, so
        # dd*d^2 = dd1 - b*dd2 from the in-kernel taps and
        # de = -0.5*dd*d^3 = -0.5*(dd1 - b*dd2)*d (see _modconv_bwd).
        t1 = jnp.sum(jnp.sum(dd1, axis=1).reshape(n, Q, cout), axis=1)
        t2 = jnp.sum(jnp.sum(dd2, axis=1).reshape(n, Q, cout), axis=1)
        raw = t1 - bias.astype(f32)[None] * t2 if bias is not None else t1
        de = -0.5 * raw * d
        wsq = jnp.sum(jnp.square(w.astype(f32)), axis=(0, 1))
        if styles_p:
            ds = ds + 2.0 * s.astype(f32) * (de @ wsq.T)
        if w_p:
            dwsq = jnp.square(s.astype(f32)).T @ de
    elif need_dd:
        # Adjoint kernel not launched (w_p with frozen x/styles) — XLA
        # reduction fallback (dd = (sum g*y - sum g_pre*nz - b*sum
        # g_pre)/d, see _modconv_bwd).
        dd = lane_reduce(g.astype(f32) * y.astype(f32), Q, cout)  # [N,Cout]
        if noise is not None:
            h_out = noise.shape[-2]
            gp5 = g_pre.astype(f32).reshape(n, h_out, wg, Q, cout)
            if noise.ndim == 3:
                dd = dd - jnp.einsum(
                    "nhgqo,nhgq->no", gp5,
                    noise.astype(f32).reshape(n, h_out, wg, Q))
            else:
                dd = dd - jnp.einsum(
                    "nhgqo,hgq->no", gp5,
                    noise.astype(f32).reshape(h_out, wg, Q))
        if bias is not None:
            dd = dd - bias.astype(f32)[None] * lane_reduce(
                g_pre.astype(f32), Q, cout)
        dd = dd / d
        wsq = jnp.sum(jnp.square(w.astype(f32)), axis=(0, 1))
        ee = jnp.square(s.astype(f32)) @ wsq
        de = dd * (-0.5) * jax.lax.rsqrt(ee + 1e-8) / (ee + 1e-8)
        if styles_p:
            ds = ds + 2.0 * s.astype(f32) * (de @ wsq.T)
        if w_p:
            dwsq = jnp.square(s.astype(f32)).T @ de

    dw = None
    if want_dw and dw_down is not None:
        # Training path, fused: the adjoint launch accumulated the packed
        # block cotangent in-kernel (down-indexed). Remap to up indices
        # and fold back through the two linear packings — block kernels
        # <- composed pixel kernel <- 3x3 weight — via their exact
        # transposes (tiny tensors; jax.linear_transpose of the literal
        # forward packing code keeps them consistent by construction).
        dblk = jnp.stack([
            jnp.stack([
                jnp.stack([dw_down[2 * (2 - dy) + par, 2 - gxf]
                           for gxf in range(3)], 0)
                for dy in range(3)], 0)
            for par in range(2)], 0)                    # [2,3,3,PC,QO]
        dkpix = jax.linear_transpose(
            lambda kp_: _pack_upconv_kernel(kp_, P, Q, p0)[0],
            jax.ShapeDtypeStruct(kpix.shape, f32))(dblk)[0]
        dw = jax.linear_transpose(
            lambda w_: _compose_kernel_fir(w_, f, flip_weight, False,
                                           gain=4.0),
            jax.ShapeDtypeStruct(w.shape, f32))(dkpix)[0]
        if dwsq is not None:
            dw = dw + 2.0 * w.astype(f32) * dwsq[None, None]
        dw = dw.astype(w.dtype)
    elif want_dw:
        # Adjoint launch not taken (w differentiated with frozen
        # x/styles): vjp of the unpacked XLA reference composition
        # w.r.t. the weight (exactly the unfused semantics).
        from morphganformer_tpu.ops.modulated_conv import modulated_conv2d
        x_unp = x.reshape(n, h_in, wg, P, cin).reshape(n, h_in, wg * P, cin)
        gd_unp = gd.astype(f32).reshape(n, 2 * h_in, wg, Q, cout).reshape(
            n, 2 * h_in, wg * Q, cout)

        def conv_of_w(w_):
            return modulated_conv2d(
                x_unp, w_.astype(x.dtype), styles=s.astype(f32), up=2,
                padding=w.shape[0] // 2, resample_kernel=f,
                demodulate=False, flip_weight=flip_weight).astype(f32)

        # conv_of_w(w) = conv(x*s, K(w)) and gd = g_pre * d, so this is the
        # first product-rule term of d*conv; the demod chain adds the rest.
        dw = jax.vjp(conv_of_w, w.astype(f32))[1](gd_unp)[0]
        if dwsq is not None:
            dw = dw + 2.0 * w.astype(f32) * dwsq[None, None]
        dw = dw.astype(w.dtype)

    dnoise = None
    if noise is not None:
        if noise_p:
            axes = (4,) if noise.ndim == 3 else (0, 4)
            dn = jnp.sum(g_pre.astype(f32).reshape(n, -1, wg, Q, cout),
                         axis=axes)
            dnoise = dn.reshape(noise.shape).astype(noise.dtype)
        else:
            dnoise = jnp.zeros_like(noise)
    dbias = None
    if bias is not None:
        if not bias_p:
            dbias = jnp.zeros_like(bias)
        elif dd2 is not None:
            # sum g_pre = dd2/d per (n, o): the tap already reduced it.
            t2b = jnp.sum(jnp.sum(dd2, axis=1).reshape(n, Q, cout), axis=1)
            dbias = jnp.sum(t2b / d, axis=0).astype(bias.dtype)
        else:
            dbias = jnp.sum(g_pre.astype(f32).reshape(n, -1, wg, Q, cout),
                            axis=(0, 1, 2, 3)).astype(bias.dtype)

    return (dx if dx is not None else jnp.zeros_like(x),
            dw if dw is not None else jnp.zeros_like(w),
            None if styles is None else (
                ds.astype(styles.dtype) if ds is not None
                else jnp.zeros_like(styles)),
            jnp.zeros_like(f),
            dnoise, dbias)


fused_packed_upconv2.defvjp(_packed_upconv_fwd, _packed_upconv_bwd,
                            symbolic_zeros=True)




# ---------------------------------------------------------------------------
# b256 extension (VERDICT r2 #4): 2x-up conv with Cin = 256 > 128 lanes.
#
# NATIVE WIDE-LANE PATH (round 3): the packed-domain tap algebra is
# parametric in the lane width — a 256-channel pixel is simply a P = 1
# "group" of 256 lanes (two hardware lane tiles), and the output group
# holds Q = 2 pixels x 128 channels = 256 lanes. Pixel NHWC
# [N, H, W, 256] IS that packed form verbatim, and the packed output
# [N, 2H, G=W, 256] reshapes to NHWC [N, 2H, 2W, 128] with a free view
# (group g lanes = columns 2g, 2g+1). So the b256 block runs as ONE
# fused_packed_upconv2 launch with the full in-kernel epilogue (demod,
# noise, bias, lrelu) and the standard custom VJP (exact down-conv
# adjoint + in-kernel dd taps) — no quarter kernels, no lane merge, no
# separate XLA epilogue pass. Replaces the reference's upfirdn2d.cu path
# (upfirdn2d.cu:90 small-kernel specializations) for the b256 block.
#
# (An earlier CHANNEL-SPLIT scheme — four quarter kernels accumulated per
# output half + lane merge + XLA epilogue — lost its on-chip A/B to this
# path by 1.28x fwd+bwd and was removed in round 4; ROADMAP.md keeps the
# measurement record.)
# ---------------------------------------------------------------------------


def fused_packed_upconv2_c256(x, w, styles, f, noise, bias, gain, alpha,
                              demodulate, flip_weight):
    """2x-up modulated conv + FIR + demod + noise + bias + lrelu for
    Cin=256 -> Cout=128 (the b256 block). x: PIXEL NHWC [N, H, W, 256];
    returns NHWC [N, 2H, 2W, 128] (identical to the packed
    [N, 2H, G=2W, 128] layout).

    styles: [N, 256] or None (unmodulated skip); noise: [2H, 2W] or
    [N, 2H, 2W] pre-scaled; bias: [128] or None.

    Native wide-lane path (see the section comment above): pixel NHWC is
    already the P=1 packed form at 256 lanes, so this is one
    fused_packed_upconv2 launch plus a free reshape."""
    n, h, width, cin = x.shape
    kh, kw, wc, cout = w.shape
    assert cin == 256 and wc == 256 and cout == 128, (x.shape, w.shape)
    y = fused_packed_upconv2(x, w, styles, f, noise, bias, gain, alpha,
                             demodulate, flip_weight)
    return y.reshape(n, 2 * h, 2 * width, 128)


# ---------------------------------------------------------------------------
# Packed discriminator tower: FORWARD 2x-down conv (+FIR +bias +lrelu
# [+resid]) on lane-packed activations. The D's >=512^2 layers are the same
# narrow-lane/high-res shape the packed synthesis pipeline fixed on the G
# side (reference Conv2dLayer down=2, networks.py:225-250 + upfirdn2d.cu);
# here the composed conv+FIR correlation y[m] = sum_t K[t] x[2m + t - q0]
# is exactly the existing down-conv DMA geometry: packing the
# flipped/channel-swapped K with p0 = L-1-q0 reuses _pack_downconv_kernel
# and _packed_downconv_pallas verbatim, and the backward dx is the packed
# UP-conv of the gradient (same duality, roles reversed).
# ---------------------------------------------------------------------------


def _dconv_compose(w, f, flip_weight):
    """Composed correlation kernel K and its left-pad q0 for down=2,
    padding=k//2 (conv2d_resample.py down fast path semantics)."""
    kh = w.shape[0]
    if f is not None:
        K = _compose_kernel_fir(w.astype(jnp.float32), f, flip_weight, False)
        fw = int(f.shape[-1])
    else:
        K = w.astype(jnp.float32) if flip_weight else w[::-1, ::-1].astype(jnp.float32)
        fw = 1
    q0 = kh // 2 + (fw - 1) // 2
    return K, q0


def _dconv_fwd_impl(x, w, f, bias, gain, alpha, flip_weight, resid=None):
    n, h, wg, lanes = x.shape
    kh, kw, cin, cout = w.shape
    assert lanes % cin == 0 and cout == 2 * cin, (x.shape, w.shape)
    Q = lanes // cin
    P = Q // 2
    K, q0 = _dconv_compose(w, f, flip_weight)
    L = K.shape[0]
    T = K[::-1, ::-1].transpose(0, 1, 3, 2)          # flip + ci<->co swap
    kdown, kmask = _pack_downconv_kernel(T.astype(x.dtype), P, Q, L - 1 - q0)
    bias_p = jnp.tile(bias.astype(jnp.float32), P) if bias is not None else None
    y = _packed_downconv_pallas(x, kdown, mask=kmask, bias_p=bias_p,
                                gain=gain, alpha=alpha,
                                resid_p=None if resid is None
                                else resid.astype(x.dtype))
    return y, K, q0


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_packed_dconv2(x, w, f, bias, resid, gain, alpha, flip_weight):
    """Fused 2x-down conv + FIR + bias + lrelu for the packed D tower:

        y = lrelu(conv_down2(x, compose(w, f)) + bias, alpha) * gain
            [+ resid]

    x: packed [N, H, G, Q*Cin] (Q = lanes/Cin pixels per group); w:
    [k, k, Cin, Cout] HWIO with Cout == 2*Cin (the D channel doubling);
    f: FIR from setup_filter or None; bias: [Cout] or None; resid (or
    None): the resnet skip branch at output resolution, added in-kernel.
    Returns packed [N, H/2, G, P*Cout]. Matches conv2d_resample(...,
    down=2, padding=k//2) + BiasAct exactly (parity-tested)."""
    y, _, _ = _dconv_fwd_impl(x, w, f, bias, gain, alpha, flip_weight, resid)
    return y


def _dconv_fwd(x, w, f, bias, resid, gain, alpha, flip_weight):
    bias_v = None if bias is None else bias.value
    resid_v = None if resid is None else resid.value
    f_v = None if f is None else f.value
    flags = (_tok(x.perturbed), _tok(w.perturbed),
             _tok(bias is not None and bias.perturbed),
             _tok(resid is not None and resid.perturbed))
    from morphganformer_tpu.ops.second_order import packed_second_order
    if packed_second_order():
        # Second-order route — see _modconv_fwd.
        from morphganformer_tpu.ops import second_order as so
        y = so.dconv_apply_so(x.value, w.value, f_v, bias_v, resid_v,
                              gain, alpha, flip_weight)
        # Save y for the routed backward (round-5 saved-residual design).
        return y, (x.value, w.value, f_v, bias_v, resid_v,
                   y, None, None, flags)
    y, K, q0 = _dconv_fwd_impl(x.value, w.value, f_v, bias_v, gain,
                               alpha, flip_weight, resid_v)
    return y, (x.value, w.value, f_v, bias_v, resid_v, y, K, q0, flags)


def _dconv_bwd(gain, alpha, flip_weight, res, g):
    from morphganformer_tpu.ops.second_order import packed_second_order
    if packed_second_order():
        from morphganformer_tpu.ops import second_order as so
        x, w, f, bias, resid, y, _K, _q0, flags = res
        flags_b = tuple(fl is not None for fl in flags)
        return so.dconv_bwd_so(x, w, f, bias, resid, y, g,
                               gain, alpha, flip_weight, flags_b)
    return _dconv_bwd_impl(gain, alpha, flip_weight, res, g)


def _dconv_bwd_impl(gain, alpha, flip_weight, res, g):
    x, w, f, bias, resid, y, K, q0, flags = res
    x_p, w_p, bias_p, resid_p = [fl is not None for fl in flags]
    n, h, wg, lanes = x.shape
    kh, kw, cin, cout = w.shape
    Q = lanes // cin
    P = Q // 2
    L = K.shape[0]
    f32 = jnp.float32

    dresid = None
    if resid is not None:
        dresid = g.astype(resid.dtype) if resid_p else jnp.zeros_like(resid)
        y = y - resid.astype(y.dtype)
    mask = jnp.where(y >= 0, jnp.asarray(gain, g.dtype),
                     jnp.asarray(gain * alpha, g.dtype))
    gz = g * mask                                     # dL/d(conv+bias)

    want_dw = w_p and not _skip_dw()
    dx = dblk = None
    if x_p:
        # Adjoint: dx[r] = sum_m K[r - 2m + q0] gz[m] =
        # sum_m flip(K)[2m - r + (L-1-q0)] gz[m] — a packed 2x-UP conv of
        # the gradient with the flipped, channel-swapped kernel. When the
        # weight is differentiated too (training), the launch also
        # accumulates the block kernels' cotangent in-kernel from the
        # saved input x: <x, upconv(gz; blk)> == <downconv(x; K), gz>, so
        # d<loss>/dblk falls out of the very windows the dx dots slice.
        Tup = K[::-1, ::-1].transpose(0, 1, 3, 2)
        blk, bmask = _pack_upconv_kernel(Tup.astype(gz.dtype), P, Q,
                                         L - 1 - q0)
        ones_s = jnp.ones((n, P * cout), gz.dtype)
        ones_d = jnp.ones((n, Q * cin), f32)
        outs = _packed_upconv_pallas(
            gz, blk, ones_s, ones_d, None, None, 1.0, 1.0, masks=bmask,
            dot_with=x.astype(gz.dtype) if want_dw else None,
            dw_taps=want_dw)
        dxq, dblk = outs if want_dw else (outs, None)
        dx = dxq.astype(x.dtype)

    dw = None
    if want_dw and dblk is not None:
        # Fused path: fold the in-kernel block cotangent back onto the
        # 3x3 weight through the exact transpose of the (linear) packing
        # chain w -> K -> flip/swap -> parity blocks.
        def w_to_blk(w_):
            K_ = _dconv_compose(w_, f, flip_weight)[0]
            T_ = K_[::-1, ::-1].transpose(0, 1, 3, 2)
            return _pack_upconv_kernel(T_, P, Q, L - 1 - q0)[0]

        dw = jax.linear_transpose(
            w_to_blk, jax.ShapeDtypeStruct(w.shape, f32))(dblk)[0]
        dw = dw.astype(w.dtype)
    elif want_dw:
        # Adjoint launch not taken (w differentiated with frozen x):
        # vjp of the XLA reference composition w.r.t. w.
        from morphganformer_tpu.ops.conv2d_resample import conv2d_resample
        x_px = x.reshape(n, h, wg, Q, cin).reshape(n, h, wg * Q, cin)
        gz_px = gz.astype(f32).reshape(n, h // 2, wg, P, cout).reshape(
            n, h // 2, wg * P, cout)

        def conv_of_w(w_):
            return conv2d_resample(x_px, w_.astype(x.dtype), f=f, down=2,
                                   padding=kh // 2,
                                   flip_weight=flip_weight).astype(f32)

        dw = jax.vjp(conv_of_w, w.astype(f32))[1](gz_px)[0].astype(w.dtype)

    dbias = None
    if bias is not None:
        dbias = (jnp.sum(gz.astype(f32).reshape(n, -1, P, cout),
                         axis=(0, 1, 2)).astype(bias.dtype)
                 if bias_p else jnp.zeros_like(bias))

    return (dx if dx is not None else jnp.zeros_like(x),
            dw if dw is not None else jnp.zeros_like(w),
            None if f is None else jnp.zeros_like(f), dbias, dresid)


fused_packed_dconv2.defvjp(_dconv_fwd, _dconv_bwd, symbolic_zeros=True)
