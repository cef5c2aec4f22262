#!/usr/bin/env python
"""Same-res packed-conv kernel variants, timed at flagship shapes (dev tool).

The packed kernels run 3-5x off the HBM roofline (profile_b256.py); this
experiments with the inner-loop structure of _modconv_epilogue_kernel to
find the bottleneck, at the b1024-conv1 shape [1, 1024, 256, 128]:

  base    — the production 9-window slice+reshape loop (library call)
  onetap  — 1 of 9 taps (WRONG numerics; prices the per-tap copy+dot)
  nodma?  — grid with tiny input (prices DMA separately via shape games)
  dxhoist — 3 dx-shifted contiguous copies, row-sliced per dy (3 copies
            instead of 9 unaligned window materializations)

Measurement rules per tools/profile_r3.py. Run alone on the TPU.
"""

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_kv")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from morphganformer_tpu.ops.pallas_conv import _row_select


def _kernel(x_hbm, w_ref, s_ref, d_ref, noise_ref, bias_ref, o_ref,
            x_vmem, sems, *, tile_h, wg, gain, alpha, variant):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    pc = x_vmem.shape[-1]
    po = o_ref.shape[-1]
    h = x_hbm.shape[1]
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def dmas(s, tile_idx):
        row0 = tile_idx * tile_h
        if variant == "onedma":
            # ONE overlapping copy of tile_h+2 rows (halo included) instead
            # of body + 2 single-row halo DMAs. Edge tiles clamp the start
            # row, so their numerics are WRONG — clock-only experiment.
            return [pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.clip(row0 - 1, 0, h - tile_h - 2),
                                  tile_h + 2)],
                x_vmem.at[s, pl.ds(0, tile_h + 2), pl.ds(8, wg)],
                sems.at[s, 0])]
        if variant in ("splitdma2", "splitdma4"):
            # Per-stream-ceiling probe (round 5): the body copy split into
            # K parallel row-chunk copies, each on its own DMA semaphore.
            # Single launches stream at only 150-225 GB/s while two
            # co-scheduled launches reach ~310 aggregate (roofline +
            # fwd-vs-adj A/Bs) — if the ceiling is per-DMA-stream, more
            # concurrent copies should lift a lone launch too.
            K = 2 if variant == "splitdma2" else 4
            ch = tile_h // K
            ops = [pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(row0 + k * ch, ch)],
                x_vmem.at[s, pl.ds(1 + k * ch, ch), pl.ds(8, wg)],
                sems.at[s, k]) for k in range(K)]
            if n_i > 1:
                ops.append(pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(jnp.maximum(row0 - 1, 0), 1)],
                    x_vmem.at[s, pl.ds(0, 1), pl.ds(8, wg)],
                    sems.at[s, K]))
                ops.append(pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(jnp.minimum(row0 + tile_h, h - 1), 1)],
                    x_vmem.at[s, pl.ds(tile_h + 1, 1), pl.ds(8, wg)],
                    sems.at[s, K + 1]))
            return ops
        ops = [pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0, tile_h)],
            x_vmem.at[s, pl.ds(1, tile_h), pl.ds(8, wg)], sems.at[s, 0])]
        if n_i > 1:
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
        @pl.when(i == 0)
        def _():
            x_vmem[slot, 0] = jnp.zeros_like(x_vmem[slot, 0])

        @pl.when(i == n_i - 1)
        def _():
            x_vmem[slot, tile_h + 1] = jnp.zeros_like(
                x_vmem[slot, tile_h + 1])

    if variant == "chunked":
        # Large DMA tile, small compute chunks: the 9-tap dot runs over
        # CH-row sub-chunks so the f32 acc + window materializations stay
        # small while the grid shrinks by tile_h/CH.
        CH = 16
        s_row = _row_select(s_ref, b)[None, None, :]
        d_row = _row_select(d_ref, b)[None, :]
        for c0 in range(0, tile_h, CH):
            xs = x_vmem[slot, c0:c0 + CH + 2] * s_row
            acc = jnp.zeros((CH * wg, po), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    win = xs[dy:dy + CH, 7 + dx:7 + dx + wg, :].reshape(
                        CH * wg, pc)
                    acc = acc + jnp.dot(win, w_ref[dy, dx],
                                        preferred_element_type=jnp.float32)
            acc = acc * d_row
            y = acc.reshape(CH, wg, po)
            y = y + noise_ref[c0:c0 + CH].reshape(CH, wg, po).astype(
                jnp.float32)
            y = y + bias_ref[0][None, None, :]
            y = y * jnp.where(y >= 0, gain, gain * alpha)
            o_ref[0, c0:c0 + CH] = y.astype(o_ref.dtype)
        return

    xs = x_vmem[slot] * _row_select(s_ref, b)[None, None, :]
    acc = jnp.zeros((tile_h * wg, po), jnp.float32)
    if variant in ("base", "slim", "nonoise", "pixnoise", "onedma",
                   "splitdma2", "splitdma4"):
        for dy in range(3):
            for dx in range(3):
                win = xs[dy:dy + tile_h, 7 + dx:7 + dx + wg, :].reshape(
                    tile_h * wg, pc)
                acc = acc + jnp.dot(win, w_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
    elif variant == "onetap":
        win = xs[1:1 + tile_h, 8:8 + wg, :].reshape(tile_h * wg, pc)
        acc = acc + jnp.dot(win, w_ref[1, 1],
                            preferred_element_type=jnp.float32)
    elif variant == "dxhoist":
        for dx in range(3):
            col = xs[:, 7 + dx:7 + dx + wg, :]       # one unaligned copy
            for dy in range(3):
                win = col[dy:dy + tile_h].reshape(tile_h * wg, pc)
                acc = acc + jnp.dot(win, w_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
    elif variant == "bigdot":
        # One [tile*wg, 3pc] x [3pc, po] dot per dy row (3 dots total):
        # the dx-window concat along lanes.
        for dy in range(3):
            rows = [xs[dy:dy + tile_h, 7 + dx:7 + dx + wg, :]
                    for dx in range(3)]
            win = jnp.concatenate(rows, axis=-1).reshape(
                tile_h * wg, 3 * pc)
            wcat = jnp.concatenate([w_ref[dy, dx] for dx in range(3)],
                                   axis=0)
            acc = acc + jnp.dot(win, wcat,
                                preferred_element_type=jnp.float32)
    else:
        raise ValueError(variant)
    if variant in ("slim", "pixnoise"):
        # Slimmed epilogue: noise arrives PRE-BIASED (nz + bias folded on
        # the host side — both are additive), and the lrelu+gain pair
        # collapses into one select-mul: y * where(y>=0, gain, gain*alpha).
        acc = acc * _row_select(d_ref, b)[None, :]
        y = acc.reshape(tile_h, wg, po)
        if variant == "pixnoise":
            # In-kernel packed broadcast of PIXEL noise [tile, W]:
            # group g holds pixels w = g*P + u, each with po//P channels.
            P = 4
            nz = noise_ref[...].reshape(tile_h, wg, P, 1)
            y = y + jnp.broadcast_to(nz, (tile_h, wg, P, po // P)
                                     ).reshape(tile_h, wg, po)
        else:
            y = y + noise_ref[...].reshape(tile_h, wg, po)
        y = y * jnp.where(y >= 0, gain, gain * alpha)
        o_ref[0] = y.astype(o_ref.dtype)
        return
    if variant == "nonoise":
        acc = acc * _row_select(d_ref, b)[None, :]
        y = acc.reshape(tile_h, wg, po)
        y = y + bias_ref[0][None, None, :]
        y = y * jnp.where(y >= 0, gain, gain * alpha)
        o_ref[0] = y.astype(o_ref.dtype)
        return
    acc = acc * _row_select(d_ref, b)[None, :]
    y = acc.reshape(tile_h, wg, po)
    y = y + noise_ref[...].reshape(tile_h, wg, po).astype(jnp.float32)
    y = y + bias_ref[0][None, None, :]
    y = jnp.where(y >= 0, y, y * alpha)
    y = y * gain
    o_ref[0] = y.astype(o_ref.dtype)


def run_variant(xp, kp, s_p, d_p, noise_p, bias_p, variant, tile_h):
    n, h, wg, pc = xp.shape
    po = kp.shape[-1]
    wgp = 8 + (-(-(wg + 1) // 8) * 8)
    n_i = h // tile_h
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 3, pc, po), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xp, kp, s_p, d_p]
    if variant == "pixnoise":
        P = 4
        # pixel noise [h, W] pre-biased (bias replicates across the P*ch
        # lanes of each pixel only when bias is uniform per pixel — for
        # the experiment we just add a pixel-shaped array)
        in_specs.append(pl.BlockSpec((tile_h, wg * P),
                                     lambda b, i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(noise_p.reshape(h, wg * P, po // P)[:, :, 0]
                    .astype(jnp.float32))
    elif variant != "nonoise":
        in_specs.append(pl.BlockSpec((tile_h, wg, po), lambda b, i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(noise_p)
    in_specs.append(pl.BlockSpec((1, po), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(bias_p[None].astype(jnp.float32))

    def kern(x_hbm, w_ref, s_ref, d_ref, *rest, **kw):
        if variant == "nonoise":
            bias_ref, o_ref, x_vmem, sems = rest
            noise_ref = None
        else:
            noise_ref, bias_ref, o_ref, x_vmem, sems = rest
        return _kernel(x_hbm, w_ref, s_ref, d_ref, noise_ref, bias_ref,
                       o_ref, x_vmem, sems, **kw)

    out = pl.pallas_call(
        functools.partial(kern, tile_h=tile_h, wg=wg, gain=1.4142,
                          alpha=0.2, variant=variant),
        out_shape=jax.ShapeDtypeStruct((n, h, wg, po), xp.dtype),
        grid=(n, n_i),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, wg, po), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wgp, pc), xp.dtype),
            pltpu.SemaphoreType.DMA(
                (2, {"splitdma2": 4, "splitdma4": 6}.get(variant, 3))),
        ],
    )(*args)
    return out


def timed(tag, fn, args, steps, n=3):
    @jax.jit
    def run(*a):
        def body(c, i):
            out = fn(*((a[0] + i * jnp.bfloat16(1e-8),) + a[1:]))
            return c, jnp.sum(out.astype(jnp.float32))
        return jax.lax.scan(body, 0.0, jnp.arange(steps))[1][-1]

    run(*args)
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(*args)
        float(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = best * 1000 / steps
    print(f"{tag:<44s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--shape", type=str, default="1024",
                    choices=["1024", "512", "256"])
    ap.add_argument("--tile", type=int, default=0,
                    help="override tile_h (0 = production pick)")
    ap.add_argument("--variants", type=str, default="",
                    help="comma list (default: the standard sweep)")
    args = ap.parse_args()

    h = {"1024": 1024, "512": 512, "256": 256}[args.shape]
    wg, pc, po = 256, 128, 128

    key = jax.random.PRNGKey(0)
    xp = (jax.random.normal(key, (1, h, wg, pc), jnp.float32) * 0.3
          ).astype(jnp.bfloat16)
    kp = (jax.random.normal(key, (3, 3, pc, po), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)
    s_p = jnp.ones((1, pc), jnp.bfloat16)
    d_p = jnp.ones((1, po), jnp.float32)
    noise_p = (jax.random.normal(key, (h, wg, po), jnp.float32) * 0.01
               ).astype(jnp.bfloat16)
    bias_p = jnp.zeros((po,), jnp.float32)

    from morphganformer_tpu.ops.pallas_conv import _pick_tile_h_mod
    tile_h = args.tile or _pick_tile_h_mod(h, pc, po, wg, True, esize=2)
    print(f"shape [1,{h},{wg},{pc}] -> po={po}, tile_h={tile_h}", flush=True)

    variants = ("base", "onetap", "slim", "nonoise", "pixnoise", "base")
    if args.variants:
        variants = tuple(args.variants.split(","))
    ref = None
    for variant in variants:
        fn = lambda x, v=variant: run_variant(x, kp, s_p, d_p, noise_p,
                                              bias_p, v, tile_h)
        try:
            timed(f"{variant} tile={tile_h}", fn, (xp,), args.steps)
        except Exception as e:  # Mosaic internal errors on some variants
            print(f"{variant} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        if variant in ("base", "dxhoist", "bigdot", "chunked"):
            out = fn(xp)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                print(f"  {variant} max-abs diff vs base: {err:.3e}",
                      flush=True)


if __name__ == "__main__":
    main()
