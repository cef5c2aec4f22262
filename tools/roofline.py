"""Roofline / MFU accounting for the packed kernels and the bench
anchors (VERDICT r4 #2): per launch — analytic FLOPs and HBM bytes,
measured on-chip time, implied TFLOP/s (% of MXU peak) and GB/s (% of
HBM peak), which roofline side binds, and the distance off it. Converts
the "HBM-stream-bound" prose into numbers and names the next kernel
target.

Chip peaks (TPU v5e / "v5 lite", the chip jax.devices() reports —
public figures from the Cloud TPU v5e docs and the scaling-book's
hardware table): bf16 MXU 197 TFLOP/s, HBM bandwidth 819 GB/s, 16 GB.

Usage (one process, real chip):
    python tools/roofline.py                 # kernel micro-roofline table
    python tools/roofline.py --anchors       # + anchor-level accounting
                                             #   (uses measured stage ms
                                             #   from BENCH detail args)
    python tools/roofline.py --anchors --stage-ms g_main=132.5 ...

Measurement rules (ROADMAP): time via lax.scan rep loops inside one jit,
sync with a device->host scalar fetch; compare only within-process.

Reference anchor for the kernel class being measured:
upfirdn2d.cu:21,90 + bias_act.cu (the fused conv tails these launches
replace).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_roofline")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

PEAK_TFLOPS_BF16 = 197.0          # TPU v5e MXU, bf16
PEAK_HBM_GBS = 819.0              # TPU v5e HBM bandwidth


def _t(fn, arg, reps, warm=2):
    out = fn(arg)
    float(jnp.sum(out))           # compile + warm (axon: fetch = sync)
    for _ in range(warm - 1):
        out = fn(arg)
        float(jnp.sum(out))
    t0 = time.perf_counter()
    out = fn(arg)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps * 1e3
    return dt


def _scan_loop(op, reps):
    """jit(scan) of y = op(x) with a dummy index carry — times `reps`
    back-to-back launches with zero dispatch overhead."""
    def body(x, _):
        return op(x), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(y.astype(jnp.float32))

    return run


class Row:
    def __init__(self, name, flops, bytes_, ms):
        self.name, self.flops, self.bytes, self.ms = name, flops, bytes_, ms

    def cols(self):
        tf = self.flops / (self.ms * 1e-3) / 1e12
        gbs = self.bytes / (self.ms * 1e-3) / 1e9
        mxu = 100 * tf / PEAK_TFLOPS_BF16
        hbm = 100 * gbs / PEAK_HBM_GBS
        t_flops = self.flops / (PEAK_TFLOPS_BF16 * 1e12) * 1e3
        t_bytes = self.bytes / (PEAK_HBM_GBS * 1e9) * 1e3
        bound = "MXU" if t_flops > t_bytes else "HBM"
        ideal = max(t_flops, t_bytes)
        off = self.ms / ideal if ideal > 0 else float("inf")
        return (self.name, self.flops / 1e9, self.bytes / 1e6, self.ms,
                tf, mxu, gbs, hbm, bound, off)


def _print_table(rows, title):
    print(f"\n== {title} ==")
    hdr = (f"{'launch':<34}{'GFLOP':>8}{'MB':>8}{'ms':>8}{'TF/s':>7}"
           f"{'%MXU':>6}{'GB/s':>7}{'%HBM':>6}{'bound':>6}{'x-off':>7}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        n, gf, mb, ms, tf, mxu, gbs, hbm, bound, off = r.cols()
        print(f"{n:<34}{gf:>8.1f}{mb:>8.0f}{ms:>8.3f}{tf:>7.1f}"
              f"{mxu:>6.1f}{gbs:>7.0f}{hbm:>6.1f}{bound:>6}{off:>7.2f}")


# ---------------------------------------------------------------------------
# Analytic FLOP/byte models. bf16 streams (2 B) unless noted; f32 (4 B)
# for style/demod vectors is negligible and dropped. Conv FLOPs =
# 2*N*Ho*Wo*Ci*Co*k*k (MACs x2). The dd/ds/dw in-kernel taps add dot
# FLOPs but zero extra HBM streams (their outputs are [N,C]-sized).
# ---------------------------------------------------------------------------


def modconv_numbers(n, h, c, o, bwd, noise=True, resid=False, dw=False):
    el = 2  # bf16
    conv_fl = 2 * n * h * h * c * o * 9
    x_b = n * h * h * c * el
    y_b = n * h * h * o * el
    nz_b = h * h * el if noise else 0
    if not bwd:
        fl = conv_fl
        by = x_b + y_b + nz_b + (y_b if resid else 0)
    else:
        # adjoint launch: read g + y(dd taps) + x(dot/dw) + write dx
        fl = conv_fl * (2 if dw else 1)  # dw taps double the MXU dots
        by = y_b + y_b + x_b + x_b + (nz_b if noise else 0)
    return fl, by


def upconv_numbers(n, h_in, ci, co, bwd, dw=False):
    """2x-up conv with composed 6x6 kernel at output res 2h."""
    el = 2
    ho = 2 * h_in
    conv_fl = 2 * n * ho * ho * ci * co * 9  # 6x6/4 taps per output px = 9
    x_b = n * h_in * h_in * ci * el
    y_b = n * ho * ho * co * el
    nz_b = ho * ho * el
    if not bwd:
        return conv_fl, x_b + y_b + nz_b
    fl = conv_fl * (2 if dw else 1)
    by = y_b + y_b + x_b + x_b + nz_b
    return fl, by


def dconv_numbers(n, h_in, ci, bwd, dw=False):
    """2x-down conv ci -> 2ci with composed 4x4 kernel."""
    el = 2
    co = 2 * ci
    ho = h_in // 2
    conv_fl = 2 * n * ho * ho * ci * co * 16
    x_b = n * h_in * h_in * ci * el
    y_b = n * ho * ho * co * el
    if not bwd:
        return conv_fl, x_b + y_b
    fl = conv_fl * (2 if dw else 1)
    by = y_b + x_b + x_b + (x_b if dw else 0)
    return fl, by


def kernel_rows(batch, reps):
    from morphganformer_tpu.ops.pallas_conv import (
        fused_modconv3x3_lrelu, fused_packed_dconv2, fused_packed_upconv2)
    from morphganformer_tpu.ops.upfirdn2d import setup_filter

    f = setup_filter([1, 3, 3, 1])
    rng = np.random.RandomState(0)
    rows = []
    n = batch

    def mk(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.randn(*shape), dt)

    # --- same-res modconv (G conv1 / conv_last geometries) -------------
    for h, c in ((1024, 32), (512, 64)):
        pack = 128 // c
        x = mk((n, h, h // pack, 128))
        w = mk((3, 3, c, c), jnp.float32) * 0.1
        s = mk((n, c), jnp.float32)
        nz = mk((h, h), jnp.float32)

        def op_fwd(xx, w=w, s=s, nz=nz):
            return fused_modconv3x3_lrelu(xx, w, s, nz, None, None,
                                          np.sqrt(2.0), 0.2, True, True)

        ms = _t(_scan_loop(op_fwd, reps), x, reps)
        fl, by = modconv_numbers(n, h, c, c, bwd=False)
        rows.append(Row(f"modconv{h} b{n} {c}ch fwd", fl, by, ms))

        def op_bwd(xx, w=w, s=s, nz=nz):
            return jax.grad(lambda x_: jnp.sum(
                fused_modconv3x3_lrelu(x_, w, s, nz, None, None,
                                       np.sqrt(2.0), 0.2, True, True)
                .astype(jnp.float32)))(xx)

        ms = _t(_scan_loop(op_bwd, reps), x, reps)
        fl, by = modconv_numbers(n, h, c, c, bwd=True)
        fl2, by2 = modconv_numbers(n, h, c, c, bwd=False)
        rows.append(Row(f"modconv{h} b{n} {c}ch fwd+adj",
                        fl + fl2, by + by2, ms))

    # --- 2x-up conv (G conv0 geometries) -------------------------------
    for h_in, ci in ((512, 64), (256, 128)):
        P = 128 // ci if ci <= 128 else 1
        co = ci // 2
        x = mk((n, h_in, h_in // max(P, 1), P * ci))
        w = mk((3, 3, ci, co), jnp.float32) * 0.1
        s = mk((n, ci), jnp.float32)
        nz = mk((2 * h_in, 2 * h_in), jnp.float32)

        def op_fwd(xx, w=w, s=s, nz=nz):
            return fused_packed_upconv2(xx, w, s, f, nz, None,
                                        np.sqrt(2.0), 0.2, True, False)

        ms = _t(_scan_loop(lambda xx: op_fwd(xx)[:, :xx.shape[1], :, :],
                           reps), x, reps)
        fl, by = upconv_numbers(n, h_in, ci, co, bwd=False)
        rows.append(Row(f"upconv{2*h_in} b{n} {ci}->{co} fwd", fl, by, ms))

    # --- 2x-down conv (D tower geometries) -----------------------------
    for h_in, ci in ((1024, 32), (512, 64)):
        Q = 128 // ci
        x = mk((n, h_in, h_in // Q, 128))
        w = mk((3, 3, ci, 2 * ci), jnp.float32) * 0.1
        b = mk((2 * ci,), jnp.float32)

        def op_fwd(xx, w=w, b=b):
            return fused_packed_dconv2(xx, w, f, b, None, np.sqrt(2.0),
                                       0.2, True)

        def chain(xx):
            y = op_fwd(xx)
            # keep carry shape: tile back up (free-ish relayout, timed in)
            return jnp.concatenate([y, y], axis=1).reshape(xx.shape)

        ms = _t(_scan_loop(chain, reps), x, reps)
        fl, by = dconv_numbers(n, h_in, ci, bwd=False)
        rows.append(Row(f"dconv{h_in} b{n} {ci}->{2*ci} fwd+cat",
                        fl, by + 2 * x.size, ms))

    return rows


# ---------------------------------------------------------------------------
# Anchor-level accounting: whole-model FLOPs/bytes per step vs measured
# anchor times. Conv layers >= 64^2 only (the transformer/attention mass
# below 64^2 is < 3% of FLOPs at 1024^2 and is excluded — stated here so
# the table is honest).
# ---------------------------------------------------------------------------


def g_synthesis_numbers(n, res_max=1024, bwd=False):
    ch = lambda r: min((32 << 10) // r, 512)
    fl = by = 0
    r = 8
    while r <= res_max:
        ci, co = ch(r // 2) if r > 8 else ch(8), ch(r)
        if r > 8:
            a, b = upconv_numbers(n, r // 2, ci, co, bwd=bwd, dw=bwd)
            fl, by = fl + a, by + b
        a, b = modconv_numbers(n, r, co, co, bwd=bwd, dw=bwd)
        fl, by = fl + a, by + b
        # torgb 1x1 (+2x-up skip FIR, folded into bytes only)
        fl += 2 * n * r * r * co * 3
        by += n * r * r * (co + 3) * 2
        r *= 2
    return fl, by


def d_tower_numbers(n, res_max=1024, bwd=False):
    ch = lambda r: min((32 << 10) // r, 512)
    fl = by = 0
    r = res_max
    while r >= 16:
        c = ch(r)
        a, b = modconv_numbers(n, r, c, c, bwd=bwd, noise=False, dw=bwd)
        fl, by = fl + a, by + b
        a, b = dconv_numbers(n, r, c, bwd=bwd, dw=bwd)
        fl, by = fl + a, by + b
        r //= 2
    return fl, by


def anchor_rows(stage_ms):
    rows = []
    n = 4
    gf_f, gb_f = g_synthesis_numbers(n, bwd=False)
    gf_b, gb_b = g_synthesis_numbers(n, bwd=True)
    df_f, db_f = d_tower_numbers(n, bwd=False)
    df_b, db_b = d_tower_numbers(n, bwd=True)
    if "g_main" in stage_ms:
        # G_main: G fwd + G bwd + D fwd + D bwd(x only)
        rows.append(Row("train G_main (b4)", gf_f + gf_b + df_f + df_b,
                        gb_f + gb_b + db_f + db_b, stage_ms["g_main"]))
    if "d_main" in stage_ms:
        rows.append(Row("train D_main (b4)", gf_f + 2 * (df_f + df_b),
                        gb_f + 2 * (db_f + db_b), stage_ms["d_main"]))
    if "g_reg" in stage_ms:
        # PL at batch 2 (pl_batch_shrink): fwd + inner bwd + outer bwd
        # (~2x a fwd+bwd pass, saved-y route)
        f2, b2 = g_synthesis_numbers(2, bwd=False)
        f2b, b2b = g_synthesis_numbers(2, bwd=True)
        rows.append(Row("train G_reg/PL (b2)", f2 + 2 * f2b + f2,
                        b2 + 2 * b2b + b2, stage_ms["g_reg"]))
    if "d_reg" in stage_ms:
        rows.append(Row("train D_reg/R1 (b4)", df_f + 2 * df_b + df_f,
                        db_f + 2 * db_b + db_f, stage_ms["d_reg"]))
    if "proj_step" in stage_ms:
        f1, b1 = g_synthesis_numbers(1, bwd=False)
        f1b, b1b = g_synthesis_numbers(1, bwd=True)
        rows.append(Row("projection step (b1)", f1 + f1b, b1 + b1b,
                        stage_ms["proj_step"]))
    if "gen_img" in stage_ms:
        f8, b8 = g_synthesis_numbers(8, bwd=False)
        rows.append(Row("generation img (b8, per-img)", f8 / 8, b8 / 8,
                        stage_ms["gen_img"]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--anchors", action="store_true")
    ap.add_argument("--no-kernels", action="store_true")
    ap.add_argument("--stage-ms", nargs="*", default=[],
                    help="name=ms pairs: g_main g_reg d_main d_reg "
                         "proj_step gen_img")
    args = ap.parse_args()

    print(f"peaks: {PEAK_TFLOPS_BF16} TFLOP/s bf16 MXU, "
          f"{PEAK_HBM_GBS} GB/s HBM (TPU v5e)")
    print(f"devices: {jax.devices()}")

    if not args.no_kernels:
        rows = kernel_rows(args.batch, args.reps)
        _print_table(rows, f"packed kernel micro-roofline "
                           f"(batch {args.batch}, {args.reps} reps)")

    if args.anchors:
        stage_ms = {}
        for kv in args.stage_ms:
            k, v = kv.split("=")
            stage_ms[k] = float(v)
        if not stage_ms:
            # round-4 bench detail defaults (BENCH_r04.json)
            stage_ms = dict(g_main=132.5, g_reg=261.0, d_main=143.6,
                            d_reg=220.1, proj_step=14.5, gen_img=4.05)
        _print_table(anchor_rows(stage_ms),
                     "anchor-level accounting (measured stage ms vs "
                     "analytic conv FLOPs/bytes, >=64^2 convs only)")


if __name__ == "__main__":
    main()
