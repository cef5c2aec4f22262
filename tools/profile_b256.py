"""Per-op timing of the packed high-res blocks at flagship shapes (dev tool).

profile_fwd_blocks attributes 2.86 ms/step to the b256 block vs 0.87 ms
for the equal-FLOP b512 — this tool times each constituent packed op
(skip 1x1-up, conv0 2x-up, conv1 same-res) at the exact batch-1 bf16
shapes the 1024^2 flagship runs, to find which launch is off its
equal-FLOP share.

Axon measurement rules (tools/profile_r3.py): scalar-reducing scan
variants amortized over --steps iterations, params as traced args,
best-of-3 timed runs, compare only within-process.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, args, steps, n=3):
    @jax.jit
    def run(*a):
        def body(c, i):
            out = fn(*((a[0] + i * jnp.bfloat16(1e-8),) + a[1:]))
            return c, jnp.sum(out.astype(jnp.float32))
        return jax.lax.scan(body, 0.0, jnp.arange(steps))[1][-1]

    run(*args)  # compile + warm
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    from morphganformer_tpu.ops.pallas_conv import (
        fused_modconv3x3_lrelu, fused_packed_upconv2,
        fused_packed_upconv2_c256)
    from morphganformer_tpu.ops.upfirdn2d import setup_filter

    f = setup_filter([1, 3, 3, 1])
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def rand(shape, scale=0.3, dtype=dt):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    results = {}

    # ---- b256 block (in 128^2 x 256ch pixel NHWC; out 256^2 x 128ch) ----
    x256 = rand((1, 128, 128, 256))
    w_c0 = rand((3, 3, 256, 128), 0.05, jnp.float32)
    w_sk = rand((1, 1, 256, 128), 0.05, jnp.float32)
    s256 = rand((1, 256), 1.0, jnp.float32)
    nz256 = rand((256, 256), 0.01, jnp.float32)
    b128 = rand((128,), 0.1, jnp.float32)

    results["b256 skip 1x1-up (c256)"] = timed(
        "b256 skip 1x1-up 256->128 (c256)",
        lambda x: fused_packed_upconv2_c256(
            x, w_sk, None, f, None, None, float(np.sqrt(0.5)), 1.0,
            False, False),
        (x256,), args.steps)
    results["b256 conv0 2x-up (c256)"] = timed(
        "b256 conv0 2x-up 256->128 (c256)",
        lambda x: fused_packed_upconv2_c256(
            x, w_c0, s256, f, nz256, b128, float(np.sqrt(2.0)), 0.2,
            True, False),
        (x256,), args.steps)

    # conv1 at 256^2, 128ch: packed [1, 256, G=256, 128]
    xp256 = rand((1, 256, 256, 128))
    w_c1 = rand((3, 3, 128, 128), 0.05, jnp.float32)
    s128 = rand((1, 128), 1.0, jnp.float32)
    resid = rand((1, 256, 256, 128))
    results["b256 conv1 same-res"] = timed(
        "b256 conv1 128->128 @256^2 packed",
        lambda x: fused_modconv3x3_lrelu(
            x, w_c1, s128, nz256, b128,
            resid, float(np.sqrt(2.0)), 0.2, True, True),
        (xp256,), args.steps)

    # ---- b512 block (in packed [1,256,G=256,128] P=1; out P=2) ----
    w512_c0 = rand((3, 3, 128, 64), 0.05, jnp.float32)
    w512_sk = rand((1, 1, 128, 64), 0.05, jnp.float32)
    nz512 = rand((512, 512), 0.01, jnp.float32)
    b64 = rand((64,), 0.1, jnp.float32)
    results["b512 skip"] = timed(
        "b512 skip 1x1-up 128->64 packed",
        lambda x: fused_packed_upconv2(
            x, w512_sk, None, f, None, None, float(np.sqrt(0.5)), 1.0,
            False, False),
        (xp256,), args.steps)
    results["b512 conv0"] = timed(
        "b512 conv0 2x-up 128->64 packed",
        lambda x: fused_packed_upconv2(
            x, w512_c0, s128, f, nz512, b64, float(np.sqrt(2.0)), 0.2,
            True, False),
        (xp256,), args.steps)

    # conv1 at 512^2, 64ch: packed [1, 512, G=256, 128] (P=2)
    xp512 = rand((1, 512, 256, 128))
    w512_c1 = rand((3, 3, 64, 64), 0.05, jnp.float32)
    s64 = rand((1, 64), 1.0, jnp.float32)
    resid512 = rand((1, 512, 256, 128))
    results["b512 conv1"] = timed(
        "b512 conv1 64->64 @512^2 packed",
        lambda x: fused_modconv3x3_lrelu(
            x, w512_c1, s64, None, b64, resid512, float(np.sqrt(2.0)),
            0.2, True, True),
        (xp512,), args.steps)

    # ---- b1024 block (in packed [1,512,G=256,128] P=2; out P=4) ----
    w1k_c0 = rand((3, 3, 64, 32), 0.05, jnp.float32)
    nz1k = rand((1024, 1024), 0.01, jnp.float32)
    b32 = rand((32,), 0.1, jnp.float32)
    results["b1024 conv0"] = timed(
        "b1024 conv0 2x-up 64->32 packed",
        lambda x: fused_packed_upconv2(
            x, w1k_c0, s64, f, nz1k, b32, float(np.sqrt(2.0)), 0.2,
            True, False),
        (xp512,), args.steps)
    xp1k = rand((1, 1024, 256, 128))
    w1k_c1 = rand((3, 3, 32, 32), 0.05, jnp.float32)
    s32 = rand((1, 32), 1.0, jnp.float32)
    results["b1024 conv1"] = timed(
        "b1024 conv1 32->32 @1024^2 packed",
        lambda x: fused_modconv3x3_lrelu(
            x, w1k_c1, s32, None, b32, None, float(np.sqrt(2.0)),
            0.2, True, True),
        (xp1k,), args.steps)

    print("---- summary ----", flush=True)
    b256 = sum(v for k, v in results.items() if k.startswith("b256"))
    b512 = sum(v for k, v in results.items() if k.startswith("b512"))
    print(f"b256 ops total {b256:6.3f} ms | b512 ops total {b512:6.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
