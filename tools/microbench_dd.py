#!/usr/bin/env python
"""Microbench the demod-chain dd formulations at the real layer shapes.

profile_dd.py priced the whole dd chain at 2.5 ms/step (original
three-reduction form) and 3.3 ms/step (single fused reshape-of-broadcast
form — WORSE: XLA materializes the merged broadcast). This times each
candidate formulation in isolation, amortized over a fori_loop, at the
1024^2 conv1 packed shape (the largest dd site: [1,1024,256,128] bf16,
pack=4, o=32, batch-shared noise + bias).

Run alone on the TPU. Compiles are tiny (seconds each).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".bench_cache"))

import jax
import jax.numpy as jnp

f32 = jnp.float32
N, H, WG, PACK, O = 1, 1024, 256, 4, 32
LANES = PACK * O
ITERS = 100


def lane_reduce(t):
    part = jnp.sum(t.reshape(N, H * WG, PACK * O), axis=1)
    return jnp.sum(part.reshape(N, PACK, O), axis=1)


def dd_original(g, y, nz, bias, d):
    g_pre = g * jnp.asarray(1.41, g.dtype)        # stand-in mask mult
    dd = lane_reduce(g.astype(f32) * y.astype(f32))
    gp5 = g_pre.astype(f32).reshape(N, H, WG, PACK, O)
    dd = dd - jnp.einsum("nhgpo,hgp->no", gp5, nz.reshape(H, WG, PACK))
    dd = dd - bias.astype(f32)[None] * lane_reduce(g_pre.astype(f32))
    return dd / d


def dd_fused_bcast(g, y, nz, bias, d):
    g_pre = g * jnp.asarray(1.41, g.dtype)
    t = g.astype(f32) * y.astype(f32)
    sub = jnp.broadcast_to(nz.reshape(1, H, WG, PACK, 1),
                           (1, H, WG, PACK, O)).reshape(1, H, WG, LANES)
    sub = sub + jnp.tile(bias.astype(f32), PACK)
    t = t - g_pre.astype(f32) * sub
    return lane_reduce(t) / d


def dd_fused_nzp(g, y, nzp, bias, d):
    """nzp: packed-broadcast noise ALREADY materialized (fwd residual)."""
    g_pre = g * jnp.asarray(1.41, g.dtype)
    t = (g.astype(f32) * y.astype(f32)
         - g_pre.astype(f32) * (nzp.astype(f32)
                                + jnp.tile(bias.astype(f32), PACK)))
    return lane_reduce(t) / d


def dd_fused_nzp_bf16(g, y, nzp, bias, d):
    """Subtraction in bf16 before one f32 reduce (halves read traffic)."""
    g_pre = g * jnp.asarray(1.41, g.dtype)
    sub = nzp + jnp.tile(bias, PACK).astype(nzp.dtype)
    t = g.astype(f32) * y.astype(f32) - g_pre.astype(f32) * sub.astype(f32)
    return lane_reduce(t) / d


def dd_gy_only(g, y, nz, bias, d):
    """Floor: just the g*y reduction (what in-kernel taps can't avoid)."""
    return lane_reduce(g.astype(f32) * y.astype(f32)) / d


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (N, H, WG, LANES), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(1), (N, H, WG, LANES),
                          jnp.bfloat16)
    nz = jax.random.normal(jax.random.PRNGKey(2), (H, WG * PACK), f32)
    nzp = jnp.broadcast_to(
        nz.reshape(H, WG, PACK, 1), (H, WG, PACK, O)).reshape(
            H, WG, LANES).astype(jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(3), (O,), f32)
    d = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (N, O), f32)) + 0.5

    def bench(name, fn, *extra):
        @jax.jit
        def loop(g, y, d, *extra):
            def body(i, acc):
                gi = g * (1 + i * jnp.asarray(1e-9, g.dtype))
                return acc + jnp.sum(fn(gi, y, *extra, d))
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        float(loop(g, y, d, *extra))          # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(g, y, d, *extra))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:<28s} {best / ITERS * 1000:8.3f} ms/call", flush=True)

    print(f"shape [{N},{H},{WG},{LANES}] bf16, pack={PACK}, o={O}",
          flush=True)
    bench("gy_only (floor)", dd_gy_only, nz, bias)
    bench("original (3 reductions)", dd_original, nz, bias)
    bench("fused_bcast (reshape)", dd_fused_bcast, nz, bias)
    bench("fused_nzp (saved bf16)", dd_fused_nzp, nzp, bias)
    bench("fused_nzp_bf16_sub", dd_fused_nzp_bf16, nzp, bias)


if __name__ == "__main__":
    main()
