"""Round-5 roofline follow-up: is the forward epilogue launch really
~2.5x slower per byte than the adjoint launch?

tools/roofline.py measured modconv1024 b4 32ch fwd at 3.70 ms (146 GB/s
effective) but fwd+adj at 5.19 ms — an adjoint INCREMENTAL of 1.49 ms
for ~2x the forward's byte traffic. This script separates the two
launches cleanly:

  fwd-alone : jit(scan) of y = modconv(x), y -> x carry
  adj-alone : jit(scan) of g -> dx over a prebuilt jax.vjp closure
              (residuals constant across iterations)

and sweeps the geometries the anchors care about. If adj-alone really
streams several x better, the forward kernel's pipeline (DMA split /
tile height) is the next kernel target; if not, the roofline
incremental was an artifact of XLA overlapping the two launches inside
one program (worth knowing too — it would mean per-launch gaps, not
in-kernel schedule, bound the forward).

Usage: python tools/profile_fwd_vs_adj.py [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_fva")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(run, x, reps):
    out = run(x)
    float(jnp.sum(out))
    out = run(x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    reps, n = args.reps, args.batch

    from morphganformer_tpu.ops.pallas_conv import fused_modconv3x3_lrelu

    rng = np.random.RandomState(0)
    for h, c in ((1024, 32), (512, 64)):
        pack = 128 // c
        x0 = jnp.asarray(rng.randn(n, h, h // pack, 128), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
        s = jnp.asarray(rng.randn(n, c), jnp.float32)
        nz = jnp.asarray(rng.randn(h, h), jnp.float32)

        def op(xx):
            return fused_modconv3x3_lrelu(xx, w, s, nz, None, None,
                                          np.sqrt(2.0), 0.2, True, True)

        # fwd-alone
        @jax.jit
        def run_fwd(xx):
            def body(cx, _):
                return op(cx), None
            y, _ = jax.lax.scan(body, xx, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        ms_f = timeit(run_fwd, x0, reps)

        # adj-alone: vjp closure built once per trace; scan over g -> dx.
        @jax.jit
        def run_adj(xx):
            _, vjp_fn = jax.vjp(op, xx)

            def body(g, _):
                (dx,) = vjp_fn(g)
                return dx.astype(g.dtype), None

            g0 = jnp.ones_like(xx)
            dx, _ = jax.lax.scan(body, g0, None, length=reps)
            return jnp.sum(dx.astype(jnp.float32))

        ms_a = timeit(run_adj, x0, reps)

        # fwd+adj in one program (the roofline combo, for reference)
        @jax.jit
        def run_both(xx):
            def body(cx, _):
                dx = jax.grad(lambda t: jnp.sum(op(t).astype(jnp.float32)))(cx)
                return dx.astype(cx.dtype), None

            y, _ = jax.lax.scan(body, xx, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        ms_b = timeit(run_both, x0, reps)

        el = 2
        x_b = n * h * h * c * el
        nz_b = h * h * 4
        fwd_bytes = 2 * x_b + nz_b            # x in, y out
        adj_bytes = 3 * x_b + nz_b            # g in, y (mask+dd), dx out
        print(f"modconv{h} {c}ch b{n}: fwd {ms_f:.3f} ms "
              f"({fwd_bytes/ms_f/1e6:.0f} GB/s) | adj {ms_a:.3f} ms "
              f"({adj_bytes/ms_a/1e6:.0f} GB/s) | fwd+adj one-program "
              f"{ms_b:.3f} ms (sum-of-parts {ms_f + ms_a:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
