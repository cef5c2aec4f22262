"""Round-5 tile-height / VMEM-budget sweep for the packed kernels.

The roofline table (ROADMAP round 5) showed every launch at <= 38% of
HBM peak and ~40% raw-lane MXU, and the launch-separation A/B
(tools/profile_fwd_vs_adj.py) showed the fwd and adj launches each
individually slow — not one anomalous side. The tile picker
(_pick_tile_h_mod) budgets 10 MB of VMEM, which at 1024^2 forces
tile_h=8 (512 tile steps per launch; v5e VMEM is 128 MB). This sweep
times the production fwd and fwd+adj launches at several
MGT_VMEM_BUDGET_MB values IN ONE PROCESS (the env var is read at trace
time; each budget gets a fresh jit) to find the streaming-optimal tile
height.

Usage: python tools/profile_tile_budget.py [--budgets 10 24 48 80]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_tile")

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
    ap.add_argument("--budgets", type=int, nargs="*",
                    default=[10, 24, 48, 80])
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    reps, n = args.reps, args.batch

    from morphganformer_tpu.ops import pallas_conv as pc

    rng = np.random.RandomState(0)
    geos = ((1024, 32), (512, 64))
    data = {}
    for h, c in geos:
        pack = 128 // c
        data[(h, c)] = (
            jnp.asarray(rng.randn(n, h, h // pack, 128), jnp.bfloat16),
            jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(n, c), jnp.float32),
            jnp.asarray(rng.randn(h, h), jnp.float32))

    for budget in args.budgets:
        os.environ["MGT_VMEM_BUDGET_MB"] = str(budget)
        for h, c in geos:
            x0, w, s, nz = data[(h, c)]
            pack = 128 // c
            tile = pc._pick_tile_h_mod(h, 128, 128, h // pack, True)

            def op(xx, w=w, s=s, nz=nz):
                return pc.fused_modconv3x3_lrelu(
                    xx, w, s, nz, None, None, np.sqrt(2.0), 0.2, True, True)

            @jax.jit
            def run_fwd(xx, _b=budget, _h=h):   # unique trace per budget
                def body(cx, _):
                    return op(cx), None
                y, _ = jax.lax.scan(body, xx, None, length=reps)
                return jnp.sum(y.astype(jnp.float32)) + 0.0 * _b

            @jax.jit
            def run_both(xx, _b=budget, _h=h):
                def body(cx, _):
                    dx = jax.grad(
                        lambda t: jnp.sum(op(t).astype(jnp.float32)))(cx)
                    return dx.astype(cx.dtype), None
                y, _ = jax.lax.scan(body, xx, None, length=reps)
                return jnp.sum(y.astype(jnp.float32))

            try:
                ms_f = timeit(run_fwd, x0, reps)
                ms_b = timeit(run_both, x0, reps)
            except Exception as e:
                print(f"budget {budget} MB modconv{h} {c}ch: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
                continue
            el_b = 2 * n * h * h * c * 2 + h * h * 4
            print(f"budget {budget:3d} MB modconv{h} {c}ch tile_h={tile:3d}: "
                  f"fwd {ms_f:.3f} ms ({el_b/ms_f/1e6:.0f} GB/s) | "
                  f"fwd+adj {ms_b:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
