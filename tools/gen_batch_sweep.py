#!/usr/bin/env python
"""On-chip generation batch sweep (ROADMAP perf lever 1).

Measures forward-only 1024^2 bf16 generation throughput (imgs/s) at a
range of batch sizes on the real chip, to pick bench_generation's batch.
Round-3 datapoint: batch-4 forward is 5.8 ms/img vs 8.4 ms at batch 1 —
HBM has headroom for more at bf16.

Run with NOTHING else using the TPU (single-client relay discipline —
ROADMAP infrastructure notes), and WITHOUT a timeout: each new batch size
is a fresh executable whose remote compile can take minutes; the
persistent cache in .bench_cache/ makes repeats fast.

  python tools/gen_batch_sweep.py               # batches 1 2 4 8 16
  python tools/gen_batch_sweep.py --batches 4 8 --iters 25
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".bench_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--iters", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from morphganformer_tpu.models import ffhq1024_config, init_generator

    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    results = {}
    for batch in args.batches:
        model, variables = init_generator(cfg, seed=0, batch=batch)
        z = jax.random.normal(jax.random.PRNGKey(0),
                              (batch, cfg.k, cfg.z_dim))

        @jax.jit
        def loop(variables, z, n):
            def body(i, acc):
                img = model.apply(variables, z + i * 1e-6,
                                  truncation_psi=0.7, noise_mode="const")
                return acc + img[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        t0 = time.perf_counter()
        float(loop(variables, z, 2))   # compile+warm; scalar fetch = sync
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(variables, z, args.iters))
        dt = time.perf_counter() - t0
        rate = batch * args.iters / dt
        results[batch] = round(rate, 1)
        print(json.dumps({"batch": batch, "imgs_per_sec": round(rate, 1),
                          "ms_per_img": round(1000 * dt / (batch * args.iters), 2),
                          "compile_or_load_s": round(compile_s, 1)}),
              flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"best_batch": best, "best_imgs_per_sec": results[best],
                      "all": results}), flush=True)


if __name__ == "__main__":
    main()
