"""Block-level forward attribution on the real chip (dev tool).

The projection headline is ~16.5 ms/step (fwd ~8 ms, bwd ~9 ms) but the
synthesis forward's pure-FLOP bound is ~1.5 ms on a v5e — this tool finds
where the rest goes. Channel counts depend only on resolution
(min(channel_max, channel_base/res)), so a lower-resolution flagship
config is a true PREFIX of the 1024^2 network: timing scan'd forwards at
img_resolution in {128, 256, 512, 1024} and taking deltas attributes the
per-block cost of the three packed high-res blocks; a transformer on/off
pair at 256 attributes the duplex-attention cost.

Axon measurement rules (tools/profile_r3.py): scalar-reducing scan
variants amortized over --steps iterations, params as traced args,
best-of-3 timed runs.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(tag, fn, n=3):
    fn()  # compile + warm
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag:<40s} {best * 1000:9.1f} ms", flush=True)
    return best * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--resolutions", type=int, nargs="+",
                    default=[128, 256, 512, 1024])
    args = ap.parse_args()

    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.models.generator import Generator

    results = {}

    def fwd_ms(res, transformer=True):
        cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16",
                                  img_resolution=res,
                                  transformer=transformer)
        model, variables = init_generator(cfg, seed=0, batch=1)
        ws = model.apply(variables, jnp.zeros((1, cfg.k, cfg.z_dim)),
                         truncation_psi=0.7, skip_w_avg_update=True,
                         method=Generator.run_mapping)

        @jax.jit
        def run(v, w0):
            def body(c, i):
                img, _ = model.apply(v, w0 + i * 1e-9, noise_mode="const",
                                     method=Generator.run_synthesis)
                return c, jnp.sum(img.astype(jnp.float32))
            return jax.lax.scan(body, 0.0, jnp.arange(args.steps))[1][-1]

        tag = f"synthesis fwd {res}^2 tr={int(transformer)} x{args.steps}"
        total = timed(tag, lambda: run(variables, ws))
        return total / args.steps

    for res in args.resolutions:
        results[res] = fwd_ms(res)
    # Transformer layers only exist at <=256^2 in the flagship config, so the
    # on/off pair runs at 256 when requested, else at the largest resolution
    # actually profiled.
    tr_res = 256 if 256 in results else max(results)
    no_tr = fwd_ms(tr_res, transformer=False)

    print("---- per-step attribution ----", flush=True)
    prev = None
    for res in args.resolutions:
        if prev is not None:
            print(f"block b{res} (delta {prev}->{res}): "
                  f"{results[res] - results[prev]:6.2f} ms", flush=True)
        prev = res
    print(f"synthesis fwd total @{prev}^2: {results[prev]:6.2f} ms",
          flush=True)
    print(f"transformer cost at <={tr_res} (on-off): "
          f"{results[tr_res] - no_tr:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
