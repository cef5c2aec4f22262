#!/usr/bin/env python
"""Price the packed kernels' WEIGHT gradients (training path) on-chip.

The packed custom VJPs compute dw via XLA weight-grad convs/einsums in
f32 (_modconv_bwd 9-tap einsums, _packed_upconv_bwd / _dconv_bwd
jax.vjp of the unpacked composition) — the one part of the training
backward that never got a pallas treatment. This times a 1024^2 batch-1
params-grad scan (G-side, MSE head, every param differentiated — the
G_main training stage's gradient structure) with the dw terms present
vs compiled out (MGT_SKIP_DW trace-time gate; grads WRONG in the skip
variant, clock only).

Measurement rules per tools/profile_r3.py: one process, two traces,
re-time the first variant to bracket relay drift, best-of-3, no timeout.
"""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_dw")

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, n=3):
    fn()
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<44s} {best * 1000:9.1f} ms", flush=True)
    return best * 1000


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.models.generator import Generator

    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    STEPS = 50
    print(f"config: ffhq1024 bf16 batch 1, {STEPS}-step params-grad scan",
          flush=True)
    model, variables = init_generator(cfg, seed=0, batch=1)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    rng = np.random.RandomState(11)
    small = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    target = jax.image.resize(small, (1, 1024, 1024, 3), method="linear")

    def make_scan():
        def body(p, i, tgt, zz):
            def f(pp):
                img = model.apply(dict(rest, params=pp), zz + i * 1e-9,
                                  truncation_psi=0.7, noise_mode="const")
                return jnp.mean(jnp.square(img.astype(jnp.float32) - tgt))

            l, g = jax.value_and_grad(f)(p)
            return jax.tree.map(lambda a, b: a - 0.0 * b, p, g), l

        return jax.jit(lambda p0, tgt, zz: jax.lax.scan(
            lambda c, i: body(c, i, tgt, zz), p0, jnp.arange(STEPS))[1][-1])

    os.environ["MGT_SKIP_DW"] = "0"
    f_with = make_scan()
    d_with = timed(f"fwd+params-bwd x{STEPS} (dw present)",
                   lambda: float(f_with(params, target, z)))

    os.environ["MGT_SKIP_DW"] = "1"
    f_skip = make_scan()
    d_skip = timed(f"fwd+params-bwd x{STEPS} (dw skipped)",
                   lambda: float(f_skip(params, target, z)))
    os.environ["MGT_SKIP_DW"] = "0"

    d_with2 = timed(f"fwd+params-bwd x{STEPS} (dw present, re)",
                    lambda: float(f_with(params, target, z)))

    per_step = (min(d_with, d_with2) - d_skip) / STEPS
    print("---- packed-kernel dw cost ----", flush=True)
    print(f"with dw: {min(d_with, d_with2)/STEPS:7.2f} ms/step | "
          f"without: {d_skip/STEPS:7.2f} ms/step | "
          f"dw cost: {per_step:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
