#!/usr/bin/env python
"""Price the demod-chain dd reduction in the packed backwards (dev tool).

ROADMAP perf lever 3 proposes folding the dd reduction (pallas_conv.py
_modconv_bwd / _packed_upconv_bwd demod chains) into the adjoint kernels'
dot taps. Before writing that kernel change, this measures the ceiling:
the same 200-step fwd+bwd 1024^2 projection-shaped scan with the dd term
present vs compiled out (MGT_SKIP_DD trace-time gate — gradients are
wrong in the skip variant; we only read the clock).

Measurement rules per tools/profile_r3.py: scalars out of jits, params as
traced args, deltas between scan variants in ONE process, best-of-3.
Run alone on the TPU (single-client relay discipline), no timeout.
"""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".bench_cache"))

import jax
import jax.numpy as jnp


def timed(tag, fn, n=3):
    fn()  # compile + warm
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<36s} {best * 1000:9.1f} ms", flush=True)
    return best * 1000


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from morphganformer_tpu.losses.stack import build_loss_stack
    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.models.generator import Generator

    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    print("config: ffhq1024 bf16, 200-step fwd+bwd scan", flush=True)
    t0 = time.perf_counter()
    model, variables = init_generator(cfg, seed=0, batch=1)
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    loss_fn = build_loss_stack({"mse": 1.0})

    import numpy as np

    rng = np.random.RandomState(11)
    small = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    target = jax.image.resize(small, (1, 1024, 1024, 3), method="linear")

    ws = jax.jit(lambda v, zz: model.apply(
        v, zz, truncation_psi=0.7, skip_w_avg_update=True,
        method=Generator.run_mapping))(variables, z)
    float(jnp.sum(ws))

    STEPS = 200

    def make_scan():
        """Fresh jit wrapper: MGT_SKIP_DD is read when THIS traces."""

        def body(v, w, i, tgt):
            def f(ww):
                img, _ = model.apply(v, ww, noise_mode="const",
                                     method=Generator.run_synthesis)
                return loss_fn(img, tgt)[0]

            l, g = jax.value_and_grad(f)(w + i * 1e-9)
            return w - 0.0 * g, l

        return jax.jit(lambda v, w0, tgt: jax.lax.scan(
            lambda c, i: body(v, c, i, tgt), w0, jnp.arange(STEPS))[1][-1])

    os.environ["MGT_SKIP_DD"] = "0"
    f_with = make_scan()
    d_with = timed(f"fwd+bwd x{STEPS} (dd present)",
                   lambda: float(f_with(variables, ws, target)))

    os.environ["MGT_SKIP_DD"] = "1"
    f_skip = make_scan()
    d_skip = timed(f"fwd+bwd x{STEPS} (dd skipped)",
                   lambda: float(f_skip(variables, ws, target)))
    os.environ["MGT_SKIP_DD"] = "0"

    # Re-time the dd-present variant to bracket relay drift.
    d_with2 = timed(f"fwd+bwd x{STEPS} (dd present, re)",
                    lambda: float(f_with(variables, ws, target)))

    per_step = (min(d_with, d_with2) - d_skip) / STEPS
    print("---- dd demod-chain cost ----", flush=True)
    print(f"dd per step: {per_step:6.3f} ms "
          f"(lever-3 fusion ceiling)", flush=True)


if __name__ == "__main__":
    main()
