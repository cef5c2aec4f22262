#!/usr/bin/env python
"""A/B the b256 block packed vs unpacked in the full 1024^2 step (dev tool).

profile_fwd_blocks + profile_b256 show the packed b256 block costs
~2.9 ms fwd in-model while plain XLA runs the same block in ~0.9 ms —
at 256^2 the NHWC C>=128 layouts are already MXU-friendly, so packing
only pays where narrow lanes (C<128) would otherwise relayout. But the
projection headline is fwd+bwd; this prices both, same-process, via the
MGT_PACKED_B256 trace-time gate (the unpacked b256 output is pixel NHWC
[B,256,256,128], which IS the b512 packed entry form, so the chain just
starts one block later).

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
# Scratch compile cache (NOT the committed .bench_cache): reruns of this
# tool skip recompiles without dirtying the shipped bench cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_b256")

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, n=3):
    fn()  # compile + warm
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

    from morphganformer_tpu.losses.stack import build_loss_stack
    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.models.generator import Generator

    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    print("config: ffhq1024 bf16, 200-step scans", flush=True)
    model, variables = init_generator(cfg, seed=0, batch=1)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    loss_fn = build_loss_stack({"mse": 1.0})
    rng = np.random.RandomState(11)
    small = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    target = jax.image.resize(small, (1, 1024, 1024, 3), method="linear")

    ws = jax.jit(lambda v, zz: model.apply(
        v, zz, truncation_psi=0.7, skip_w_avg_update=True,
        method=Generator.run_mapping))(variables, z)
    float(jnp.sum(ws))

    STEPS = 200

    def make_fwd():
        def body(c, i, v, w):
            img, _ = model.apply(v, w + i * 1e-9, noise_mode="const",
                                 method=Generator.run_synthesis)
            return c, jnp.sum(img.astype(jnp.float32))
        return jax.jit(lambda v, w0: jax.lax.scan(
            lambda c, i: body(c, i, v, w0), 0.0, jnp.arange(STEPS))[1][-1])

    def make_fwdbwd():
        def body(v, w, i, tgt):
            def f(ww):
                img, _ = model.apply(v, ww, noise_mode="const",
                                     method=Generator.run_synthesis)
                return loss_fn(img, tgt)[0]
            l, g = jax.value_and_grad(f)(w + i * 1e-9)
            return w - 0.0 * g, l
        return jax.jit(lambda v, w0, tgt: jax.lax.scan(
            lambda c, i: body(v, c, i, tgt), w0, jnp.arange(STEPS))[1][-1])

    res = {}
    for flag in ("1", "0", "1re"):
        val = flag[0]
        os.environ["MGT_PACKED_B256"] = val
        tag = {"1": "b256 packed", "0": "b256 unpacked",
               "1re": "b256 packed (re)"}[flag]
        if flag == "1re":
            f_fwd, f_fb = res["1"]["fns"]
        else:
            f_fwd, f_fb = make_fwd(), make_fwdbwd()
        t_fwd = timed(f"fwd x{STEPS} ({tag})",
                      lambda: float(f_fwd(variables, ws)))
        t_fb = timed(f"fwd+bwd x{STEPS} ({tag})",
                     lambda: float(f_fb(variables, ws, target)))
        res[flag] = {"fwd": t_fwd, "fb": t_fb, "fns": (f_fwd, f_fb)}

    os.environ["MGT_PACKED_B256"] = "1"
    packed_fb = min(res["1"]["fb"], res["1re"]["fb"])
    packed_fwd = min(res["1"]["fwd"], res["1re"]["fwd"])
    print("---- b256 packed-vs-unpacked (per step) ----", flush=True)
    print(f"fwd:     packed {packed_fwd/STEPS:6.3f} ms | "
          f"unpacked {res['0']['fwd']/STEPS:6.3f} ms", flush=True)
    print(f"fwd+bwd: packed {packed_fb/STEPS:6.3f} ms | "
          f"unpacked {res['0']['fb']/STEPS:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
