"""Round-2 perf attribution on the real chip (dev tool).

Breaks the 1024^2 projection step into mapping / synthesis / loss+opt
pieces to size the round-2 levers (mapping fusion, scan-body trim, fused
pallas epilogue). One process, one section at a time; every timed region
ends in a scalar device->host fetch (axon block_until_ready is a no-op).
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(tag, fn, n=20):
    fn()  # compile + warm
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    # scalar fetch forces completion
    float(out if isinstance(out, (int, float)) else jnp.sum(out))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{tag:<40s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from morphganformer_tpu.losses.stack import build_loss_stack
    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.models.generator import Generator
    from morphganformer_tpu.projection.engine import (
        ProjectionConfig, make_projection_step)

    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    print("config: ffhq1024 bf16", flush=True)
    t0 = time.perf_counter()
    model, variables = init_generator(cfg, seed=0, batch=1)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    loss_fn = build_loss_stack({"mse": 1.0})

    fwd = jax.jit(lambda zz: model.apply(variables, zz, truncation_psi=0.7,
                                         noise_mode="const"))
    target = fwd(z)
    float(jnp.sum(target))

    # 1. forward only
    timed("fwd(z) full", lambda: fwd(z))

    # 2. mapping only (fwd)
    map_fn = jax.jit(lambda zz: model.apply(
        variables, zz, truncation_psi=0.7, skip_w_avg_update=True,
        method=Generator.run_mapping))
    ws = map_fn(z)
    float(jnp.sum(ws))
    timed("mapping fwd", lambda: map_fn(z))

    # 3. synthesis only (fwd)
    syn_fn = jax.jit(lambda w: model.apply(
        variables, w, noise_mode="const", method=Generator.run_synthesis)[0])
    timed("synthesis fwd", lambda: syn_fn(ws))

    # 4. value_and_grad wrt z (full)
    @jax.jit
    def vg_full(lat):
        def f(l):
            img = model.apply(variables, l, truncation_psi=0.7,
                              noise_mode="const")
            return loss_fn(img, target)[0]
        return jax.value_and_grad(f)(lat)[0]
    timed("val+grad wrt z (full)", lambda: vg_full(z))

    # 5. value_and_grad wrt ws (synthesis only)
    @jax.jit
    def vg_syn(w):
        def f(ww):
            img = model.apply(variables, ww, noise_mode="const",
                              method=Generator.run_synthesis)[0]
            return loss_fn(img, target)[0]
        return jax.value_and_grad(f)(w)[0]
    timed("val+grad wrt ws (synthesis)", lambda: vg_syn(ws))

    # 6. full projection scan step (adam + best tracking + noise)
    pcfg = ProjectionConfig(steps=1000)
    opt, step_fn = make_projection_step(model, variables, loss_fn, pcfg,
                                        jnp.float32(23.0), target)
    latent = jnp.tile(jnp.zeros((cfg.k, cfg.z_dim))[None], (1, 1, 1))
    carry = (latent, opt.init(latent), jnp.full((1,), 1e30, jnp.float32),
             latent, jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(2))

    @jax.jit
    def run25(carry, noise):
        return jax.lax.scan(step_fn, carry, (jnp.arange(25), noise))[0][2]

    noise = jax.random.normal(jax.random.PRNGKey(3), (25, *latent.shape))
    dt = timed("scan step x25 (/25 => per-step)",
               lambda: run25(carry, noise), n=4)
    print(f"per scan step: {dt/25:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
