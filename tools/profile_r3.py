"""Round-3 perf attribution on the real chip (dev tool).

Sections the 1024^2 projection step (the bench headline, 17.8 ms/step)
to find the next lever. Axon measurement rules learned the hard way:

- jit outputs are shipped to the host eagerly: a returned image bills a
  ~6 MB relay transfer against the measurement. Every timed jit here
  reduces to a SCALAR inside the jit.
- per-dispatch overhead is ~2 ms; single-op timings sit on that floor.
  The within-step attribution therefore uses SCAN VARIANTS (fwd-only /
  fwd+bwd / full step), each amortized over a 200-step scan, and takes
  deltas.
- params are traced arguments everywhere (closure-constant jits
  serialize ~0.5 GB executables, which the relay handles poorly).
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(tag, fn, n=50):
    fn()  # compile + warm
    fn()
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    float(out if isinstance(out, (int, float)) else jnp.sum(out))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{tag:<44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from morphganformer_tpu.losses.stack import build_loss_stack
    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.models.generator import Generator
    from morphganformer_tpu.projection.engine import (
        ProjectionConfig, _make_opt, _run_chunk_jit)

    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    print("config: ffhq1024 bf16", flush=True)
    t0 = time.perf_counter()
    model, variables = init_generator(cfg, seed=0, batch=1)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    loss_fn = build_loss_stack({"mse": 1.0})

    import numpy as np
    rng = np.random.RandomState(11)
    small = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    target = jax.image.resize(small, (1, 1024, 1024, 3), method="linear")

    # Dispatch-overhead floor: a trivial jit, one dispatch per iteration.
    triv = jax.jit(lambda x: jnp.sum(x * 2))
    timed("dispatch floor (trivial jit)", lambda: triv(z))

    # Single-dispatch sections (scalar in-jit; floor-polluted but useful).
    fwd = jax.jit(lambda v, zz: jnp.sum(model.apply(
        v, zz, truncation_psi=0.7, noise_mode="const")))
    timed("fwd(z) full -> scalar", lambda: fwd(variables, z))

    map_fn = jax.jit(lambda v, zz: jnp.sum(model.apply(
        v, zz, truncation_psi=0.7, skip_w_avg_update=True,
        method=Generator.run_mapping)))
    timed("mapping fwd -> scalar", lambda: map_fn(variables, z))

    ws_fn = jax.jit(lambda v, zz: model.apply(
        v, zz, truncation_psi=0.7, skip_w_avg_update=True,
        method=Generator.run_mapping))
    ws = ws_fn(variables, z)
    float(jnp.sum(ws))
    syn_fn = jax.jit(lambda v, w: jnp.sum(model.apply(
        v, w, noise_mode="const", method=Generator.run_synthesis)[0]))
    timed("synthesis fwd -> scalar", lambda: syn_fn(variables, ws))

    # Scan variants, 200 steps each, one dispatch per run: deltas give the
    # true device-side split of the 17.8 ms projection step.
    STEPS = 200

    def scan_of(body):
        f = jax.jit(lambda v, w0, tgt: jax.lax.scan(
            lambda c, i: body(v, c, i, tgt), w0, jnp.arange(STEPS))[1][-1])
        return f

    def fwd_only(v, w, i, tgt):
        img, _ = model.apply(v, w + i * 1e-9, noise_mode="const",
                             method=Generator.run_synthesis)
        return w, loss_fn(img, tgt)[0]

    def fwd_bwd(v, w, i, tgt):
        def f(ww):
            img, _ = model.apply(v, ww, noise_mode="const",
                                 method=Generator.run_synthesis)
            return loss_fn(img, tgt)[0]
        l, g = jax.value_and_grad(f)(w + i * 1e-9)
        return w - 0.0 * g, l

    f1 = scan_of(fwd_only)
    d1 = timed(f"scan fwd-only x{STEPS}", lambda: f1(variables, ws, target),
               n=3)
    f2 = scan_of(fwd_bwd)
    d2 = timed(f"scan fwd+bwd x{STEPS}", lambda: f2(variables, ws, target),
               n=3)

    pcfg = ProjectionConfig(steps=1000, chunk=1000)
    latent = jnp.zeros((1, cfg.k, cfg.z_dim))
    carry = (latent, _make_opt(pcfg).init(latent),
             jnp.full((1,), 1e30, jnp.float32), latent,
             jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(2))
    noise = jax.random.normal(jax.random.PRNGKey(3), (STEPS, *latent.shape))

    def full_step():
        _, (losses, _) = _run_chunk_jit(model, loss_fn, pcfg, variables,
                                        target, jnp.float32(23.0), carry,
                                        jnp.arange(STEPS), noise)
        return losses[-1]
    d3 = timed(f"scan full step x{STEPS}", full_step, n=3)

    print("---- attribution (per step) ----", flush=True)
    print(f"fwd:                 {d1/STEPS:6.2f} ms", flush=True)
    print(f"bwd (fwd+bwd - fwd): {(d2-d1)/STEPS:6.2f} ms", flush=True)
    print(f"opt/noise/best etc.: {(d3-d2)/STEPS:6.2f} ms", flush=True)
    print(f"full step:           {d3/STEPS:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
