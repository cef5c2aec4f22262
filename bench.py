"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: 1024^2 GANformer generation throughput (images/sec/chip) on the
flagship FFHQ-1024 config. The reference publishes no numbers
(BASELINE.json "published": {}), so vs_baseline reports the measured value.

Note: on the axon TPU platform `block_until_ready()` returns before device
completion; a scalar device->host fetch is the only reliable sync, so every
timed step ends in `float(...)` of an on-device reduction.
"""

import json
import time

import jax
import jax.numpy as jnp


def bench_generation(batch=4, iters=8, warmup=2):
    from morphganformer_tpu.models import ffhq1024_config, init_generator

    cfg = ffhq1024_config()
    model, variables = init_generator(cfg, seed=0, batch=batch)

    @jax.jit
    def forward_sum(variables, z):
        img = model.apply(variables, z, truncation_psi=0.7, noise_mode="const")
        return jnp.sum(img)

    zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, cfg.k, cfg.z_dim))
          for i in range(iters + warmup)]
    for i in range(warmup):
        float(forward_sum(variables, zs[i]))
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        float(forward_sum(variables, zs[i]))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    imgs_per_sec = bench_generation()
    print(json.dumps({
        "metric": "gen_1024_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec, 3),  # no published reference number
    }))


if __name__ == "__main__":
    main()
