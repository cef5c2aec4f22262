"""Profile the flagship 1024^2 projection step on the TPU (dev tool)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main(res=1024):
    import dataclasses
    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.losses.stack import build_loss_stack

    cfg = ffhq1024_config()
    if res != 1024:
        cfg = dataclasses.replace(cfg, img_resolution=res)
    print(f"res={cfg.img_resolution}", flush=True)
    t0 = time.perf_counter()
    model, variables = init_generator(cfg, seed=0, batch=1)
    print("init: %.1f s" % (time.perf_counter() - t0), flush=True)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    fwd = jax.jit(lambda zz: model.apply(variables, zz, truncation_psi=0.7,
                                         noise_mode="const"))
    t0 = time.perf_counter()
    target = fwd(z)
    float(jnp.sum(target))
    print("fwd compile+run: %.1f s" % (time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    float(jnp.sum(fwd(z)))
    print("fwd run: %.3f s" % (time.perf_counter() - t0), flush=True)

    loss_fn = build_loss_stack({"mse": 1.0})

    @jax.jit
    def val_grad(lat):
        def f(l):
            img = model.apply(variables, l, truncation_psi=0.7,
                              noise_mode="const")
            return loss_fn(img, target)[0]
        return jax.value_and_grad(f)(lat)

    t0 = time.perf_counter()
    v, g = val_grad(z)
    float(v)
    print("fwd+bwd compile+run: %.1f s, loss=%.6f" %
          (time.perf_counter() - t0, float(v)), flush=True)

    t0 = time.perf_counter()
    for _ in range(10):
        v, g = val_grad(z)
    float(v)
    float(jnp.sum(g))
    dt = time.perf_counter() - t0
    print("10 fwd+bwd steps: %.2f s (%.0f ms/step)" % (dt, dt * 100), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
