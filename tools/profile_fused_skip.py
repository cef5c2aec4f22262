"""On-chip A/B of the fused skip+conv0 resnet launch (dev tool).

Times the flagship 1024^2 projection-step scan (fwd+bwd wrt the latent,
200 steps, scalar-reducing — the axon measurement rules of
tools/profile_r3.py) with MGT_FUSED_SKIP off vs on, within ONE process
(separate jit closures trace under each env setting; the gate is read at
trace time). Also times fwd-only scans for the split.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, n=3):
    t0 = time.perf_counter()
    float(fn())   # compile + warm
    print(f"{tag:<40s} compile {time.perf_counter()-t0:6.1f}s", flush=True)
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag:<40s} {best*1000:8.1f} ms total", flush=True)
    return best * 1000


def main():
    from morphganformer_tpu.losses.stack import build_loss_stack
    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.models.generator import Generator

    steps = int(os.environ.get("STEPS", "200"))
    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    model, variables = init_generator(cfg, seed=0, batch=1)
    loss_fn = build_loss_stack({"mse": 1.0})
    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    rng = np.random.RandomState(11)
    small = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    target = jax.image.resize(small, (1, 1024, 1024, 3), method="linear")

    ws = jax.jit(lambda v, zz: model.apply(
        v, zz, truncation_psi=0.7, skip_w_avg_update=True,
        method=Generator.run_mapping))(variables, z)
    float(jnp.sum(ws))

    def make_scans():
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

        def scan_of(body):
            return jax.jit(lambda v, w0, tgt: jax.lax.scan(
                lambda c, i: body(v, c, i, tgt), w0,
                jnp.arange(steps))[1][-1])
        return scan_of(fwd_only), scan_of(fwd_bwd)

    results = {}
    for setting in ("0", "1"):
        os.environ["MGT_FUSED_SKIP"] = setting
        f1, f2 = make_scans()   # fresh closures -> fresh traces under env
        tag = f"fused_skip={setting}"
        d1 = timed(f"{tag} fwd-only x{steps}",
                   lambda: f1(variables, ws, target))
        d2 = timed(f"{tag} fwd+bwd  x{steps}",
                   lambda: f2(variables, ws, target))
        results[setting] = (d1, d2)
        print(f"{tag}: fwd {d1/steps:6.3f} ms  bwd {(d2-d1)/steps:6.3f} ms"
              f"  fwd+bwd {d2/steps:6.3f} ms/step", flush=True)

    d_off, d_on = results["0"][1], results["1"][1]
    print(f"---- fwd+bwd delta: {(d_off-d_on)/steps:+6.3f} ms/step "
          f"({d_off/d_on:5.3f}x) ----", flush=True)


if __name__ == "__main__":
    main()
