"""On-chip 1024^2 training-step timing (dev tool).

Times the four jitted stages (G_main / G_reg / D_main / D_reg) of a full
adversarial train iteration on the flagship ffhq1024 config at batch
`--batch` (default 4), with the packed D tower on or off
(MGT_PACKED_D) — run twice to A/B:

    MGT_PACKED_D=0 python tools/profile_train.py
    python tools/profile_train.py

Axon measurement rules (see tools/profile_r3.py): one process per
configuration, scalar fetch to sync, n>=10 reps after warm.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--res", type=int, default=1024)
    args = ap.parse_args()

    from morphganformer_tpu.models import ffhq1024_config
    from morphganformer_tpu.models.config import DiscriminatorConfig
    from morphganformer_tpu.training.train_step import GANTrainer, TrainConfig

    g_cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16",
                                img_resolution=args.res)
    d_cfg = DiscriminatorConfig(img_resolution=args.res, dtype="bfloat16")
    cfg = TrainConfig(batch_size=args.batch, batch_gpu=args.batch)
    trainer = GANTrainer(g_cfg, d_cfg, cfg)

    print(f"config: {args.res}^2 batch {args.batch} bf16 "
          f"packed_d={os.environ.get('MGT_PACKED_D', '1')}", flush=True)
    t0 = time.perf_counter()
    state = trainer.init_state(seed=0)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    real = jax.random.normal(
        jax.random.PRNGKey(0),
        (1, args.batch, args.res, args.res, 3), jnp.bfloat16)

    def step(state, i):
        return trainer.train_iteration(state, real[0] + i * 1e-6,
                                       jax.random.PRNGKey(2), step=0)

    t0 = time.perf_counter()
    state, stats = step(state, 0)
    float(jnp.sum(state["pl_mean"]))
    print(f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    state, stats = step(state, 1)
    float(jnp.sum(state["pl_mean"]))

    t0 = time.perf_counter()
    for i in range(args.reps):
        state, stats = step(state, i)
    float(jnp.sum(state["pl_mean"]))
    dt = (time.perf_counter() - t0) / args.reps
    print(f"train iteration: {dt*1000:.1f} ms "
          f"({args.batch/dt:.2f} imgs/s)", flush=True)
    for k, v in stats.items():
        print(f"  {k}: {float(jnp.mean(v)):.4f}", flush=True)


if __name__ == "__main__":
    main()
