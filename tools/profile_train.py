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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_train")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--second-order", action="store_true",
                    help="route BOTH PL and R1 reg stages through the "
                    "packed second-order wrappers (sets "
                    "second_order._DEFAULT_REG_SECOND_ORDER all-True; "
                    "unlike MGT_PACKED_SECOND_ORDER=1 the main stages "
                    "keep the lean saved-residual backward). The "
                    "production default is off for both stages — see "
                    "ops/second_order.py::_DEFAULT_REG_SECOND_ORDER")
    ap.add_argument("--stages", action="store_true",
                    help="also time the four stages individually (their "
                    "executables are warmed BEFORE the full iteration: "
                    "after the big iteration executable has run, loading "
                    "any NEW program dies with a relay InvalidArgument — "
                    "HBM is exhausted at 1024^2 batch 4)")
    args = ap.parse_args()

    if args.second_order:
        from morphganformer_tpu.ops import second_order
        second_order._DEFAULT_REG_SECOND_ORDER = {"pl": True, "r1": True}
        print("second-order: reg stages route through the packed wrappers",
              flush=True)

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

    # Prepare EVERY stage input up front, host-side: after the heavy
    # train executables have run on the relay, even a tiny eager op
    # (rngs[0] slicing, real[0]) deterministically dies with a TPU
    # InvalidArgument — so nothing below the timing loops may trigger a
    # fresh eager dispatch.
    rng_np = np.random.RandomState(0)
    real = jnp.asarray(
        rng_np.randn(1, args.batch, args.res, args.res, 3), jnp.bfloat16)
    n_acc = trainer.n_accum if args.batch % trainer.n_accum == 0 else 1
    micro = args.batch // n_acc
    z_st = jnp.asarray(rng_np.randn(n_acc, micro, g_cfg.k, g_cfg.z_dim),
                       jnp.float32)
    realm = jnp.asarray(np.asarray(
        rng_np.randn(n_acc, micro, args.res, args.res, 3)), jnp.bfloat16)
    rngs = [jax.random.PRNGKey(40 + j) for j in range(4)]

    def step(state, i):
        return trainer.train_iteration(state, real[0] + i * 1e-6,
                                       jax.random.PRNGKey(2), step=0)

    # Every stage jit donates `state`, so each call consumes its input
    # state and the tool must thread the returned one through.
    def stage_fns():
        return [
            ("G_main", lambda st: trainer.g_main_step(st, z_st, None,
                                                      rngs[0])[0]),
            ("G_reg", lambda st: trainer.g_reg_step(st, z_st, None,
                                                    rngs[1])[0]),
            ("D_main", lambda st: trainer.d_main_step(st, realm, z_st,
                                                      None, rngs[2])[0]),
            ("D_reg", lambda st: trainer.d_reg_step(st, realm, None)[0]),
            ("EMA", lambda st: trainer.ema_step(st)),
        ]

    if args.stages:
        # Stage-only mode: never load the full-iteration executable in
        # this process — HBM at 1024^2 batch 4 cannot hold both (the
        # second load dies with a relay InvalidArgument).
        t0 = time.perf_counter()
        for tag, fn in stage_fns():
            state = fn(state)
            float(jnp.sum(state["pl_mean"]))
        print(f"stage compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)

    if not args.stages:
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
        print(f"train iteration (all stages every step): {dt*1000:.1f} ms "
              f"({args.batch/dt:.2f} imgs/s)", flush=True)
        for k, v in stats.items():
            print(f"  {k}: {float(jnp.mean(v)):.4f}", flush=True)

    if not args.stages:
        return

    # Per-stage timing + the honest amortized step (G_reg every 4 steps,
    # D_reg every 16 — reference run_network.py lazy regularization).
    # Stage executables were compiled and warmed up top.
    def timed(tag, fn, reps=args.reps):
        nonlocal_state = [state]

        def call():
            nonlocal_state[0] = fn(nonlocal_state[0])

        call()
        float(jnp.sum(nonlocal_state[0]["pl_mean"]))
        t0 = time.perf_counter()
        for _ in range(reps):
            call()
        float(jnp.sum(nonlocal_state[0]["pl_mean"]))
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"  {tag:<10s} {ms:8.1f} ms", flush=True)
        return ms, nonlocal_state[0]

    parts = {}
    for tag, fn in stage_fns():
        parts[tag], state = timed(tag, fn)
    gi = float(cfg.g_reg_interval or 1)
    di = float(cfg.d_reg_interval or 1)
    amort = (parts["G_main"] + parts["D_main"] + parts["EMA"]
             + parts["G_reg"] / gi + parts["D_reg"] / di)
    print(f"amortized step (G_reg/{int(gi)}, D_reg/{int(di)}): "
          f"{amort:.1f} ms ({args.batch*1000/amort:.2f} imgs/s)", flush=True)


if __name__ == "__main__":
    main()
