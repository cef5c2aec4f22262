"""Focused on-chip timing of ONE reg stage (G_reg/PL or D_reg/R1) at the
production config, for remat / second-order A/Bs (round 4).

One process per configuration (axon measurement rules). Examples:

    python tools/profile_reg.py --stage pl
    MGT_PL_REMAT=dots_nobatch python tools/profile_reg.py --stage pl
    MGT_R1_REMAT=nothing      python tools/profile_reg.py --stage r1
    MGT_PACKED_SECOND_ORDER=1 python tools/profile_reg.py --stage r1 \
        --second-order-stage r1   # scoped-route A/B for one stage only

Baselines (fresh-process bench, round 4): G_reg 341 ms, D_reg 499 ms at
1024^2 batch 4 bf16 (amortized /4 and /16 in the train step).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prof_cache_reg")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["pl", "r1"], required=True)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--second-order-stage", choices=["pl", "r1"],
                    help="route ONLY this stage through the scoped "
                         "second-order wrappers (ops/second_order.py)")
    args = ap.parse_args()

    if args.second_order_stage:
        from morphganformer_tpu.ops import second_order
        second_order._DEFAULT_REG_SECOND_ORDER = {
            "pl": args.second_order_stage == "pl",
            "r1": args.second_order_stage == "r1"}
        print(f"second-order scoped route ON for {args.second_order_stage}",
              flush=True)
    print(f"env: MGT_PL_REMAT={os.environ.get('MGT_PL_REMAT', '')!r} "
          f"MGT_R1_REMAT={os.environ.get('MGT_R1_REMAT', '')!r}", flush=True)

    from morphganformer_tpu.models import ffhq1024_config
    from morphganformer_tpu.models.config import DiscriminatorConfig
    from morphganformer_tpu.training.train_step import GANTrainer, TrainConfig

    g_cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16",
                                img_resolution=args.res)
    d_cfg = DiscriminatorConfig(img_resolution=args.res, dtype="bfloat16")
    cfg = TrainConfig(batch_size=args.batch, batch_gpu=args.batch)
    trainer = GANTrainer(g_cfg, d_cfg, cfg)

    # init_state measured 233-1062s on the relay (it is many small eager
    # dispatches); the A/B sweep runs one process per config, so cache the
    # initialized state host-side and reload it in subsequent configs.
    import pickle

    state_cache = f"/tmp/reg_state_{args.res}_{args.batch}.pkl"
    t0 = time.perf_counter()
    if os.path.exists(state_cache):
        with open(state_cache, "rb") as fh:
            host_state = pickle.load(fh)
        state = jax.tree_util.tree_map(jnp.asarray, host_state)
        print(f"state loaded from cache {time.perf_counter() - t0:.1f}s",
              flush=True)
    else:
        state = trainer.init_state(seed=0)
        with open(state_cache, "wb") as fh:
            pickle.dump(jax.device_get(state), fh)
        print(f"init {time.perf_counter() - t0:.1f}s (cached)", flush=True)

    rng_np = np.random.RandomState(0)
    n_acc = trainer.n_accum if args.batch % trainer.n_accum == 0 else 1
    micro = args.batch // n_acc
    z_st = jnp.asarray(rng_np.randn(n_acc, micro, g_cfg.k, g_cfg.z_dim),
                       jnp.float32)
    realm = jnp.asarray(rng_np.randn(n_acc, micro, args.res, args.res, 3),
                        jnp.bfloat16)
    rng = jax.random.PRNGKey(41)

    if args.stage == "pl":
        step = lambda st: trainer.g_reg_step(st, z_st, None, rng)[0]
    else:
        step = lambda st: trainer.d_reg_step(st, realm, None)[0]

    t0 = time.perf_counter()
    state = step(state)
    float(jnp.sum(state["pl_mean"]))
    print(f"compile+warm {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.reps):
        state = step(state)
    float(jnp.sum(state["pl_mean"]))
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"{args.stage}: {ms:.1f} ms/step (reps {args.reps}, "
          f"batch {args.batch}, {args.res}^2 bf16)", flush=True)


if __name__ == "__main__":
    main()
