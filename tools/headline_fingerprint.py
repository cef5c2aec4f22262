#!/usr/bin/env python
"""Fingerprint the benchmark headline program to detect compile-cache drift.

The driver's bench window depends on the committed .bench_aot/ store
covering the 1024^2 projection-scan executable; any change to its traced
computation (an op, a packed-kernel body, a dtype) makes the stored
executables stale (they would silently run the OLD program), while pure
source motion (comments, renames, line shifts) is harmless. This tool
answers "did commit X invalidate the AOT store?" in ~2 CPU-minutes, with
no TPU access:

  * xla_ir_sha    — sha256 of the CANONICALIZED StableHLO of the headline
                    projection scan, lowered on CPU. Catches changes to
                    the XLA graph (engine/step/loss/model structure).
                    Tracks the real TPU cache key exactly for everything
                    outside the packed kernels (same jaxpr => same
                    canonical IR on every platform).
  * packed_jaxpr_sha — sha256 of the jaxpr pretty-print of the scan body
                    traced with the packed pipeline FORCED (the gate is
                    TPU-only, so the CPU lowering alone cannot see kernel
                    edits like the fa7fbbe dd-reduction change). Catches
                    changes inside pallas kernel bodies and their custom
                    VJPs.

Usage:
  python tools/headline_fingerprint.py            # print fingerprint JSON
  python tools/headline_fingerprint.py --write    # store to .bench_cache/
  python tools/headline_fingerprint.py --check    # exit 1 on drift

tools/warm_bench_cache.py --verify writes the fingerprint automatically
after a successful warm, so --check compares HEAD against the state the
committed cache was actually warmed at.
"""

import argparse
import dataclasses
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FINGERPRINT = os.path.join(REPO, ".bench_aot", "fingerprint.json")


def _headline_pieces():
    """Build the exact pieces bench.py's headline jit consumes (tiny
    batch/steps — the fingerprint tracks program structure, not shapes the
    bench varies; steps only changes the scan trip count, not the body)."""
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.losses.stack import build_loss_stack
    from morphganformer_tpu.models import ffhq1024_config, init_generator
    from morphganformer_tpu.projection.engine import (ProjectionConfig,
                                                      _make_opt)

    cfg = dataclasses.replace(ffhq1024_config(), dtype="bfloat16")
    model, variables = init_generator(cfg, seed=0, batch=1)
    target = jnp.zeros((1, cfg.img_resolution, cfg.img_resolution, 3))
    pcfg = ProjectionConfig(steps=8, chunk=8)
    loss_fn = build_loss_stack({"mse": 1.0})
    latent = jnp.zeros((1, cfg.k, cfg.z_dim))
    carry = (latent, _make_opt(pcfg).init(latent),
             jnp.full((1,), 1e30, jnp.float32), latent,
             jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(2))
    return model, variables, pcfg, loss_fn, target, latent, carry


def _train_stage_sha():
    """sha over the canonicalized IR of the five train-stage programs at
    the production config (1024^2 batch 4 bf16), with the packed gate
    forced to its structural predicate — so edits to the training losses,
    remat policies, or packed kernels invalidate the train_* AOT blobs
    visibly (round 4: the headline hash alone cannot see a stale
    train_g_reg). Tracing only — nothing compiles or executes."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    from jax._src import cache_key as ck

    import morphganformer_tpu.models.synthesis as S
    from morphganformer_tpu.models import ffhq1024_config
    from morphganformer_tpu.models.config import DiscriminatorConfig
    from morphganformer_tpu.training.train_step import GANTrainer, TrainConfig

    g_cfg = dc.replace(ffhq1024_config(), dtype="bfloat16")
    d_cfg = DiscriminatorConfig(img_resolution=1024, dtype="bfloat16")
    trainer = GANTrainer(g_cfg, d_cfg, TrainConfig(batch_size=4, batch_gpu=4))

    state = jax.eval_shape(lambda: trainer.init_state(seed=0))
    n_acc = trainer.n_accum if 4 % trainer.n_accum == 0 else 1
    micro = 4 // n_acc
    z = jax.ShapeDtypeStruct((n_acc, micro, g_cfg.k, g_cfg.z_dim),
                             jnp.float32)
    real = jax.ShapeDtypeStruct((n_acc, micro, 1024, 1024, 3), jnp.bfloat16)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    lowers = [
        lambda: GANTrainer.g_main_step.lower(trainer, state, z, None, rng),
        lambda: GANTrainer.g_reg_step.lower(trainer, state, z, None, rng),
        lambda: GANTrainer.d_main_step.lower(trainer, state, real, z, None,
                                             rng),
        lambda: GANTrainer.d_reg_step.lower(trainer, state, real, None),
        lambda: GANTrainer.ema_step.lower(trainer, state),
    ]
    from morphganformer_tpu.ops.packed_override import packed_paths_disabled

    orig = S.packed_block_eligible
    # Force the structural predicate but KEEP the force_unpacked guard:
    # the PL/R1 stages trace their grad-of-grad under force_unpacked, and
    # a bare pallas_call in that trace has no JVP rule.
    S.packed_block_eligible = \
        lambda cfg_, res, nm: (not packed_paths_disabled()
                               and S.packed_structural_ok(cfg_, res, nm))
    try:
        h = hashlib.sha256()
        for lower in lowers:
            ir = ck._canonicalize_ir(lower()._lowering.stablehlo(),
                                     ck.IgnoreCallbacks.NO)
            h.update(ir)
    finally:
        S.packed_block_eligible = orig
    return h.hexdigest()


def compute_fingerprint():
    import jax
    import jax.numpy as jnp
    from jax._src import cache_key as ck

    import morphganformer_tpu.models.synthesis as S
    from morphganformer_tpu.projection.engine import (_run_chunk_jit,
                                                      make_projection_step)

    model, variables, pcfg, loss_fn, target, latent, carry = _headline_pieces()
    noise = jnp.zeros((8, *latent.shape))

    lowered = _run_chunk_jit.lower(model, loss_fn, pcfg, variables, target,
                                   jnp.float32(1.0), carry, jnp.arange(8),
                                   noise)
    ir = ck._canonicalize_ir(lowered._lowering.stablehlo(),
                             ck.IgnoreCallbacks.NO)
    xla_sha = hashlib.sha256(ir).hexdigest()

    orig = S.packed_block_eligible
    S.packed_block_eligible = \
        lambda cfg_, res, nm: S.packed_structural_ok(cfg_, res, nm)
    try:
        _, step_fn = make_projection_step(model, variables, loss_fn, pcfg,
                                          jnp.float32(1.0), target)
        jaxpr = jax.make_jaxpr(step_fn)(carry, (jnp.int32(0), latent))
        packed_sha = hashlib.sha256(str(jaxpr).encode()).hexdigest()
    finally:
        S.packed_block_eligible = orig

    return {"xla_ir_sha": xla_sha, "packed_jaxpr_sha": packed_sha,
            "train_stage_sha": _train_stage_sha(),
            "jax_version": jax.__version__}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="store the fingerprint next to the compile cache")
    ap.add_argument("--check", action="store_true",
                    help="compare against the stored fingerprint; exit 1 on "
                         "drift (cache will NOT cover the headline)")
    args = ap.parse_args()

    # Never dial the TPU: force cpu before any backend init (the axon
    # sitecustomize overrides env JAX_PLATFORMS — see ROADMAP).
    import jax
    jax.config.update("jax_platforms", "cpu")

    fp = compute_fingerprint()
    print(json.dumps(fp))

    if args.write:
        os.makedirs(os.path.dirname(FINGERPRINT), exist_ok=True)
        with open(FINGERPRINT, "w") as f:
            json.dump(fp, f, indent=1)
        print(f"written -> {FINGERPRINT}")
    if args.check:
        if not os.path.exists(FINGERPRINT):
            print("no stored fingerprint (cache warm state unknown)")
            sys.exit(2)
        with open(FINGERPRINT) as f:
            stored = json.load(f)
        drift = {k: (stored.get(k), fp[k]) for k in fp
                 if stored.get(k) != fp[k]}
        if drift:
            print(f"DRIFT — the committed cache will NOT cover HEAD: "
                  f"{list(drift)}")
            sys.exit(1)
        print("match — the committed cache covers HEAD's headline program")


if __name__ == "__main__":
    main()
