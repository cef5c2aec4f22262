#!/usr/bin/env python
"""Train a GANformer (CLI parity with the reference run_network.py).

Core flags mirror run_network.py:419-588 (the ~70-flag surface collapses to
the ones that affect behavior; presets fill the rest). `--ganformer-default`
applies the reference preset (run_network.py:61-85): duplex kmeans attention,
layer norm, mul integration, positional encodings, resnet mapping with
latent self-attention, per-dataset R1 gamma.

Experiment dirs are `<results>/<expname>-NNN` with auto-resume from the
latest snapshot (run_network.py:310-360).
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GAMMAS = {"ffhq": 10, "cityscapes": 20, "clevr": 40, "bedrooms": 100}


def make_run_dir(result_dir, expname):
    """expname-NNN numbering (reference run_network.py:310-324)."""
    os.makedirs(result_dir, exist_ok=True)
    existing = [int(m.group(1)) for d in glob.glob(
        os.path.join(result_dir, f"{expname}-*"))
        if (m := re.fullmatch(rf"{re.escape(expname)}-(\d+)",
                              os.path.basename(d)))]
    run_id = max(existing, default=-1) + 1
    run_dir = os.path.join(result_dir, f"{expname}-{run_id:03d}")
    os.makedirs(run_dir, exist_ok=True)
    return run_dir


def build_configs(args):
    import dataclasses
    from morphganformer_tpu.models.config import (
        AttentionConfig, DiscriminatorConfig, GANformerConfig, MappingConfig)
    from morphganformer_tpu.training.loss import LossConfig
    from morphganformer_tpu.training.train_step import TrainConfig

    k = args.components_num + 1
    z_per = args.latent_size // args.components_num

    if args.ganformer_default:
        attention = AttentionConfig(kmeans=True, integration="mul",
                                    norm="layer")
        mapping = MappingConfig(resnet=True, ltnt2ltnt=True, use_pos=True)
        gamma = args.gamma if args.gamma is not None else \
            GAMMAS.get(args.dataset_name, 10)
    else:
        attention = AttentionConfig(kmeans=args.kmeans,
                                    integration=args.integration,
                                    norm=args.normalize)
        mapping = MappingConfig(resnet=args.mapping_resnet,
                                ltnt2ltnt=args.mapping_ltnt2ltnt,
                                use_pos=args.use_pos)
        gamma = args.gamma if args.gamma is not None else 10

    g_cfg = GANformerConfig(
        z_dim=z_per, w_dim=z_per, k=k, img_resolution=args.resolution,
        channel_base=args.channel_base, channel_max=args.channel_max,
        architecture=args.g_arch, transformer=args.transformer,
        start_res=args.start_res, end_res=args.end_res,
        component_dropout=args.component_dropout,
        mapping=mapping, attention=attention, dtype=args.dtype)
    d_cfg = DiscriminatorConfig(img_resolution=args.resolution,
                                channel_base=args.channel_base,
                                channel_max=args.channel_max,
                                architecture=args.d_arch, dtype=args.dtype)

    # Autotune heuristics (reference run_network.py:162-177).
    batch = args.batch if args.batch is not None else \
        min(min(4096 // args.resolution, 32), 64)
    lr = args.lrate if args.lrate is not None else \
        (0.002 if args.resolution >= 1024 else 0.0025)

    t_cfg = TrainConfig(
        batch_size=batch, batch_gpu=args.batch_gpu, g_lr=lr, d_lr=lr,
        loss=LossConfig(r1_gamma=gamma, style_mixing=args.style_mixing,
                        component_mixing=args.component_mixing))
    return g_cfg, d_cfg, t_cfg


def main(argv=None):
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Train the GANformer")
    # General (run_network.py general section).
    p.add_argument("--data-dir", required=True)
    p.add_argument("--dataset-name", default="ffhq")
    p.add_argument("--result-dir", default="results")
    p.add_argument("--expname", default="exp")
    p.add_argument("--resume", default="auto")
    p.add_argument("--total-kimg", type=int, default=25000)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--metrics", nargs="*", default=[])
    # Architecture.
    p.add_argument("--ganformer-default", action="store_true")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--components-num", type=int, default=16)
    p.add_argument("--latent-size", type=int, default=512)
    p.add_argument("--transformer", action="store_true", default=True)
    p.add_argument("--kmeans", action="store_true")
    p.add_argument("--integration", default="add")
    p.add_argument("--normalize", default=None)
    p.add_argument("--use-pos", dest="use_pos", action="store_true")
    p.add_argument("--mapping-resnet", action="store_true")
    p.add_argument("--mapping-ltnt2ltnt", action="store_true")
    p.add_argument("--g-arch", default="resnet",
                   choices=["orig", "skip", "resnet"])
    p.add_argument("--d-arch", default="resnet",
                   choices=["orig", "skip", "resnet"])
    p.add_argument("--start-res", type=int, default=0)
    p.add_argument("--end-res", type=int, default=8)
    p.add_argument("--component-dropout", type=float, default=0.0)
    p.add_argument("--channel-base", type=int, default=32 << 10,
                   help="fmap multiplier (reference --fmap-base*2)")
    p.add_argument("--channel-max", type=int, default=512)
    # Optimization.
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--batch-gpu", type=int, default=4)
    p.add_argument("--lrate", type=float, default=None)
    p.add_argument("--gamma", type=float, default=None)
    p.add_argument("--style-mixing", type=float, default=0.9)
    p.add_argument("--component-mixing", type=float, default=0.0)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    # Loop.
    p.add_argument("--kimg-per-tick", type=int, default=4)
    p.add_argument("--snapshot-ticks", type=int, default=50)
    p.add_argument("--img-snapshot-ticks", type=int, default=50)
    p.add_argument("--vis", nargs="*", default=["grid"],
                   help="Visualization products at image-snapshot ticks: "
                        "grid interp mixing attention noise (visualize.py)")
    p.add_argument("--detector", default="auto",
                   help='FID detector: "auto"|"raw"|<inception .npz>')
    p.add_argument("--max-ticks", type=int, default=None,
                   help="Stop after N ticks (smoke runs)")
    p.add_argument("--snapshot-backend", default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="orbax = async background snapshot saves")
    # Multi-host launch (replaces reference run_network.py:372-402's
    # per-GPU spawn + torch.distributed file:// rendezvous).
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() before training "
                        "(auto-detected rendezvous on TPU pods)")
    p.add_argument("--coordinator", default=None,
                   help="host:port for manual multi-host rendezvous")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--raw-cache", action="store_true",
                   help="decode the dataset once into a raw memmap cache "
                        "(disk = uncompressed dataset size; removes PNG "
                        "decode from the training loop)")
    args = p.parse_args(argv)
    if args.raw_cache:
        os.environ["MGT_RAW_CACHE"] = "1"

    if args.multihost or args.coordinator:
        from morphganformer_tpu.parallel.launch import initialize_distributed
        idx = initialize_distributed(args.coordinator, args.num_processes,
                                     args.process_id,
                                     requested=args.multihost)
        print(f"multihost: process {idx} up")

    from morphganformer_tpu.training.loop import (
        LoopConfig, latest_snapshot, training_loop)

    g_cfg, d_cfg, t_cfg = build_configs(args)

    if args.eval:
        # Evaluation-only mode (reference run_network --eval ->
        # training_loop.evaluate): run metrics on the latest snapshot's EMA
        # generator.
        prev = sorted(glob.glob(os.path.join(args.result_dir,
                                             f"{args.expname}-*")))
        snaps = [s for d in prev if (s := latest_snapshot(d))]
        assert snaps, "no snapshot to evaluate"
        from cli.calc_metrics import dataset_batches
        from morphganformer_tpu.metrics.detector import resolve_detector
        from morphganformer_tpu.checkpoint.io import load_generator
        from morphganformer_tpu.metrics.registry import (
            compute_metric, report_metric)
        cfg, model, variables = load_generator(snaps[-1], role="Gs")
        for metric in (args.metrics or ["fid2k_full"]):
            dataset = dataset_batches(args.data_dir, cfg.img_resolution,
                                      max_items=2000)
            kind = "probs" if metric.startswith("is") else "features"
            result = compute_metric(metric,
                                    detector=resolve_detector(kind=kind),
                                    dataset=dataset,
                                    G=(model, variables, cfg), max_items=2000)
            report_metric(result, run_dir=os.path.dirname(snaps[-1]),
                          snapshot_pkl=snaps[-1])
        return
    resume = args.resume
    if resume == "auto":
        # Auto-resume from the newest snapshot across previous {expname}-NNN
        # dirs (reference run_network.py:327-360).
        prev = sorted(glob.glob(os.path.join(args.result_dir,
                                             f"{args.expname}-*")))
        snaps = [s for d in prev if (s := latest_snapshot(d))]
        resume = snaps[-1] if snaps else None
        if resume:
            print(f"auto-resume from {resume}")
    run_dir = make_run_dir(args.result_dir, args.expname)
    print(f"run dir: {run_dir}")
    l_cfg = LoopConfig(run_dir=run_dir, total_kimg=args.total_kimg,
                       kimg_per_tick=args.kimg_per_tick,
                       snapshot_ticks=args.snapshot_ticks,
                       img_snapshot_ticks=args.img_snapshot_ticks,
                       eval_metrics=tuple(args.metrics),
                       vis=tuple(args.vis), detector=args.detector,
                       snapshot_backend=args.snapshot_backend)
    training_loop(g_cfg, d_cfg, t_cfg, l_cfg, args.data_dir,
                  resume=resume, max_ticks=args.max_ticks)


if __name__ == "__main__":
    main()
