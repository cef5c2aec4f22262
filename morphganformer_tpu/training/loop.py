"""Full training driver: tick loop, snapshots, auto-resume, stats, eval.

Behavioral spec: training/training_loop.py in the reference — dataset
iteration (:41-50), net construction/resume (:74-111), stage scheduling
(:157-183), the kimg tick loop with snapshot/eval/vis (:384-453), stats
jsonl (:258-302), snapshot retention GC (:129-130) and auto-resume from the
latest snapshot with kimg parsed from the filename (run_network.py:327-360).

Checkpoints are the native arch.json+msgpack format plus a train_state
msgpack (optimizer moments, EMA params, pl_mean, cur_nimg) — the
restart-from-snapshot recovery model (SURVEY.md §5.3)."""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import re
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from morphganformer_tpu.checkpoint.io import save_discriminator, save_generator
from morphganformer_tpu.data.dataset import ImageFolderDataset, infinite_batches
from morphganformer_tpu.models.config import DiscriminatorConfig, GANformerConfig
from morphganformer_tpu.training.stats import Collector
from morphganformer_tpu.training.train_step import (
    GANTrainer,
    TrainConfig,
    make_data_mesh,
)
from morphganformer_tpu.utils.image import create_img_grid


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    run_dir: str = "results/exp"
    total_kimg: float = 25000
    kimg_per_tick: float = 4
    snapshot_ticks: int = 50          # <= 0 disables snapshots
    img_snapshot_ticks: int = 50      # <= 0 disables image snapshots/vis
    last_snapshots: int = 10          # retention GC (training_loop.py:129-130)
    eval_metrics: tuple = ()          # computed at snapshot ticks (:227-236)
    eval_images_num: int = 50000
    eval_batch: int = 16
    detector: str = "auto"            # "auto"|"raw"|<inception .npz path>
    # Visualization outputs at image-snapshot ticks (reference visualize.py
    # vis(), invoked from training_loop.py). "grid" is the bare fakes grid;
    # the rest mirror the reference's richer vis() products.
    vis: tuple = ("grid",)            # of: grid, interp, mixing, attention, noise
    tensorboard: bool = True          # tfevents mirror of stats.jsonl
    snapshot_backend: str = "msgpack"  # "msgpack" | "orbax" (async saves)
    seed: int = 0


def _snapshot_kimg(path):
    m = re.search(r"network-snapshot-(\d+)", path)
    return int(m.group(1)) if m else -1


def latest_snapshot(run_dir):
    """Auto-resume discovery (reference run_network.py:327-360)."""
    snaps = sorted(glob.glob(os.path.join(run_dir, "network-snapshot-*")),
                   key=_snapshot_kimg)
    return snaps[-1] if snaps else None


def save_train_state(path, state):
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))


def load_train_state(path, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def training_loop(g_cfg: GANformerConfig, d_cfg: DiscriminatorConfig,
                  t_cfg: TrainConfig, l_cfg: LoopConfig, dataset_path: str,
                  resume: Optional[str] = "auto", use_mesh: bool = True,
                  max_ticks: Optional[int] = None):
    """Run (or resume) training until total_kimg. Returns final state."""
    # CI debugging mode (SURVEY.md §5.2 rebuild note): surface NaNs at the
    # op that produced them instead of scrubbing silently.
    if os.environ.get("MGT_DEBUG_NANS") == "1":
        jax.config.update("jax_debug_nans", True)

    os.makedirs(l_cfg.run_dir, exist_ok=True)
    with open(os.path.join(l_cfg.run_dir, "training_options.json"), "w") as f:
        json.dump({"G": json.loads(g_cfg.to_json()),
                   "D": json.loads(d_cfg.to_json()),
                   "train": dataclasses.asdict(t_cfg),
                   "loop": {k: v for k, v in dataclasses.asdict(l_cfg).items()
                            if not isinstance(v, tuple)}},
                  f, indent=2, default=str)

    dataset = ImageFolderDataset(dataset_path, g_cfg.img_resolution)
    batches = None
    if os.environ.get("MGT_RAW_CACHE") == "1" and not dataset.use_labels:
        # Opt-in decode-once memmap cache (data/raw_cache.py): removes
        # PNG decode from the steady-state loop entirely.
        try:
            from morphganformer_tpu.data.raw_cache import raw_infinite_batches
            batches = raw_infinite_batches(
                dataset_path, g_cfg.img_resolution, t_cfg.batch_size,
                shard_index=jax.process_index(),
                num_shards=jax.process_count(), seed=l_cfg.seed)
        except Exception as e:
            print(f"(raw cache unavailable, falling back: {e})")
    if batches is None:
        try:
            # Prefer the native C++ threaded loader; fall back to PIL.
            from morphganformer_tpu.data.native_loader import (
                native_available, native_infinite_batches)
            if native_available() and not dataset.use_labels:
                batches = native_infinite_batches(
                    dataset_path, g_cfg.img_resolution, t_cfg.batch_size,
                    shard_index=jax.process_index(),
                    num_shards=jax.process_count(), seed=l_cfg.seed)
            else:
                raise ImportError
        except Exception:
            batches = infinite_batches(dataset, t_cfg.batch_size,
                                       shard_index=jax.process_index(),
                                       num_shards=jax.process_count(),
                                       seed=l_cfg.seed)

    # Module summaries (reference print_module_summary at training start,
    # training_loop.py:135-141) — abstract trace, no compute; written to
    # the run dir and stdout on the main process only.
    if jax.process_index() == 0:
        from morphganformer_tpu.utils.summary import (discriminator_summary,
                                                      generator_summary)
        try:
            summary = (generator_summary(g_cfg) + "\n"
                       + discriminator_summary(d_cfg))
            with open(os.path.join(l_cfg.run_dir, "module_summary.txt"),
                      "w") as f:
                f.write(summary)
            print(summary)
        except Exception as e:  # pragma: no cover - purely informational
            print(f"(module summary unavailable: {e})")

    mesh = make_data_mesh() if use_mesh and jax.device_count() > 1 else None
    trainer = GANTrainer(g_cfg, d_cfg, t_cfg, mesh=mesh)
    state = trainer.init_state(seed=l_cfg.seed)

    snapshotter = None
    if l_cfg.snapshot_backend == "orbax":
        from morphganformer_tpu.checkpoint.orbax_io import AsyncSnapshotter
        snapshotter = AsyncSnapshotter()

    # Auto-resume (reference run_network.py:327-360).
    if resume == "auto":
        resume = latest_snapshot(l_cfg.run_dir)
    if resume:
        print(f"Resuming from {resume}")
        msgpack_path = os.path.join(resume, "train_state.msgpack")
        if os.path.exists(msgpack_path):
            state = load_train_state(msgpack_path, jax.device_get(state))
        elif snapshotter is not None:
            state = snapshotter.restore(resume, template=jax.device_get(state))
        else:
            raise FileNotFoundError(msgpack_path)

    collector = Collector()
    stats_jsonl = os.path.join(l_cfg.run_dir, "stats.jsonl")
    tb_writer = None
    if l_cfg.tensorboard and jax.process_index() == 0:
        # tfevents mirror (reference training_loop.py:266-273,295-302);
        # dependency-free writer, see training/tensorboard.py.
        from morphganformer_tpu.training.tensorboard import EventWriter
        tb_writer = EventWriter(l_cfg.run_dir)
    rng = jax.random.PRNGKey(l_cfg.seed + jax.process_index())

    cur_nimg = int(jax.device_get(state["cur_nimg"]))
    tick = int(cur_nimg // (l_cfg.kimg_per_tick * 1000))
    step = cur_nimg // t_cfg.batch_size
    tick_start = time.time()
    start_time = time.time()

    last_snap_kimg = [-1]

    def maybe_snapshot(force=False):
        # Multi-host note (ADVICE r2): Orbax saves are COLLECTIVE — every
        # process must enter snapshotter.save. The skip decision therefore
        # uses host-consistent state (the kimg counter, identical on all
        # processes); the filesystem-existence check is only valid
        # single-host, where it additionally protects resumed runs.
        kimg = int(jax.device_get(state["cur_nimg"])) // 1000
        snap_dir = os.path.join(l_cfg.run_dir, f"network-snapshot-{kimg:06d}")
        if not force:
            if kimg == last_snap_kimg[0]:
                return snap_dir if os.path.exists(snap_dir) else None
            if jax.process_count() == 1 and os.path.exists(snap_dir):
                return
        last_snap_kimg[0] = kimg
        main = jax.process_index() == 0
        if main:
            gs_vars = {"params": state["gs_params"]}
            if state.get("gs_stats"):
                gs_vars["moving_stats"] = state["gs_stats"]
            if "buffers" in state["g"]:
                gs_vars["buffers"] = state["g"]["buffers"]
            save_generator(snap_dir, g_cfg,
                           {"params": state["g"]["params"],
                            **{k: v for k, v in state["g"].items()
                               if k != "params"}}, role="G")
            save_generator(snap_dir, g_cfg, gs_vars, role="Gs")
            save_discriminator(snap_dir, d_cfg,
                               {"params": state["d"]["params"]})
        if snapshotter is not None:
            # Async + collective: device->host serialization overlaps the
            # next ticks (SURVEY.md §5.4 rebuild note: Orbax async save).
            snapshotter.save(snap_dir, state)
        elif main:
            save_train_state(os.path.join(snap_dir, "train_state.msgpack"),
                             state)
        if main:
            # Retention GC.
            snaps = sorted(glob.glob(os.path.join(l_cfg.run_dir,
                                                  "network-snapshot-*")),
                           key=_snapshot_kimg)
            for old in snaps[:-l_cfg.last_snapshots]:
                import shutil
                shutil.rmtree(old, ignore_errors=True)
        return snap_dir

    def _gs_vars():
        gs_vars = {"params": state["gs_params"]}
        if state.get("gs_stats"):
            gs_vars["moving_stats"] = state["gs_stats"]
        if "buffers" in state["g"]:
            gs_vars["buffers"] = state["g"]["buffers"]
        return gs_vars

    def save_visualizations():
        """Image-snapshot products (reference training_loop.py -> vis(),
        visualize.py:60): fakes grid + the vis suite selected by l_cfg.vis."""
        from morphganformer_tpu.training import visualize as vz

        gs_vars = _gs_vars()
        kimg = int(jax.device_get(state["cur_nimg"])) // 1000
        if "grid" in l_cfg.vis:
            z = jax.random.normal(jax.random.PRNGKey(0),
                                  (16, g_cfg.k, g_cfg.z_dim))
            imgs = trainer.G.apply(gs_vars, z, truncation_psi=0.7,
                                   noise_mode="const")
            create_img_grid(jax.device_get(imgs)).save(
                os.path.join(l_cfg.run_dir, f"fakes{kimg:06d}.png"))
        extras = [v for v in l_cfg.vis if v != "grid"]
        if not extras:
            return
        vis_dir = os.path.join(l_cfg.run_dir, f"vis{kimg:06d}")
        os.makedirs(vis_dir, exist_ok=True)
        if "interp" in extras:
            vz.interpolation_grid(trainer.G, gs_vars, g_cfg,
                                  path=os.path.join(vis_dir, "interpolation.png"))
        if "mixing" in extras:
            vz.style_mixing_table(trainer.G, gs_vars, g_cfg,
                                  path=os.path.join(vis_dir, "style_mixing.png"))
        if "attention" in extras:
            vz.attention_blends(trainer.G, gs_vars, g_cfg, out_dir=vis_dir)
        if "noise" in extras and g_cfg.local_noise:
            vz.noise_variance_map(trainer.G, gs_vars, g_cfg,
                                  path=os.path.join(vis_dir, "noise_map.png"))

    def evaluate(snapshot_dir=None):
        """In-training metric evaluation at snapshot ticks (reference
        training_loop.py:227-236,361-363 -> metric_main.compute_metric)."""
        if not l_cfg.eval_metrics:
            return
        from morphganformer_tpu.metrics.detector import resolve_detector
        from morphganformer_tpu.metrics.registry import (
            compute_metric, report_metric)

        gs_vars = _gs_vars()
        for metric in l_cfg.eval_metrics:
            kind = "probs" if metric.startswith("is") else "features"
            detector = resolve_detector(l_cfg.detector, kind=kind)

            def data_iter():
                n = 0
                while n < l_cfg.eval_images_num:
                    b = min(l_cfg.eval_batch, len(dataset) - n % len(dataset))
                    imgs = np.stack([dataset[(n + j) % len(dataset)][0]
                                     for j in range(b)])
                    yield imgs
                    n += b

            result = compute_metric(
                metric, detector=detector, dataset=data_iter(),
                G=(trainer.G, gs_vars, g_cfg), batch=l_cfg.eval_batch,
                max_items=l_cfg.eval_images_num)
            report_metric(result, run_dir=l_cfg.run_dir,
                          snapshot_pkl=snapshot_dir)

    ticks_done = 0
    while cur_nimg < l_cfg.total_kimg * 1000:
        real, labels = next(batches)
        rng, sub = jax.random.split(rng)
        c = jnp.asarray(labels) if labels.shape[1] else None
        state, stats = trainer.train_iteration(state, jnp.asarray(real), sub,
                                               step, c=c)
        step += 1
        cur_nimg += t_cfg.batch_size
        collector.report_dict(
            {k: jax.device_get(v) for k, v in stats.items()})

        if cur_nimg >= (tick + 1) * l_cfg.kimg_per_tick * 1000:
            tick += 1
            ticks_done += 1
            now = time.time()
            fields = [f"tick {tick}", f"kimg {cur_nimg / 1000:.1f}",
                      f"time {now - start_time:.0f}s",
                      f"sec/tick {now - tick_start:.1f}"]
            fields += [f"{k.split('/')[-1]} {collector.mean(k):.3f}"
                       for k in collector.names() if k.startswith("Loss/")]
            print(" | ".join(fields), flush=True)
            collector.write_jsonl(stats_jsonl, kimg=cur_nimg / 1000, tick=tick)
            if tb_writer is not None:
                tb_writer.add_scalars(
                    cur_nimg,
                    {name: collector.mean(name) for name in collector.names()}
                    | {"Timing/sec_per_tick": now - tick_start,
                       "Timing/total_sec": now - start_time})
            collector.reset()
            tick_start = now
            # A tick interval <= 0 disables that product entirely
            # (mirrors the reference's None intervals, training_loop.py
            # :430-438).
            if (jax.process_index() == 0 and l_cfg.img_snapshot_ticks > 0
                    and tick % l_cfg.img_snapshot_ticks == 0):
                save_visualizations()
            if l_cfg.snapshot_ticks > 0 and tick % l_cfg.snapshot_ticks == 0:
                # All processes enter (Orbax saves are collective); only
                # process 0 writes the msgpack/arch/eval products.
                snap = maybe_snapshot()
                if jax.process_index() == 0:
                    evaluate(snapshot_dir=snap)
            if max_ticks is not None and ticks_done >= max_ticks:
                break

    snap = maybe_snapshot(force=True)
    if jax.process_index() == 0:
        evaluate(snapshot_dir=snap)
    if snapshotter is not None:
        snapshotter.wait()
    if tb_writer is not None:
        tb_writer.close()
    return state
