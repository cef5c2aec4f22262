"""End-to-end training-loop test: ticks, snapshots, resume (tiny model)."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from morphganformer_tpu.models.config import (
    AttentionConfig,
    DiscriminatorConfig,
    GANformerConfig,
    MappingConfig,
)
from morphganformer_tpu.training.loop import LoopConfig, training_loop
from morphganformer_tpu.training.train_step import TrainConfig


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_compile_cache():
    """Disable the persistent compile cache for this module.

    Full `-m ""` suite runs segfaulted three times (deterministically, and
    regardless of concurrency or cache-directory freshness) inside XLA's
    C++ `backend.deserialize_executable` when the orbax loop test READ
    this module's 8-device train-step executable from the persistent
    cache late in the suite — the same read succeeds in a short run, so
    some accumulated process state breaks XLA:CPU deserialization and is
    unfixable from here. No cache => no read => no crash; the cost is a
    few minutes of recompilation per full run (the default `-m "not
    slow"` selection deselects these tests anyway).

    Setting jax_compilation_cache_dir=None alone is NOT enough: jax
    memoizes the cache object on first use (compilation_cache._get_cache
    initializes the global `_cache` at most once and is_cache_used
    latches `_cache_used`), so a dir change mid-process never reaches
    the read path — reset_cache() drops that state so the None dir
    actually takes effect (verified: a full `-m ""` run segfaulted in
    deserialize_executable again WITH the dir-only version of this
    fixture)."""
    import jax
    from jax._src import compilation_cache as _cc

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    _cc.reset_cache()


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    folder = root / "16"
    folder.mkdir()
    rng = np.random.RandomState(0)
    for i in range(32):
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(
            folder / f"{i:04d}.png")
    return str(root)


def _cfgs():
    g_cfg = GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3, channel_base=256,
        channel_max=32, end_res=3, mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())
    d_cfg = DiscriminatorConfig(img_resolution=16, channel_base=256,
                                channel_max=32, mbstd_group_size=2)
    t_cfg = TrainConfig(batch_size=4)
    return g_cfg, d_cfg, t_cfg


@pytest.fixture(scope="module")
def loop_run(data_dir, tmp_path_factory):
    """One 2-tick training run shared by the tests below (the loop is the
    expensive part; each test checks a different artifact of the run)."""
    g_cfg, d_cfg, t_cfg = _cfgs()
    run_dir = str(tmp_path_factory.mktemp("looprun") / "run")
    l_cfg = LoopConfig(run_dir=run_dir, total_kimg=1, kimg_per_tick=0.02,
                       snapshot_ticks=1, img_snapshot_ticks=2,
                       last_snapshots=2,
                       eval_metrics=("fid2k_full",), eval_images_num=32,
                       eval_batch=8, detector="raw",
                       vis=("grid", "interp", "mixing", "attention", "noise"))
    state = training_loop(g_cfg, d_cfg, t_cfg, l_cfg, data_dir,
                          resume=None, use_mesh=False, max_ticks=2)
    return run_dir, l_cfg, state


@pytest.mark.slow
def test_training_loop_ticks_snapshots_resume(data_dir, loop_run):
    g_cfg, d_cfg, t_cfg = _cfgs()
    run_dir, l_cfg, state = loop_run
    nimg1 = int(np.asarray(state["cur_nimg"]))
    assert nimg1 >= 40  # 2 ticks of 20 images

    snaps = sorted(glob.glob(os.path.join(run_dir, "network-snapshot-*")))
    assert snaps, "no snapshot written"
    for fname in ("arch.json", "Gs.msgpack", "G.msgpack", "D.msgpack",
                  "train_state.msgpack"):
        assert os.path.exists(os.path.join(snaps[-1], fname)), fname
    assert os.path.exists(os.path.join(run_dir, "stats.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "training_options.json"))
    # In-training eval wrote its jsonl (reference training_loop.py:227-236).
    assert os.path.exists(os.path.join(run_dir, "metric-fid2k_full.jsonl"))
    # Vis suite products at the image-snapshot tick (reference visualize.py).
    assert glob.glob(os.path.join(run_dir, "fakes*.png"))
    vis_dirs = sorted(glob.glob(os.path.join(run_dir, "vis*")))
    assert vis_dirs, "no vis dir written"
    for fname in ("interpolation.png", "style_mixing.png", "noise_map.png",
                  "attention_0.png"):
        assert os.path.exists(os.path.join(vis_dirs[-1], fname)), fname

    # Resume continues from the stored cur_nimg.
    state2 = training_loop(g_cfg, d_cfg, t_cfg, l_cfg, data_dir,
                           resume=snaps[-1], use_mesh=False, max_ticks=1)
    nimg2 = int(np.asarray(state2["cur_nimg"]))
    assert nimg2 > nimg1


@pytest.fixture(scope="module")
def minimal_snapshot_dir(data_dir, tmp_path_factory):
    """Cheapest loop run that writes a snapshot: 1 tick, no eval, no vis.
    The default suite's only loop cost (the full 2-tick eval+vis run in
    `loop_run` is slow-marked; its setup alone was ~4 min of compiles on a
    cold cache)."""
    g_cfg, d_cfg, t_cfg = _cfgs()
    run_dir = str(tmp_path_factory.mktemp("minsnap") / "run")
    l_cfg = LoopConfig(run_dir=run_dir, total_kimg=1, kimg_per_tick=0.02,
                       snapshot_ticks=1, img_snapshot_ticks=0,
                       last_snapshots=1, eval_metrics=(), vis=())
    training_loop(g_cfg, d_cfg, t_cfg, l_cfg, data_dir,
                  resume=None, use_mesh=False, max_ticks=1)
    return run_dir


def test_snapshot_loads_as_generator_checkpoint(data_dir,
                                                minimal_snapshot_dir):
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.checkpoint.io import load_generator

    run_dir = minimal_snapshot_dir
    snap = sorted(glob.glob(os.path.join(run_dir, "network-snapshot-*")))[-1]
    cfg, model, variables = load_generator(snap, role="Gs")
    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    img = model.apply(variables, z, noise_mode="const")
    assert img.shape == (1, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


@pytest.mark.slow
def test_orbax_snapshot_backend_roundtrip(data_dir, tmp_path):
    """Async Orbax snapshots: a 1-tick run saves via AsyncCheckpointer and
    a resumed run restores the full train state from the orbax directory
    (no train_state.msgpack on disk).

    Runs in a FRESH SUBPROCESS unless MGT_LOOP_SUBPROC=1: after ~195
    in-process tests, XLA:CPU segfaults compiling (or, with a persistent
    cache, deserializing) this test's train-step executable —
    deterministic in full `-m ""` runs, absent in short runs, and not
    memory pressure (125 GB free at crash). Process-accumulated XLA state
    is outside our control; a clean child process sidesteps it."""
    import os
    import subprocess
    import sys

    if os.environ.get("MGT_LOOP_SUBPROC") != "1":
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-m", "",
             f"{__file__}::test_orbax_snapshot_backend_roundtrip"],
            env={**os.environ, "MGT_LOOP_SUBPROC": "1"},
            capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, f"child run failed:\n{r.stdout}\n{r.stderr}"
        return

    g_cfg, d_cfg, t_cfg = _cfgs()
    run_dir = str(tmp_path / "orbax_run")
    l_cfg = LoopConfig(run_dir=run_dir, total_kimg=1, kimg_per_tick=0.02,
                       snapshot_ticks=1, snapshot_backend="orbax",
                       tensorboard=False)
    state = training_loop(g_cfg, d_cfg, t_cfg, l_cfg, data_dir, resume=None,
                          use_mesh=False, max_ticks=1)
    nimg1 = int(np.asarray(state["cur_nimg"]))
    snaps = sorted(glob.glob(os.path.join(run_dir, "network-snapshot-*")))
    assert snaps
    assert os.path.isdir(os.path.join(snaps[-1], "orbax"))
    assert not os.path.exists(os.path.join(snaps[-1], "train_state.msgpack"))

    state2 = training_loop(g_cfg, d_cfg, t_cfg, l_cfg, data_dir,
                           resume=snaps[-1], use_mesh=False, max_ticks=1)
    assert int(np.asarray(state2["cur_nimg"])) > nimg1
