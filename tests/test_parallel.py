"""Multi-device tests over the 8-virtual-CPU-device mesh (SURVEY.md §4c)."""

import jax
import numpy as np
import pytest

requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


@requires_8
@pytest.mark.slow
def test_dryrun_train_step_8_devices():
    # slow: ~5 min of 8-device SPMD train-step compilation on a cold
    # cache, and the round driver executes this exact path every round
    # anyway (dryrun_multichip -> MULTICHIP_r*.json).
    from morphganformer_tpu.training.train_step import dryrun_train_step
    dryrun_train_step(8)


@requires_8
def test_generation_batch_sharded_matches_single_device():
    """Sharding the batch over the mesh must not change the math."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from morphganformer_tpu.models import init_generator
    from morphganformer_tpu.training.train_step import make_data_mesh
    from tests.test_models import small_cfg

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (8, cfg.k, cfg.z_dim))

    ref = model.apply(variables, z, noise_mode="const")

    mesh = make_data_mesh()
    z_sharded = jax.device_put(z, NamedSharding(mesh, P("data")))
    vars_rep = jax.device_put(variables, NamedSharding(mesh, P()))
    with mesh:
        out = jax.jit(lambda v, zz: model.apply(v, zz, noise_mode="const"))(
            vars_rep, z_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@requires_8
def test_projection_batch_sharded_matches_single_device():
    """The batch-2P projection scan sharded over ('data',) must produce
    the SAME latents/losses as the single-device run (VERDICT r4 #4: the
    morph product's multi-chip story, not just training). Params are
    replicated, the batch rows (targets, latents, adam moments, best
    trackers) shard; every row is independent, so the math must be
    bitwise-equivalent up to reduction order."""
    import jax.numpy as jnp

    from morphganformer_tpu.losses.stack import build_loss_stack
    from morphganformer_tpu.models import init_generator
    from morphganformer_tpu.parallel.mesh import make_data_mesh
    from morphganformer_tpu.projection.engine import (ProjectionConfig,
                                                      latent_stats, project)
    from tests.test_models import small_cfg

    cfg = small_cfg()
    batch = 8          # 4 morph pairs — the cli/morph.py --shard shape
    model, variables = init_generator(cfg, seed=0, batch=batch)
    z = jax.random.normal(jax.random.PRNGKey(5), (batch, cfg.k, cfg.z_dim))
    targets = model.apply(variables, z, noise_mode="const")

    pcfg = ProjectionConfig(steps=6, chunk=3, n_mean_latent=256)
    loss_fn = build_loss_stack({"mse": 1.0})
    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(1),
                             n_mean_latent=256)

    ref = project(model, variables, targets, loss_fn, pcfg, mean, std,
                  rng=jax.random.PRNGKey(2))
    shr = project(model, variables, targets, loss_fn, pcfg, mean, std,
                  rng=jax.random.PRNGKey(2), mesh=make_data_mesh())

    np.testing.assert_allclose(np.asarray(shr.latent), np.asarray(ref.latent),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(shr.per_image_loss),
                               np.asarray(ref.per_image_loss),
                               rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(shr.loss_history),
                               np.asarray(ref.loss_history),
                               rtol=2e-5, atol=2e-7)


def test_grad_accumulation_matches_full_batch():
    """batch 8 @ batch_gpu 2 (4 scan rounds) must produce the same G and D
    updates as one full-batch step (VERDICT r1 #2). Stochastic pieces
    (style mixing, per-layer noise, path-length noise) are disabled, and
    minibatch-std is off — mbstd couples samples across the batch, so its
    groups legitimately differ between accumulation schedules (true of the
    reference too). Everything else is per-sample, so mean-of-round-means
    equals the full-batch mean exactly."""
    import jax.numpy as jnp
    from morphganformer_tpu.models.config import (
        AttentionConfig, DiscriminatorConfig, GANformerConfig, MappingConfig)
    from morphganformer_tpu.training.loss import LossConfig
    from morphganformer_tpu.training.train_step import GANTrainer, TrainConfig

    g_cfg = GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3, channel_base=256,
        channel_max=32, end_res=3, local_noise=False,
        mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig(dropout=0.0))  # dropout rng is per-round
    d_cfg = DiscriminatorConfig(img_resolution=16, channel_base=256,
                                channel_max=32, mbstd_num_channels=0)
    loss = LossConfig(style_mixing=0.0, component_mixing=0.0)

    def run(batch_gpu):
        cfg = TrainConfig(batch_size=8, batch_gpu=batch_gpu,
                          g_reg_interval=None, d_reg_interval=16, loss=loss)
        trainer = GANTrainer(g_cfg, d_cfg, cfg, mesh=None)
        state = trainer.init_state(seed=0)
        real = jax.random.normal(jax.random.PRNGKey(7), (8, 16, 16, 3))
        state, _ = trainer.train_iteration(state, real,
                                           jax.random.PRNGKey(1), step=0)
        return trainer, jax.device_get(state)

    t_full, s_full = run(batch_gpu=8)   # n_accum = 1
    t_mb, s_mb = run(batch_gpu=2)       # n_accum = 4
    assert t_full.n_accum == 1 and t_mb.n_accum == 4

    # Compare the gradients Adam consumed, via the optimizer state: with
    # beta1=0 the first moment IS the step's gradient, and nu = (1-b2)*g^2.
    # (Comparing post-Adam params directly is ill-conditioned: at step 1 the
    # update is ~ lr*sign(g), so coordinates whose per-sample grads nearly
    # cancel flip sign under float reassociation.)
    for opt in ("g_opt", "d_opt"):
        flat_full = jax.tree_util.tree_leaves_with_path(s_full[opt])
        flat_mb = dict(jax.tree_util.tree_leaves_with_path(s_mb[opt]))
        assert flat_full, opt
        for path, leaf in flat_full:
            np.testing.assert_allclose(
                np.asarray(flat_mb[path]), np.asarray(leaf),
                rtol=1e-4, atol=1e-7,
                err_msg=f"{opt}{jax.tree_util.keystr(path)}")
    # And the params did move.
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s_mb["g"]["params"],
        jax.device_get(GANTrainer(g_cfg, d_cfg,
                                  TrainConfig(batch_size=8, batch_gpu=2,
                                              g_reg_interval=None, loss=loss),
                                  mesh=None).init_state(seed=0))["g"]["params"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_initialize_distributed_single_process():
    """Multi-host launch path in its single-process degenerate form: the
    same jax.distributed.initialize call a pod launch uses, with an
    explicit localhost coordinator (reference run_network.py:372-379's
    file:// rendezvous equivalent). Must run before any backend init, so
    it executes in a fresh subprocess."""
    import os
    import subprocess
    import sys

    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {root!r})
from morphganformer_tpu.parallel.launch import (
    initialize_distributed, is_main_process)
idx = initialize_distributed("localhost:12355", num_processes=1, process_id=0)
assert jax.distributed.is_initialized()
assert idx == 0 and is_main_process()
assert initialize_distributed("localhost:12355", 1, 0) == 0  # idempotent
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(4))) == 4.0  # computation works after init
print("MULTIHOST-OK")
""".format(root=os.path.join(os.path.dirname(__file__), ".."))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MULTIHOST-OK" in out.stdout


def test_initialize_distributed_two_process_rendezvous():
    """The REAL multi-host rendezvous (VERDICT r2 #6): two separate
    processes meet at an explicit coordinator via
    jax.distributed.initialize on CPU. Each must see the union device set
    (process_count 2, global device_count 2, local 1) and is_main_process()
    must gate exactly one of them; a cross-process psum proves collectives
    work over the rendezvous (reference run_network.py:372-379's
    multi-process init_process_group equivalent)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    code = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from morphganformer_tpu.parallel.launch import (
    initialize_distributed, is_main_process)
pid = int(sys.argv[1])
idx = initialize_distributed("localhost:{port}", num_processes=2,
                             process_id=pid)
assert idx == pid
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.devices()        # union device set
assert jax.local_device_count() == 1
assert is_main_process() == (pid == 0)
# Cross-process collective: global sum over a process-sharded array.
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(jax.devices(), ("data",))
local = jnp.full((1,), float(pid + 1))
arr = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P("data")),
    [jax.device_put(local, jax.local_devices()[0])])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 3.0, float(total)
print(f"RENDEZVOUS-OK p{{pid}} main={{is_main_process()}}")
""".format(root=os.path.join(os.path.dirname(__file__), ".."), port=port)

    procs = [subprocess.Popen([sys.executable, "-c", code, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{err[-2000:]}"
    assert "RENDEZVOUS-OK p0 main=True" in outs[0][1]
    assert "RENDEZVOUS-OK p1 main=False" in outs[1][1]


@requires_8
@pytest.mark.slow
def test_model_parallel_grads_match_replicated():
    # slow: second-heaviest 8-device compile in the default suite; TP is
    # this framework's opt-in extension (the reference is DP-only) and
    # test_model_parallel_train_iteration covers the composed path.
    """('data','model') tensor-parallel sharding is annotation-only: loss
    and parameter gradients under output-channel sharding (parallel/tp.py)
    must match the replicated computation. Compared at the gradient level
    — one Adam step would amplify reduction-order noise into sign-scale
    update differences and prove nothing."""
    import jax.numpy as jnp

    from morphganformer_tpu.models import init_generator
    from morphganformer_tpu.models.config import (AttentionConfig,
                                                  GANformerConfig,
                                                  MappingConfig)
    from morphganformer_tpu.parallel.tp import make_mesh, shard_params

    g_cfg = GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3, channel_base=256,
        channel_max=32, end_res=3, mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())
    model, variables = init_generator(g_cfg, seed=0, batch=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, g_cfg.k, g_cfg.z_dim))

    def loss(params):
        v = dict(variables)
        v["params"] = params
        img = model.apply(v, z, truncation_psi=0.8, noise_mode="const")
        if isinstance(img, tuple):
            img = img[0]
        return jnp.mean(jnp.square(img)) + jnp.mean(jnp.abs(img))

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss))(variables["params"])

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    with mesh:
        sharded = shard_params(variables["params"], mesh)
        specs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x: x.sharding.spec, sharded))
        assert any("model" in str(s) for s in specs), specs
        l_tp, g_tp = jax.jit(jax.value_and_grad(loss))(sharded)
        jax.block_until_ready(g_tp)

    np.testing.assert_allclose(float(l_ref), float(l_tp), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_tp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa))


@requires_8
@pytest.mark.slow
def test_model_parallel_train_iteration():
    """A full adversarial train iteration runs on the ('data','model')
    mesh with weights genuinely sharded over 'model', and its loss stats
    match the data-parallel iteration (post-optimizer params are NOT
    compared: Adam's first step amplifies reduction-order noise)."""
    import jax.numpy as jnp

    from morphganformer_tpu.models.config import (AttentionConfig,
                                                  DiscriminatorConfig,
                                                  GANformerConfig,
                                                  MappingConfig)
    from morphganformer_tpu.parallel.tp import make_mesh
    from morphganformer_tpu.training.train_step import GANTrainer, TrainConfig

    g_cfg = GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3, channel_base=256,
        channel_max=32, end_res=3, mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())
    d_cfg = DiscriminatorConfig(img_resolution=16, channel_base=256,
                                channel_max=32, mbstd_group_size=2)
    cfg = TrainConfig(batch_size=8, batch_gpu=2)
    real = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))

    stats_by_mesh = {}
    for name, mesh in (("dp", make_mesh(jax.devices()[:8])),
                       ("tp", make_mesh(jax.devices()[:8],
                                        model_parallel=2))):
        trainer = GANTrainer(g_cfg, d_cfg, cfg, mesh=mesh)
        with mesh:
            state = trainer.init_state(seed=0)
            if name == "tp":
                specs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                    lambda x: x.sharding.spec, state["g"]["params"]))
                assert any("model" in str(s) for s in specs), specs
            state, stats = trainer.train_iteration(
                state, real, jax.random.PRNGKey(1), step=0)
            jax.block_until_ready(state["g"]["params"])
        stats_by_mesh[name] = stats
        for k, v in stats.items():
            assert np.isfinite(float(jnp.mean(v))), (name, k)

    for k in stats_by_mesh["dp"]:
        np.testing.assert_allclose(
            float(jnp.mean(stats_by_mesh["dp"][k])),
            float(jnp.mean(stats_by_mesh["tp"][k])),
            rtol=2e-4, atol=2e-5, err_msg=k)
