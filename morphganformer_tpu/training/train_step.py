"""Jitted adversarial training steps with data-parallel mesh sharding.

Behavioral spec: reference training/training_loop.py:157-224 — lazy
regularization stages (G_main every step, G_reg every 4, D_main every step,
D_reg every 16) with Adam lr/beta rescaled by mb_ratio = r/(r+1)
(training_loop.py:162-174, run_network.py:158-159), NaN-scrubbed grads
(:203-205), and EMA generator update with ramped beta (:212-224).

TPU-first: instead of one process per GPU + DDP/NCCL allreduce
(run_network.py:394-402), all nets live replicated on a
`jax.sharding.Mesh(('data',))` and the batch is sharded along 'data'; the
SPMD partitioner inserts the gradient all-reduce over ICI automatically.
Gradient accumulation (training_loop.py:186-209) is a `lax.scan` over
microbatches inside the jitted step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from morphganformer_tpu.models.config import DiscriminatorConfig, GANformerConfig
from morphganformer_tpu.models.discriminator import Discriminator
from morphganformer_tpu.models.generator import Generator
from morphganformer_tpu.training.loss import (
    LossConfig,
    d_main_loss,
    d_r1_loss,
    g_main_loss,
    g_pl_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference training defaults (run_network.py:463-468, :37)."""
    batch_size: int = 32           # global batch
    batch_gpu: int = 4             # microbatch per accumulation round per chip
    g_lr: float = 0.002
    d_lr: float = 0.002
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8
    g_reg_interval: Optional[int] = 4
    d_reg_interval: Optional[int] = 16
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = None
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)


def _nan_scrub(tree):
    """nan->0, +-inf->+-1e5 on grads (reference training_loop.py:203-205)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), tree)


def make_optimizer(lr, beta1, beta2, eps, reg_interval):
    """Adam with lazy-regularization rescale (training_loop.py:166-170)."""
    if reg_interval is not None:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        beta1, beta2 = beta1 ** mb_ratio, beta2 ** mb_ratio
    return optax.adam(lr, b1=beta1, b2=beta2, eps=eps)


def ema_beta(batch_size, cur_nimg, ema_kimg, ema_rampup):
    """Reference update_ema_network beta (training_loop.py:212-224)."""
    ema_nimg = ema_kimg * 1000
    if ema_rampup is not None:
        ema_nimg = jnp.minimum(ema_nimg, cur_nimg * ema_rampup)
    return 0.5 ** (batch_size / jnp.maximum(ema_nimg, 1e-8))


def ema_update(gs_params, g_params, beta):
    return jax.tree_util.tree_map(
        lambda e, p: p + beta * (e - p), gs_params, g_params)


class GANTrainer:
    """Owns the four jitted stage steps + EMA for one (G, D) pair."""

    def __init__(self, g_cfg: GANformerConfig, d_cfg: DiscriminatorConfig,
                 cfg: TrainConfig, mesh: Optional[Mesh] = None):
        self.g_cfg, self.d_cfg, self.cfg = g_cfg, d_cfg, cfg
        self.G = Generator(g_cfg)
        self.D = Discriminator(d_cfg)
        self.mesh = mesh
        self.g_opt = make_optimizer(cfg.g_lr, cfg.beta1, cfg.beta2, cfg.eps,
                                    cfg.g_reg_interval)
        self.d_opt = make_optimizer(cfg.d_lr, cfg.beta1, cfg.beta2, cfg.eps,
                                    cfg.d_reg_interval)

    # -------------- state --------------

    def init_state(self, seed=0):
        g_cfg = self.g_cfg
        z = jnp.zeros((1, g_cfg.k, g_cfg.z_dim))
        img = jnp.zeros((max(4, 1), self.d_cfg.img_resolution,
                         self.d_cfg.img_resolution, self.d_cfg.img_channels))
        rngs = {"params": jax.random.PRNGKey(seed),
                "noise": jax.random.PRNGKey(seed + 1),
                "mask": jax.random.PRNGKey(seed + 2),
                "dropout": jax.random.PRNGKey(seed + 3)}
        g_vars = self.G.init(rngs, z, noise_mode="const")
        d_vars = self.D.init(jax.random.PRNGKey(seed + 4), img)
        state = {
            "g": dict(g_vars),
            "d": dict(d_vars),
            # EMA copies must be distinct buffers (donation aliasing).
            "gs_params": jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
            "gs_stats": jax.tree_util.tree_map(
                jnp.copy, g_vars.get("moving_stats", {})),
            "g_opt": self.g_opt.init(g_vars["params"]),
            "d_opt": self.d_opt.init(d_vars["params"]),
            "pl_mean": jnp.zeros([], jnp.float32),
            "cur_nimg": jnp.zeros([], jnp.int32),
        }
        if self.mesh is not None:
            replicated = NamedSharding(self.mesh, P())
            state = jax.device_put(state, replicated)
        return state

    def _shard_batch(self, x):
        if self.mesh is None or x is None:
            return x
        return jax.device_put(x, NamedSharding(self.mesh, P("data")))

    # -------------- stages --------------

    def _g_vars(self, state):
        v = {"params": state["g"]["params"]}
        if "moving_stats" in state["g"]:
            v["moving_stats"] = state["g"]["moving_stats"]
        if "buffers" in state["g"]:
            v["buffers"] = state["g"]["buffers"]
        return v

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def g_main_step(self, state, z, c, rng):
        def loss_fn(params):
            g_vars = dict(self._g_vars(state), params=params)
            return g_main_loss(self.G, self.D, g_vars, {"params": state["d"]["params"]},
                               z, c, rng, self.cfg.loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["g"]["params"])
        grads = _nan_scrub(grads)
        updates, new_opt = self.g_opt.update(grads, state["g_opt"],
                                             state["g"]["params"])
        state["g"]["params"] = optax.apply_updates(state["g"]["params"], updates)
        state["g_opt"] = new_opt
        new_stats = aux.pop("moving_stats")
        if new_stats is not None:
            state["g"]["moving_stats"] = new_stats
        return state, aux

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def g_reg_step(self, state, z, c, rng):
        gain = float(self.cfg.g_reg_interval or 1)

        def loss_fn(params):
            g_vars = dict(self._g_vars(state), params=params)
            loss, aux = g_pl_loss(self.G, g_vars, z, c, rng, state["pl_mean"],
                                  self.cfg.loss)
            return loss * gain, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["g"]["params"])
        grads = _nan_scrub(grads)
        updates, new_opt = self.g_opt.update(grads, state["g_opt"],
                                             state["g"]["params"])
        state["g"]["params"] = optax.apply_updates(state["g"]["params"], updates)
        state["g_opt"] = new_opt
        state["pl_mean"] = aux.pop("pl_mean")
        return state, aux

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def d_main_step(self, state, real_img, z, c, rng):
        def loss_fn(params):
            return d_main_loss(self.G, self.D, self._g_vars(state),
                               {"params": params}, real_img, z, c, rng,
                               self.cfg.loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["d"]["params"])
        grads = _nan_scrub(grads)
        updates, new_opt = self.d_opt.update(grads, state["d_opt"],
                                             state["d"]["params"])
        state["d"]["params"] = optax.apply_updates(state["d"]["params"], updates)
        state["d_opt"] = new_opt
        return state, aux

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def d_reg_step(self, state, real_img, c):
        gain = float(self.cfg.d_reg_interval or 1)

        def loss_fn(params):
            loss, aux = d_r1_loss(self.D, {"params": params}, real_img, c,
                                  self.cfg.loss)
            return loss * gain, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["d"]["params"])
        grads = _nan_scrub(grads)
        updates, new_opt = self.d_opt.update(grads, state["d_opt"],
                                             state["d"]["params"])
        state["d"]["params"] = optax.apply_updates(state["d"]["params"], updates)
        state["d_opt"] = new_opt
        return state, aux

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def ema_step(self, state):
        beta = ema_beta(self.cfg.batch_size, state["cur_nimg"],
                        self.cfg.ema_kimg, self.cfg.ema_rampup)
        state["gs_params"] = ema_update(state["gs_params"], state["g"]["params"],
                                        beta)
        if "moving_stats" in state["g"]:
            state["gs_stats"] = state["g"]["moving_stats"]
        state["cur_nimg"] = state["cur_nimg"] + self.cfg.batch_size
        return state

    # -------------- one full iteration --------------

    def train_iteration(self, state, real_img, rng, step: int, c=None):
        """Run all stages due at `step` on one global batch."""
        g_cfg = self.g_cfg
        real_img = self._shard_batch(real_img)
        c = self._shard_batch(c)
        batch = real_img.shape[0]
        rngs = jax.random.split(rng, 8)
        z = jax.random.normal(rngs[0], (batch, g_cfg.k, g_cfg.z_dim))
        z = self._shard_batch(z)

        stats = {}
        state, aux = self.g_main_step(state, z, c, rngs[1])
        stats.update(aux)
        if self.cfg.g_reg_interval and step % self.cfg.g_reg_interval == 0:
            state, aux = self.g_reg_step(state, z, c, rngs[2])
            stats.update(aux)
        state, aux = self.d_main_step(state, real_img, z, c, rngs[3])
        stats.update(aux)
        if self.cfg.d_reg_interval and step % self.cfg.d_reg_interval == 0:
            state, aux = self.d_reg_step(state, real_img, c)
            stats.update(aux)
        state = self.ema_step(state)
        return state, stats


def make_data_mesh(devices=None) -> Mesh:
    """1-axis data-parallel mesh over all devices (SURVEY.md §2.8)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def dryrun_train_step(n_devices: int) -> None:
    """Tiny end-to-end multi-device training step used by the driver's
    multichip dry run and by tests."""
    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, \
        f"need {n_devices} devices, have {len(jax.devices())}"
    mesh = make_data_mesh(devices)

    from morphganformer_tpu.models.config import AttentionConfig, MappingConfig
    g_cfg = GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3, channel_base=256,
        channel_max=32, end_res=3,
        mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())
    d_cfg = DiscriminatorConfig(img_resolution=16, channel_base=256,
                                channel_max=32, mbstd_group_size=2)
    cfg = TrainConfig(batch_size=2 * n_devices, batch_gpu=2)

    trainer = GANTrainer(g_cfg, d_cfg, cfg, mesh=mesh)
    with mesh:
        state = trainer.init_state(seed=0)
        real = jax.random.normal(jax.random.PRNGKey(0),
                                 (2 * n_devices, 16, 16, 3))
        state, stats = trainer.train_iteration(state, real,
                                               jax.random.PRNGKey(1), step=0)
        jax.block_until_ready(state["g"]["params"])
    for k, v in stats.items():
        assert np.isfinite(float(jnp.mean(v))), f"non-finite stat {k}"
    print(f"dryrun_multichip ok on {n_devices} devices; "
          f"stats: { {k: round(float(jnp.mean(v)), 4) for k, v in stats.items()} }")
