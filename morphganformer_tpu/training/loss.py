"""StyleGAN2/GANformer adversarial losses, functional JAX form.

Behavioral spec: reference training/loss.py (StyleGAN2Loss): logistic /
logistic_ns / hinge / wgan G&D losses (:78-123), style mixing and component
mixing via a second mapping run (:44-53), path-length regularization through
grad-of-generator (:92-107), R1 gradient penalty on reals (:149-159).

Differences by design:
  * Pure functions of (params, rngs, batch) returning (loss, aux) — gradients
    come from one `jax.value_and_grad` per stage instead of `.backward()`
    accumulation, and the DDP allreduce is replaced by jit/SPMD sharding.
  * Mixing cutoffs are drawn with `jax.random` and applied with an iota mask
    (no dynamic shapes under jit).
  * pl_mean is threaded state (returned in aux), not a mutable buffer.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Reference loss hyperparameters (training/loss.py:20-27)."""
    g_loss: str = "logistic_ns"
    d_loss: str = "logistic"
    style_mixing: float = 0.9
    component_mixing: float = 0.0
    r1_gamma: float = 10.0
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    pl_weight: float = 2.0
    wgan_epsilon: float = 0.001


def _mix_axis(ws, ws2, rng, prob, axis):
    """Replace ws[..., cutoff:, ...] along `axis` with ws2's tail, with
    probability `prob` (reference loss.py:44-53), jit-safe via iota mask."""
    n = ws.shape[axis]
    rng_c, rng_p = jax.random.split(rng)
    cutoff = jax.random.randint(rng_c, (), 1, n)
    cutoff = jnp.where(jax.random.uniform(rng_p) < prob, cutoff, n)
    idx = jax.lax.broadcasted_iota(jnp.int32, ws.shape, axis)
    return jnp.where(idx < cutoff, ws, ws2)


def run_G(model, g_vars, z, c, rng, cfg: LossConfig, train=True,
          update_w_avg=False):
    """Mapping (+mixing) + synthesis (reference loss.py:41-56).
    Returns (img, ws, new_stats) where new_stats is the updated
    'moving_stats' collection (w_avg EMA) or None."""
    from morphganformer_tpu.models.generator import Generator

    rng_mix_s, rng_mix_c, rng_z, rng_noise, rng_mask, rng_drop = jax.random.split(rng, 6)
    rngs = {"noise": rng_noise, "mask": rng_mask, "dropout": rng_drop}

    new_stats = None
    if update_w_avg:
        ws, mutated = model.apply(g_vars, z, c, train=train, rngs=rngs,
                                  mutable=["moving_stats"],
                                  method=Generator.run_mapping)
        new_stats = mutated["moving_stats"]
    else:
        ws = model.apply(g_vars, z, c, train=train, skip_w_avg_update=True,
                         rngs=rngs, method=Generator.run_mapping)
    if cfg.style_mixing > 0 or cfg.component_mixing > 0:
        z2 = jax.random.normal(rng_z, z.shape)
        ws2 = model.apply(g_vars, z2, c, train=train, skip_w_avg_update=True,
                          rngs=rngs, method=Generator.run_mapping)
        if cfg.style_mixing > 0:
            ws = _mix_axis(ws, ws2, rng_mix_s, cfg.style_mixing, axis=2)
        if cfg.component_mixing > 0:
            ws = _mix_axis(ws, ws2, rng_mix_c, cfg.component_mixing, axis=1)

    img, _ = model.apply(g_vars, ws, train=train, rngs=rngs,
                         method=Generator.run_synthesis)
    return img, ws, new_stats


def g_adv_loss(logits, kind: str):
    """Generator adversarial loss (reference loss.py:78-88)."""
    if kind == "logistic":
        return -jax.nn.softplus(logits)
    if kind == "logistic_ns":
        return jax.nn.softplus(-logits)
    if kind == "hinge":
        return -jnp.clip(1.0 + logits, 0, None)
    if kind == "wgan":
        return -logits
    raise ValueError(kind)


def d_adv_loss_gen(logits, kind: str):
    """Discriminator loss on fakes (reference loss.py:113-121)."""
    if kind == "logistic":
        return jax.nn.softplus(logits)
    if kind == "hinge":
        return jnp.clip(1.0 + logits, 0, None)
    if kind == "wgan":
        return logits
    raise ValueError(kind)


def d_adv_loss_real(logits, kind: str, wgan_epsilon=0.001):
    """Discriminator loss on reals (reference loss.py:141-148)."""
    if kind == "logistic":
        return jax.nn.softplus(-logits)
    if kind == "hinge":
        return jnp.clip(1.0 - logits, 0, None)
    if kind == "wgan":
        return -logits + jnp.square(logits) * wgan_epsilon
    raise ValueError(kind)


def g_main_loss(model, d_model, g_vars, d_vars, z, c, rng, cfg: LossConfig):
    """G_main stage (reference loss.py:70-90). Returns (scalar, aux); aux
    carries the updated w_avg moving stats."""
    img, _, new_stats = run_G(model, g_vars, z, c, rng, cfg, update_w_avg=True)
    logits = d_model.apply(d_vars, img, c)
    loss = jnp.mean(g_adv_loss(logits, cfg.g_loss))
    return loss, {"Loss/G/loss": loss, "Loss/scores/fake": jnp.mean(logits),
                  "moving_stats": new_stats}


def g_pl_loss(model, g_vars, z, c, rng, pl_mean, cfg: LossConfig):
    """Path-length regularization (reference loss.py:92-107).
    Returns (scalar, aux incl. new pl_mean).

    PL is a grad-of-grad through synthesis. Since round 4 it defaults to
    the SCOPED packed route (ops/second_order.py with the native launch
    legs: 260.8 ms on-chip at 1024^2 batch 4 vs 324.0 for the best
    force_unpacked XLA trace); MGT_PACKED_SECOND_ORDER=0 falls back to
    force_unpacked. The stage runs at 1/g_reg_interval frequency (lazy
    regularization) either way."""
    from morphganformer_tpu.ops.packed_override import force_unpacked
    from morphganformer_tpu.ops.second_order import (reg_stage_second_order,
                                                     second_order_scope)
    if reg_stage_second_order("pl"):
        with second_order_scope():
            return _g_pl_loss(model, g_vars, z, c, rng, pl_mean, cfg)
    with force_unpacked():
        return _g_pl_loss(model, g_vars, z, c, rng, pl_mean, cfg)


# Per-stage jax.checkpoint defaults for the reg stages' inner forwards,
# set by the round-4 on-chip sweep (tools/profile_reg.py, 1024^2 batch 4
# bf16, one process per config):
#   PL:  no-remat 350.8 ms | dots 324.0 (-7.6%) | dots_nobatch 405.5 |
#        nothing 396.1  -> default "dots" (save dot products, recompute
#        elementwise: the grad-of-grad's second forward pass reuses the
#        conv outputs instead of re-running them).
#   R1:  no-remat 496.9 ms | dots_nobatch and nothing both OOM HBM by
#        ~163 MB at compile  -> default off (XLA's own rematerialization
#        of the reverse-over-reverse D trace is already memory-optimal).
_DEFAULT_REG_REMAT = {"MGT_PL_REMAT": "dots", "MGT_R1_REMAT": ""}


def _reg_remat(fn, env_var):
    """jax.checkpoint around a reg-stage inner forward. Policy picked at
    trace time: env overrides (A/B harness — "off" forces no remat, a
    policy name forces that policy), else _DEFAULT_REG_REMAT."""
    import os

    policy_name = os.environ.get(env_var) or _DEFAULT_REG_REMAT[env_var]
    if not policy_name or policy_name == "off":
        return fn
    policies = {
        "nothing": jax.checkpoint_policies.nothing_saveable,
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_nobatch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    return jax.checkpoint(fn, policy=policies[policy_name])


def _g_pl_loss(model, g_vars, z, c, rng, pl_mean, cfg: LossConfig):
    batch = max(z.shape[0] // cfg.pl_batch_shrink, 1)
    z = z[:batch]
    c = c[:batch] if c is not None else None
    rng_g, rng_noise = jax.random.split(rng)

    @functools.partial(_reg_remat, env_var="MGT_PL_REMAT")
    def img_from_ws(ws, rngs):
        from morphganformer_tpu.models.generator import Generator
        img, _ = model.apply(g_vars, ws, train=True, rngs=rngs,
                             method=Generator.run_synthesis)
        return img

    img, ws, _ = run_G(model, g_vars, z, c, rng_g, cfg)
    pl_noise = jax.random.normal(rng_noise, img.shape) / jnp.sqrt(
        float(img.shape[1] * img.shape[2]))

    rng_n, rng_m, rng_d = jax.random.split(rng_g, 3)
    rngs = {"noise": rng_n, "mask": rng_m, "dropout": rng_d}
    # d/dws of sum(G(ws) * noise)  (create_graph analog: this whole fn sits
    # under the outer value_and_grad).
    pl_grads = jax.grad(
        lambda w: jnp.sum(img_from_ws(w, rngs) * pl_noise))(ws)
    # ws is [B, k, num_ws, w_dim]: sum over num_ws, mean over k, sqrt
    # (reference loss.py:104: square().sum(2).mean(1).sqrt()).
    pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
    new_pl_mean = pl_mean + cfg.pl_decay * (jnp.mean(pl_lengths) - pl_mean)
    pl_penalty = jnp.square(pl_lengths - new_pl_mean)
    loss = jnp.mean(pl_penalty) * cfg.pl_weight
    return loss, {"Loss/pl_penalty": jnp.mean(pl_penalty), "Loss/G/reg": loss,
                  "pl_mean": jax.lax.stop_gradient(new_pl_mean)}


def d_main_loss(model, d_model, g_vars, d_vars, real_img, z, c, rng,
                cfg: LossConfig):
    """D_main stage (reference loss.py:110-148)."""
    img, _, _ = run_G(model, g_vars, z, c, rng, cfg)
    gen_logits = d_model.apply(d_vars, jax.lax.stop_gradient(img), c)
    real_logits = d_model.apply(d_vars, real_img, c)
    loss_gen = jnp.mean(d_adv_loss_gen(gen_logits, cfg.d_loss))
    loss_real = jnp.mean(d_adv_loss_real(real_logits, cfg.d_loss, cfg.wgan_epsilon))
    loss = loss_gen + loss_real
    return loss, {"Loss/D/loss": loss, "Loss/scores/fake": jnp.mean(gen_logits),
                  "Loss/scores/real": jnp.mean(real_logits)}


def d_r1_loss(d_model, d_vars, real_img, c, cfg: LossConfig):
    """R1 gradient penalty (reference loss.py:149-159).

    Since round 4 this defaults to the SCOPED packed route
    (ops/second_order.py native launch legs: 219.1 ms on-chip at 1024^2
    batch 4 vs 496.9 force_unpacked — the packed D tower serves every
    launch-shaped term of the grad-of-grad); MGT_PACKED_SECOND_ORDER=0
    falls back to the force_unpacked XLA trace.
    Runs at 1/d_reg_interval frequency."""
    from morphganformer_tpu.ops.packed_override import force_unpacked
    from morphganformer_tpu.ops.second_order import (reg_stage_second_order,
                                                     second_order_scope)
    if reg_stage_second_order("r1"):
        with second_order_scope():
            return _d_r1_loss(d_model, d_vars, real_img, c, cfg)
    with force_unpacked():
        return _d_r1_loss(d_model, d_vars, real_img, c, cfg)


def _d_r1_loss(d_model, d_vars, real_img, c, cfg: LossConfig):
    @functools.partial(_reg_remat, env_var="MGT_R1_REMAT")
    def logit_sum(img):
        return jnp.sum(d_model.apply(d_vars, img, c))

    r1_grads = jax.grad(logit_sum)(real_img)
    r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
    loss = jnp.mean(r1_penalty) * (cfg.r1_gamma / 2)
    return loss, {"Loss/r1_penalty": jnp.mean(r1_penalty), "Loss/D/reg": loss}
