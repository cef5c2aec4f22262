"""EMA-fold semantics (round 5): the blend rides d_main_step's tail.

Pins that one train_iteration applies EXACTLY one reference-formula EMA
update (training_loop.py:212-224) computed from the post-G-stages
params — i.e. folding the blend into d_main changed the dispatch
structure, not the math."""

import jax
import jax.numpy as jnp
import numpy as np

from morphganformer_tpu.models.config import (
    AttentionConfig, DiscriminatorConfig, GANformerConfig, MappingConfig)
from morphganformer_tpu.training.train_step import (
    GANTrainer, TrainConfig, ema_beta, ema_update)


def _small_trainer(**cfg_kw):
    g_cfg = GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3, channel_base=256,
        channel_max=32, end_res=3,
        mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())
    d_cfg = DiscriminatorConfig(img_resolution=16, channel_base=256,
                                channel_max=32, mbstd_group_size=2)
    cfg = TrainConfig(batch_size=4, batch_gpu=4, **cfg_kw)
    return GANTrainer(g_cfg, d_cfg, cfg, mesh=None)


def test_train_iteration_applies_one_reference_ema_update():
    trainer = _small_trainer(g_reg_interval=None, d_reg_interval=None)
    state = trainer.init_state(seed=0)
    gs0 = jax.device_get(state["gs_params"])
    nimg0 = int(state["cur_nimg"])

    real = jax.random.normal(jax.random.PRNGKey(7), (4, 16, 16, 3))
    state, _ = trainer.train_iteration(state, real, jax.random.PRNGKey(1),
                                       step=0)

    assert int(state["cur_nimg"]) == nimg0 + trainer.cfg.batch_size

    # Expected blend: reference beta at the PRE-advance cur_nimg, applied
    # to the post-G-stages params (D stages never touch them).
    beta = float(ema_beta(trainer.cfg.batch_size, jnp.asarray(nimg0),
                          trainer.cfg.ema_kimg, trainer.cfg.ema_rampup))
    expected = ema_update(gs0, jax.device_get(state["g"]["params"]),
                          beta)
    got = jax.device_get(state["gs_params"])
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got))
    for path, leaf in jax.tree_util.tree_leaves_with_path(expected):
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(leaf),
            rtol=1e-5, atol=1e-7,
            err_msg=f"gs_params{jax.tree_util.keystr(path)}")

    # And the blend is non-trivial: params moved, so gs != g and gs != gs0.
    g_now = jax.device_get(state["g"]["params"])
    diffs_g = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        got, g_now)
    diffs_0 = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        got, gs0)
    assert max(jax.tree_util.tree_leaves(diffs_g)) > 0
    assert max(jax.tree_util.tree_leaves(diffs_0)) > 0


def test_standalone_ema_step_matches_tail():
    """The kept ema_step executable applies the same update as the tail
    (so direct users and the historical bench A/B agree)."""
    trainer = _small_trainer(g_reg_interval=None, d_reg_interval=None)
    state = trainer.init_state(seed=3)
    # Make gs and g differ so the blend does something.
    state["g"]["params"] = jax.tree_util.tree_map(
        lambda p: p + 0.01, state["g"]["params"])
    gs0 = jax.device_get(state["gs_params"])
    nimg0 = int(state["cur_nimg"])

    state2 = trainer.ema_step(dict(state))
    beta = float(ema_beta(trainer.cfg.batch_size, jnp.asarray(nimg0),
                          trainer.cfg.ema_kimg, trainer.cfg.ema_rampup))
    expected = ema_update(gs0, jax.device_get(state2["g"]["params"]), beta)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(
        jax.device_get(state2["gs_params"])))
    for path, leaf in jax.tree_util.tree_leaves_with_path(expected):
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(leaf),
            rtol=1e-5, atol=1e-7)
    assert int(state2["cur_nimg"]) == nimg0 + trainer.cfg.batch_size
