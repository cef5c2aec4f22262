"""Second-order autodiff through the regularization stages with the
packed pallas paths active.

The packed kernels carry custom VJPs whose backwards are raw pallas
launches — only first-order differentiable. Path-length regularization
(grad-of-grad through G, reference training/loss.py:92-107) and R1
(grad-of-grad through D, :149-159) both trace inside
`packed_override.force_unpacked()` by default, falling back to XLA
layers (the on-chip A/B has that faster than the scoped
second-order-wrapper route for both stages; MGT_PACKED_SECOND_ORDER=1
opts into the wrappers, ops/second_order.py). These tests
force the packed gates on (production structural predicate, CPU
interpret mode) and assert (a) with BOTH guards disabled
(MGT_PACKED_SECOND_ORDER=0 kill switch + a gate that ignores
packed_paths_disabled) the stage really does crash — the bug being
guarded against — and (b) the shipped g_pl_loss/d_r1_loss take
gradients cleanly through their default routes.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# Model-level grad-of-grad in interpret mode: 15-80 s per test on the
# 1-CPU box. The fast default selection keeps the per-op scope/policy
# coverage in test_packed_second_order_gated.py.
pytestmark = pytest.mark.slow

import morphganformer_tpu.models.discriminator as disc_mod
from morphganformer_tpu.models import synthesis as syn_mod
from morphganformer_tpu.models.config import (
    AttentionConfig,
    DiscriminatorConfig,
    GANformerConfig,
    MappingConfig,
)
from morphganformer_tpu.models.discriminator import Discriminator
from morphganformer_tpu.models.generator import Generator
from morphganformer_tpu.ops.packed_override import packed_paths_disabled
from morphganformer_tpu.training.loss import (
    LossConfig,
    d_r1_loss,
    g_pl_loss,
)


def _g_cfg():
    # Same as test_packed_pipeline._small_cfg: top block 128 -> 64 passes
    # the packed structural gate.
    return GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3,
        channel_base=1024, channel_max=128, end_res=3,
        mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())


def _d_cfg():
    return DiscriminatorConfig(
        img_resolution=32, channel_base=1024, channel_max=128,
        architecture="resnet", mbstd_group_size=2)


@pytest.fixture()
def force_packed_g(monkeypatch):
    """Production gate minus only the TPU-backend check — in particular it
    DOES consult packed_paths_disabled(), like production."""
    def patched(cfg, res, noise_mode):
        if packed_paths_disabled():
            return False
        if os.environ.get("MGT_PACKED_SYNTH", "1") == "0":
            return False
        return syn_mod.packed_structural_ok(cfg, res, noise_mode)

    monkeypatch.setattr(syn_mod, "packed_block_eligible", patched)
    assert patched(_g_cfg(), 16, "random")


@pytest.fixture()
def force_packed_g_no_override(monkeypatch):
    """The gate WITHOUT the override check: reproduces the pre-fix bug."""
    def patched(cfg, res, noise_mode):
        return syn_mod.packed_structural_ok(cfg, res, noise_mode)

    monkeypatch.setattr(syn_mod, "packed_block_eligible", patched)


@pytest.fixture()
def force_packed_d(monkeypatch):
    def patched(cfg, res):
        if packed_paths_disabled():
            return False
        if os.environ.get("MGT_PACKED_D", "1") == "0":
            return False
        return disc_mod.packed_d_structural_ok(cfg, res)

    monkeypatch.setattr(disc_mod, "packed_d_block_eligible", patched)
    assert patched(_d_cfg(), 32)


@pytest.fixture()
def force_packed_d_no_override(monkeypatch):
    def patched(cfg, res):
        return disc_mod.packed_d_structural_ok(cfg, res)

    monkeypatch.setattr(disc_mod, "packed_d_block_eligible", patched)


def _init_g(cfg):
    model = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.k, cfg.z_dim))
    rngs = {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2),
            "mask": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}
    old = os.environ.get("MGT_PACKED_SYNTH")
    os.environ["MGT_PACKED_SYNTH"] = "0"
    try:
        variables = model.init(rngs, z, noise_mode="const")
    finally:
        if old is None:
            os.environ.pop("MGT_PACKED_SYNTH", None)
        else:
            os.environ["MGT_PACKED_SYNTH"] = old
    return model, variables, z


def _pl_grads(model, variables, z):
    cfg = LossConfig(style_mixing=0.0)

    def loss_fn(params):
        g_vars = dict(variables, params=params)
        loss, _ = g_pl_loss(model, g_vars, z, None, jax.random.PRNGKey(7),
                            jnp.float32(0.0), cfg)
        return loss

    return jax.grad(loss_fn)(variables["params"])


def test_pl_crashes_without_override(force_packed_g_no_override,
                                     monkeypatch):
    # Kill switch forces the force_unpacked route; with the gate also
    # ignoring packed_paths_disabled, the bare packed launches reach the
    # grad-of-grad trace — the pre-fix crash.
    monkeypatch.setenv("MGT_PACKED_SECOND_ORDER", "0")
    model, variables, z = _init_g(_g_cfg())
    with pytest.raises(Exception):
        _pl_grads(model, variables, z)


def test_pl_second_order_with_packed_gates(force_packed_g):
    model, variables, z = _init_g(_g_cfg())
    grads = _pl_grads(model, variables, z)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # the flag must be restored after tracing
    assert not packed_paths_disabled()


def _r1_grads(model, variables, img):
    cfg = LossConfig()

    def loss_fn(params):
        loss, _ = d_r1_loss(model, {"params": params}, img, None, cfg)
        return loss

    return jax.grad(loss_fn)(variables["params"])


def _init_d(cfg):
    model = Discriminator(cfg)
    img = jax.random.normal(jax.random.PRNGKey(1),
                            (2, cfg.img_resolution, cfg.img_resolution, 3))
    old = os.environ.get("MGT_PACKED_D")
    os.environ["MGT_PACKED_D"] = "0"
    try:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    finally:
        if old is None:
            os.environ.pop("MGT_PACKED_D", None)
        else:
            os.environ["MGT_PACKED_D"] = old
    return model, variables, img


def test_r1_crashes_without_override(force_packed_d_no_override,
                                     monkeypatch):
    """The pre-fix hazard this file documents: a bare packed launch in a
    grad-of-grad trace has no JVP rule. Reproducing it now requires
    forcing the force_unpacked FALLBACK route (MGT_PACKED_SECOND_ORDER=0)
    — the round-4 default routes R1 through second_order_scope(), whose
    wrappers make the trace differentiable (no crash by design)."""
    monkeypatch.setenv("MGT_PACKED_SECOND_ORDER", "0")
    model, variables, img = _init_d(_d_cfg())
    with pytest.raises(Exception):
        _r1_grads(model, variables, img)


def test_r1_second_order_with_packed_gates(force_packed_d):
    model, variables, img = _init_d(_d_cfg())
    grads = _r1_grads(model, variables, img)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert not packed_paths_disabled()
