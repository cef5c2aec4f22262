"""Packed discriminator tower parity: the lane-packed [N, H, G, 128]
D blocks (frgb entry + same-res conv0 + fused down-conv1 with in-kernel
resnet skip-add, ops/pallas_conv.py packed-discriminator section) must
reproduce the unpacked XLA tower exactly — outputs and gradients."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import morphganformer_tpu.models.discriminator as disc_mod
from morphganformer_tpu.models.config import DiscriminatorConfig
from morphganformer_tpu.models.discriminator import Discriminator


def _cfg():
    # channels: 32->32 (Q=4, G=8), 16->64 (Q=2, G=8), 8->128 (structural
    # exit: out == in), 4->128. Packed prefix = b32, b16; the b16 output
    # has P=1 so leaving the packed domain is the identity reshape.
    return DiscriminatorConfig(
        img_resolution=32, channel_base=1024, channel_max=128,
        architecture="resnet", mbstd_group_size=2)


@pytest.fixture()
def force_packed(monkeypatch):
    def patched(cfg, res):
        # Production structural predicate, minus only the TPU-backend and
        # res>=512 production conditions (tests run interpreted on CPU).
        if os.environ.get("MGT_PACKED_D", "1") == "0":
            return False
        return disc_mod.packed_d_structural_ok(cfg, res)

    monkeypatch.setattr(disc_mod, "packed_d_block_eligible", patched)
    assert patched(_cfg(), 32) and patched(_cfg(), 16)
    assert not patched(_cfg(), 8)


def _init_unpacked(cfg, batch):
    model = Discriminator(cfg)
    img = jnp.zeros((batch, cfg.img_resolution, cfg.img_resolution, 3))
    old = os.environ.get("MGT_PACKED_D")
    os.environ["MGT_PACKED_D"] = "0"
    try:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    finally:
        if old is None:
            os.environ.pop("MGT_PACKED_D", None)
        else:
            os.environ["MGT_PACKED_D"] = old
    return model, variables


def test_packed_discriminator_matches_unpacked(force_packed):
    cfg = _cfg()
    model, variables = _init_unpacked(cfg, 4)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))

    packed = model.apply(variables, img)
    os.environ["MGT_PACKED_D"] = "0"
    try:
        unpacked = model.apply(variables, img)
    finally:
        os.environ.pop("MGT_PACKED_D", None)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(unpacked),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_packed_discriminator_grads_match(force_packed):
    """Training pattern: d(scores)/d(params, img) through the packed
    tower (custom-VJP dconv + modconv adjoints, dw via the XLA
    composition vjp) == the unpacked autodiff."""
    cfg = _cfg()
    model, variables = _init_unpacked(cfg, 2)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss(params, im):
        return jnp.sum(jnp.sin(model.apply({"params": params}, im)))

    gp_packed, gi_packed = jax.grad(loss, argnums=(0, 1))(
        variables["params"], img)
    os.environ["MGT_PACKED_D"] = "0"
    try:
        gp_ref, gi_ref = jax.grad(loss, argnums=(0, 1))(
            variables["params"], img)
    finally:
        os.environ.pop("MGT_PACKED_D", None)

    np.testing.assert_allclose(np.asarray(gi_packed), np.asarray(gi_ref),
                               rtol=2e-3, atol=2e-4)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp_packed),
            jax.tree_util.tree_leaves_with_path(gp_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa))
