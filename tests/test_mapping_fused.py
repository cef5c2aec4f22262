"""Fused mapping path: the global + component MLP chains batched into one
computation (VERDICT r2 #8; reference runs them as separate submodules,
networks.py:833-942). The fused and unfused paths must share one param tree
and produce identical outputs and gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from morphganformer_tpu.models import init_generator
from morphganformer_tpu.models.config import GANformerConfig, MappingConfig
from morphganformer_tpu.models.mapping import MappingNetwork


def _cfg(fused: bool, **mapping_overrides) -> GANformerConfig:
    base = GANformerConfig(img_resolution=16, k=5, end_res=4)
    m = dataclasses.replace(base.mapping, num_layers=4, fused=fused,
                            **mapping_overrides)
    return dataclasses.replace(base, mapping=m)


def _apply(cfg, variables, z, **kw):
    model = MappingNetwork(cfg)
    return model.apply(variables, z, **kw)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg(fused=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.k, cfg.z_dim))
    variables = MappingNetwork(cfg).init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        z)
    return cfg, z, variables


def test_param_trees_identical(setup):
    cfg, z, variables = setup
    v_unfused = MappingNetwork(_cfg(fused=False)).init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        z)
    paths = lambda v: set(
        jax.tree_util.tree_flatten_with_path(v)[0][i][0].__repr__()
        for i in range(len(jax.tree_util.tree_leaves(v))))
    assert paths(variables["params"]) == paths(v_unfused["params"])
    # Same init values too (flax derives per-param RNG from the path).
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(v_unfused["params"])):
        assert jnp.allclose(a, b), "init values diverge between paths"


def test_fused_matches_unfused_forward(setup):
    cfg, z, variables = setup
    out_f = _apply(cfg, variables, z)
    out_u = _apply(_cfg(fused=False), variables, z)
    assert out_f.shape == out_u.shape
    assert jnp.max(jnp.abs(out_f - out_u)) < 1e-5


def test_fused_matches_unfused_truncated(setup):
    cfg, z, variables = setup
    out_f = _apply(cfg, variables, z, truncation_psi=0.7)
    out_u = _apply(_cfg(fused=False), variables, z, truncation_psi=0.7)
    assert jnp.max(jnp.abs(out_f - out_u)) < 1e-5


def test_fused_matches_unfused_grads(setup):
    cfg, z, variables = setup

    def loss(zz, c):
        return jnp.sum(jnp.square(_apply(c, variables, zz)))

    g_f = jax.grad(loss)(z, cfg)
    g_u = jax.grad(loss)(z, _cfg(fused=False))
    # Same math, different contraction order: compare relatively (measured
    # max-rel ~1.5e-5 on f32 grads of magnitude ~1e3).
    scale = jnp.max(jnp.abs(g_u))
    assert jnp.max(jnp.abs(g_f - g_u)) / scale < 1e-4


def test_label_conditioned_falls_back(setup):
    """c_dim > 0 makes the global chain wider than the component chain; the
    fused gate must decline and the unfused path must still run. Labels
    force resnet=False: the reference's resnet MLP asserts in_dim == out_dim
    (networks.py:196), so label-conditioned resnet mapping is structurally
    impossible there too."""
    base = GANformerConfig(img_resolution=16, k=5, end_res=4, c_dim=3)
    cfg = dataclasses.replace(
        base, mapping=dataclasses.replace(base.mapping, num_layers=4,
                                          fused=True, resnet=False))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.k, cfg.z_dim))
    c = jnp.eye(3)[jnp.array([0, 2])]
    variables = MappingNetwork(cfg).init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        z, c=c)
    out = MappingNetwork(cfg).apply(variables, z, c=c)
    assert out.shape == (2, cfg.k, cfg.num_ws, cfg.w_dim)


def test_full_generator_fused_vs_unfused():
    """End-to-end: the full generator produces the same image either way."""
    cfg = _cfg(fused=True)
    model, variables = init_generator(cfg, seed=0, batch=1)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.k, cfg.z_dim))
    img_f = jax.jit(lambda v, zz: model.apply(v, zz, noise_mode="const"))(
        variables, z)
    cfg_u = _cfg(fused=False)
    model_u, _ = init_generator(cfg_u, seed=0, batch=1)
    img_u = jax.jit(lambda v, zz: model_u.apply(v, zz, noise_mode="const"))(
        variables, z)
    assert jnp.max(jnp.abs(img_f - img_u)) < 1e-4
