"""Lane-packed high-resolution pipeline: parity with the unfused model.

The packed path (ops/pallas_conv.py packed kernels + synthesis.py
packed_block_eligible) is TPU-gated; these tests force it on (interpret
mode) on a small config whose top block satisfies the structural
conditions (in_ch 64 -> out_ch 32, G = 8)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphganformer_tpu.models import synthesis as syn_mod
from morphganformer_tpu.models.config import (
    AttentionConfig,
    GANformerConfig,
    MappingConfig,
)
from morphganformer_tpu.models.generator import Generator


def _small_cfg():
    # Smallest config whose top block passes the packed gate: channels
    # 128 -> 64, G = 8 groups (keeps the interpret-mode kernels cheap).
    return GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3,
        channel_base=1024, channel_max=128, end_res=3,
        mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = _small_cfg()
    model = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.k, cfg.z_dim))
    rngs = {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2),
            "mask": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}
    import os
    old = os.environ.get("MGT_PACKED_SYNTH")
    os.environ["MGT_PACKED_SYNTH"] = "0"
    try:
        variables = model.init(rngs, z, noise_mode="const")
    finally:
        if old is None:
            os.environ.pop("MGT_PACKED_SYNTH", None)
        else:
            os.environ["MGT_PACKED_SYNTH"] = old
    return cfg, model, variables


@pytest.fixture()
def force_packed(monkeypatch):
    orig = syn_mod.packed_block_eligible

    def patched(cfg, res, noise_mode):
        import os
        if os.environ.get("MGT_PACKED_SYNTH", "1") == "0":
            return False
        in_ch = cfg.channels(res // 2)
        out_ch = cfg.channels(res)
        g = (res // 2) * in_ch // 128
        return (cfg.architecture == "resnet" and cfg.style
                and cfg.act == "lrelu" and res > 4
                and not cfg.use_attention(res)
                and noise_mode in ("const", "none")
                and in_ch <= 128 and 128 % in_ch == 0
                and out_ch * 2 == in_ch
                and (res // 2) * in_ch % 128 == 0
                and g % 8 == 0)

    monkeypatch.setattr(syn_mod, "packed_block_eligible", patched)
    # sanity: the top block must actually qualify under the patched gate
    assert patched(_small_cfg(), 16, "const")
    return patched


def test_packed_generator_matches_unpacked(force_packed, monkeypatch,
                                            model_and_vars):
    cfg, model, variables = model_and_vars
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.k, cfg.z_dim))

    monkeypatch.setenv("MGT_PACKED_SYNTH", "0")
    ref = model.apply(variables, z, truncation_psi=0.7, noise_mode="const")

    monkeypatch.setenv("MGT_PACKED_SYNTH", "1")
    got = model.apply(variables, z, truncation_psi=0.7, noise_mode="const")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_generator_grads_match(force_packed, monkeypatch,
                                      model_and_vars):
    cfg, model, variables = model_and_vars
    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    monkeypatch.setenv("MGT_PACKED_SYNTH", "0")

    def loss(zz):
        img = model.apply(variables, zz, truncation_psi=0.7,
                          noise_mode="const")
        return jnp.mean(jnp.square(img))

    g_ref = jax.grad(loss)(z)
    monkeypatch.setenv("MGT_PACKED_SYNTH", "1")
    g_got = jax.grad(loss)(z)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)


def test_packed_training_grads_match(force_packed, monkeypatch,
                                     model_and_vars):
    """Weight gradients through the packed path (training pattern)."""
    cfg, model, variables = model_and_vars
    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.k, cfg.z_dim))
    monkeypatch.setenv("MGT_PACKED_SYNTH", "0")
    params, rest = variables["params"], {k: v for k, v in variables.items()
                                         if k != "params"}

    def loss(p):
        img = model.apply(dict(rest, params=p), z, truncation_psi=0.7,
                          noise_mode="const")
        return jnp.mean(jnp.square(img))

    g_ref = jax.grad(loss)(params)
    monkeypatch.setenv("MGT_PACKED_SYNTH", "1")
    g_got = jax.grad(loss)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(g_got))
    # compare keys via path strings
    got_map = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_got)}
    for k, v in flat_ref:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(got_map[ks]), np.asarray(v),
                                   rtol=5e-3, atol=1e-5, err_msg=ks)


def test_packed_random_noise_matches_unpacked(force_packed, monkeypatch,
                                              model_and_vars):
    """Training path: per-sample random noise flows through the packed
    kernels batched; both paths draw noise with identical flax rng paths
    and shapes, so outputs must match."""
    cfg, model, variables = model_and_vars
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.k, cfg.z_dim))
    rngs = {"noise": jax.random.PRNGKey(7), "mask": jax.random.PRNGKey(8),
            "dropout": jax.random.PRNGKey(9)}

    monkeypatch.setenv("MGT_PACKED_SYNTH", "0")
    ref = model.apply(variables, z, truncation_psi=0.7, noise_mode="random",
                      rngs=rngs)
    monkeypatch.setenv("MGT_PACKED_SYNTH", "1")
    got = model.apply(variables, z, truncation_psi=0.7, noise_mode="random",
                      rngs=rngs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # and gradients to params (what the train step differentiates)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(p, flag):
        monkeypatch.setenv("MGT_PACKED_SYNTH", flag)
        img = model.apply(dict(rest, params=p), z, truncation_psi=0.7,
                          noise_mode="random", rngs=rngs)
        return jnp.mean(jnp.square(img))

    g_ref = jax.grad(lambda p: loss(p, "0"))(params)
    g_got = jax.grad(lambda p: loss(p, "1"))(params)
    ref_map = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_got):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_map[ks]),
                                   rtol=5e-3, atol=1e-5, err_msg=ks)
