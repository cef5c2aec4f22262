"""Fused skip+conv0 resnet launch (fused_packed_upconv2_resnet) parity.

The packed resnet block's skip 1x1-up and conv0 2x-up read the same input;
the fused op computes both in one pallas launch (per-launch floor savings,
ROADMAP round 3). These tests pin it against the two separate packed ops
and against the full unfused model: forward, every weight/style/noise/bias
gradient, the symbolic-zero cotangent combinations the projection path
produces, and the whole generator with MGT_FUSED_SKIP on vs off.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphganformer_tpu.models import synthesis as syn_mod
from morphganformer_tpu.models.config import (AttentionConfig,
                                              GANformerConfig, MappingConfig)
from morphganformer_tpu.models.generator import Generator
from morphganformer_tpu.ops.pallas_conv import (fused_packed_upconv2,
                                                fused_packed_upconv2_resnet)
from morphganformer_tpu.ops.upfirdn2d import setup_filter


GAIN, ALPHA, SKIP_GAIN = float(np.sqrt(2.0)), 0.2, float(np.sqrt(0.5))


def _op_inputs(batch=2, with_noise=True, with_bias=True):
    n, h, wg, cin, cout = batch, 16, 8, 64, 32      # packed P=2, Q=4
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, wg, 128)) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.05
    wsk = jax.random.normal(jax.random.PRNGKey(2), (1, 1, cin, cout)) * 0.05
    s = jax.random.normal(jax.random.PRNGKey(3), (n, cin)) * 0.5 + 1.0
    nz = (jax.random.normal(jax.random.PRNGKey(4), (2 * h, 2 * h)) * 0.01
          if with_noise else None)
    b = (jax.random.normal(jax.random.PRNGKey(5), (cout,)) * 0.1
         if with_bias else None)
    f = setup_filter([1, 3, 3, 1])
    return x, w, s, wsk, f, nz, b


def _pair(x, w, s, wsk, f, nz, b):
    y0 = fused_packed_upconv2(x, w, s, f, nz, b, GAIN, ALPHA, True, False)
    ysk = fused_packed_upconv2(x, wsk, None, f, None, None, SKIP_GAIN, 1.0,
                               False, False)
    return y0, ysk


def _fused(x, w, s, wsk, f, nz, b):
    return fused_packed_upconv2_resnet(x, w, s, wsk, f, nz, b, GAIN, ALPHA,
                                       True, False, SKIP_GAIN)


def test_fused_resnet_forward_matches_pair():
    x, w, s, wsk, f, nz, b = _op_inputs()
    y0r, yskr = _pair(x, w, s, wsk, f, nz, b)
    y0, ysk = _fused(x, w, s, wsk, f, nz, b)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y0r),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ysk), np.asarray(yskr),
                               rtol=1e-6, atol=1e-6)


def test_fused_resnet_grads_match_pair():
    x, w, s, wsk, f, nz, b = _op_inputs()

    def loss_of(op):
        def loss(x, w, s, wsk, nz, b):
            a, k = op(x, w, s, wsk, f, nz, b)
            return jnp.sum(jnp.sin(a * 0.1)) + jnp.sum(jnp.cos(k * 0.1))
        return loss

    argnums = (0, 1, 2, 3, 4, 5)
    gr = jax.grad(loss_of(_pair), argnums)(x, w, s, wsk, nz, b)
    gf = jax.grad(loss_of(_fused), argnums)(x, w, s, wsk, nz, b)
    for name, a, c in zip(["dx", "dw", "ds", "dwsk", "dnoise", "dbias"],
                          gr, gf):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-5, atol=2e-6 * scale,
                                   err_msg=name)


@pytest.mark.parametrize("branch", ["conv0_only", "skip_only"])
def test_fused_resnet_symbolic_zero_cotangents(branch):
    # The projection path differentiates only the latent; a partial read
    # of the outputs makes one cotangent a SymbolicZero — each case must
    # reduce exactly to the corresponding single op's dx.
    x, w, s, wsk, f, nz, b = _op_inputs(batch=1, with_noise=False,
                                        with_bias=False)

    def fused_loss(x):
        a, k = _fused(x, w, s, wsk, f, None, None)
        t = a if branch == "conv0_only" else k
        return jnp.sum(jnp.sin(t * 0.1))

    def single_loss(x):
        if branch == "conv0_only":
            t = fused_packed_upconv2(x, w, s, f, None, None, GAIN, ALPHA,
                                     True, False)
        else:
            t = fused_packed_upconv2(x, wsk, None, f, None, None, SKIP_GAIN,
                                     1.0, False, False)
        return jnp.sum(jnp.sin(t * 0.1))

    np.testing.assert_allclose(np.asarray(jax.grad(fused_loss)(x)),
                               np.asarray(jax.grad(single_loss)(x)),
                               rtol=1e-6, atol=1e-7)


# ---- full-model parity (forced packed path, as in test_packed_pipeline) --


def _small_cfg():
    return GANformerConfig(
        img_resolution=16, z_dim=8, w_dim=8, k=3,
        channel_base=1024, channel_max=128, end_res=3,
        mapping=MappingConfig(num_layers=2),
        attention=AttentionConfig())


@pytest.fixture()
def force_packed(monkeypatch):
    def patched(cfg, res, noise_mode):
        if os.environ.get("MGT_PACKED_SYNTH", "1") == "0":
            return False
        return syn_mod.packed_structural_ok(cfg, res, noise_mode)

    monkeypatch.setattr(syn_mod, "packed_block_eligible", patched)
    assert patched(_small_cfg(), 16, "const")


@pytest.fixture()
def model_and_vars():
    cfg = _small_cfg()
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
    return cfg, model, z, variables


def test_model_fused_skip_matches_packed(force_packed, model_and_vars,
                                         monkeypatch):
    cfg, model, z, variables = model_and_vars

    def run():
        return model.apply(variables, z, truncation_psi=0.8,
                           noise_mode="const")

    monkeypatch.setenv("MGT_FUSED_SKIP", "0")
    base = run()
    monkeypatch.setenv("MGT_FUSED_SKIP", "1")
    fused = run()
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_model_fused_skip_latent_grads_match(force_packed, model_and_vars,
                                             monkeypatch):
    cfg, model, z, variables = model_and_vars

    def loss(z):
        img = model.apply(variables, z, truncation_psi=0.8,
                          noise_mode="const")
        return jnp.mean(jnp.square(img))

    monkeypatch.setenv("MGT_FUSED_SKIP", "0")
    g_base = jax.grad(loss)(z)
    monkeypatch.setenv("MGT_FUSED_SKIP", "1")
    g_fused = jax.grad(loss)(z)
    scale = float(jnp.max(jnp.abs(g_base)))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_base),
                               rtol=1e-4, atol=1e-5 * max(scale, 1e-6))


def test_model_fused_skip_param_grads_match(force_packed, model_and_vars,
                                            monkeypatch):
    # Training path: gradients w.r.t. EVERY parameter (incl. the skip
    # weight routed through the fused launch) must match the separate-op
    # packed path.
    cfg, model, z, variables = model_and_vars
    params = variables["params"]
    buffers = {k: v for k, v in variables.items() if k != "params"}

    def loss(params):
        img = model.apply({"params": params, **buffers}, z,
                          truncation_psi=0.8, noise_mode="const")
        return jnp.mean(jnp.square(img))

    monkeypatch.setenv("MGT_FUSED_SKIP", "0")
    g_base = jax.grad(loss)(params)
    monkeypatch.setenv("MGT_FUSED_SKIP", "1")
    g_fused = jax.grad(loss)(params)
    flat_b = jax.tree_util.tree_leaves_with_path(g_base)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    assert len(flat_b) == len(flat_f)
    for path, gb in flat_b:
        gf = flat_f[path]
        # atol floored at 1e-9: near-zero leaves (e.g. truncated-away
        # mapping biases) differ only in accumulation-order float noise.
        scale = max(float(jnp.max(jnp.abs(gb))), 2e-5)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gb), rtol=5e-4, atol=5e-5 * scale,
            err_msg=jax.tree_util.keystr(path))
