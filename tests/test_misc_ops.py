"""Tests for grid_sample, the stats collector, and bf16/f32 model agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_grid_sample_identity():
    from morphganformer_tpu.ops.grid_sample import grid_sample

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.linspace(-1, 1, 8), jnp.linspace(-1, 1, 8),
                          indexing="ij")
    grid = jnp.tile(jnp.stack([xs, ys], axis=-1)[None], (2, 1, 1, 1))
    out = grid_sample(x, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_grid_sample_interpolates_and_zero_pads():
    from morphganformer_tpu.ops.grid_sample import grid_sample

    x = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(1.0)
    # Sample midway between the 4 corners -> average 0.25.
    grid = jnp.zeros((1, 1, 1, 2))
    out = grid_sample(x, grid)
    assert float(out[0, 0, 0, 0]) == pytest.approx(0.25)
    # Far outside -> 0.
    grid = jnp.full((1, 1, 1, 2), 5.0)
    assert float(grid_sample(x, grid)[0, 0, 0, 0]) == 0.0


def test_grid_sample_second_order_grads():
    from morphganformer_tpu.ops.grid_sample import grid_sample

    x = jnp.asarray(np.random.RandomState(1).rand(1, 4, 4, 1), jnp.float32)

    def f(g):
        return jnp.sum(grid_sample(x, g) ** 2)

    g0 = jnp.zeros((1, 2, 2, 2))
    gg = jax.grad(lambda g: jnp.sum(jax.grad(f)(g) ** 2))(g0)
    assert np.all(np.isfinite(np.asarray(gg)))


def test_stats_collector_moments():
    from morphganformer_tpu.training.stats import Collector

    c = Collector()
    rng = np.random.RandomState(2)
    xs = rng.randn(1000) * 2 + 3
    for chunk in np.split(xs, 10):
        c.report("Loss/x", chunk)
    assert c.mean("Loss/x") == pytest.approx(xs.mean(), abs=1e-6)
    assert c.std("Loss/x") == pytest.approx(xs.std(), abs=1e-6)
    c.report_dict({"a": 1.0, "a": 2.0})
    assert "a" in c.names()
    d = c.as_dict()
    assert d["Loss/x"]["num"] == 1000
    c.reset()
    assert not c.names()


def test_stats_jsonl_roundtrip(tmp_path):
    import json

    from morphganformer_tpu.training.stats import Collector

    c = Collector()
    c.report("Loss/G/loss", [1.0, 2.0, 3.0])
    path = str(tmp_path / "stats.jsonl")
    c.write_jsonl(path, kimg=1.5)
    with open(path) as f:
        entry = json.loads(f.readline())
    assert entry["Loss/G/loss"]["mean"] == pytest.approx(2.0)
    assert entry["kimg"] == 1.5


def test_bfloat16_model_close_to_float32():
    """The bf16 performance config stays within perceptual tolerance of the
    f32 reference path on identical weights."""
    import dataclasses

    from morphganformer_tpu.models import Generator, init_generator
    from tests.test_models import small_cfg

    cfg32 = small_cfg()
    model32, variables = init_generator(cfg32, seed=0, batch=1)
    cfg16 = dataclasses.replace(cfg32, dtype="bfloat16")
    model16 = Generator(cfg16)

    z = jax.random.normal(jax.random.PRNGKey(5), (1, cfg32.k, cfg32.z_dim))
    a = np.asarray(model32.apply(variables, z, noise_mode="none"))
    b = np.asarray(model16.apply(variables, z, noise_mode="none"))
    assert b.dtype == np.float32  # RGB accumulates in f32
    # Tolerance: bf16 has ~2-3 decimal digits; images live in [-1, 1].
    assert np.abs(a - b).mean() < 0.03
    assert np.abs(a - b).max() < 0.3
