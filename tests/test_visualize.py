"""Visualization suite tests (spec: reference training/visualize.py vis())."""

import numpy as np
import pytest
from PIL import Image

from morphganformer_tpu.models import init_generator
from morphganformer_tpu.training import visualize
from tests.test_models import small_cfg


@pytest.fixture(scope="module")
def bundle():
    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)
    return cfg, model, variables


def test_sample_grid(bundle, tmp_path):
    cfg, model, variables = bundle
    path = str(tmp_path / "grid.png")
    grid = visualize.sample_grid(model, variables, cfg, num=4, path=path)
    assert isinstance(grid, Image.Image)
    assert grid.size == (32, 32)  # 2x2 grid of 16px tiles
    assert Image.open(path).size == (32, 32)


def test_interpolation_grid(bundle, tmp_path):
    cfg, model, variables = bundle
    grid = visualize.interpolation_grid(model, variables, cfg, steps=4,
                                        space="z",
                                        path=str(tmp_path / "interp.png"))
    assert grid.size == (4 * 16, 16)
    # Single-component interpolation only varies one component.
    grid2 = visualize.interpolation_grid(model, variables, cfg, steps=3,
                                         space="w", component=0)
    assert grid2.size == (3 * 16, 16)


def test_style_mixing_table(bundle):
    cfg, model, variables = bundle
    grid = visualize.style_mixing_table(model, variables, cfg, num_rows=2,
                                        num_cols=2, cutoff=2)
    assert grid.size == (2 * 16, 2 * 16)


def test_noise_variance_map(bundle):
    cfg, model, variables = bundle
    import jax

    # Nonzero noise strengths so the variance map is meaningful.
    import jax.numpy as jnp
    variables2 = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.ones_like(v) * 0.3
        if any(getattr(p, "key", None) == "noise_strength" for p in path)
        else v, variables)
    pil = visualize.noise_variance_map(model, variables2, cfg, samples=4)
    assert pil.size == (16, 16)


def test_attention_blends(bundle, tmp_path):
    cfg, model, variables = bundle
    blends = visualize.attention_blends(model, variables, cfg, num=2,
                                        out_dir=str(tmp_path))
    assert blends.shape == (2, 16, 16, 3)
    import os
    assert os.path.exists(tmp_path / "attention_0.png")
    assert os.path.exists(tmp_path / "sample_1.png")
