"""InceptionV3 detector + PPL tests (plumbing with random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def inception_params():
    from morphganformer_tpu.metrics.inception import random_inception_params
    return random_inception_params()


def test_inception_shapes(inception_params):
    from morphganformer_tpu.metrics.inception import (
        inception_features, inception_probs)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 75, 75, 3) * 255,
                    jnp.float32)
    f = inception_features(inception_params, x)
    assert f.shape == (2, 2048)
    p = inception_probs(inception_params, x)
    assert p.shape == (2, 1000)
    np.testing.assert_allclose(np.asarray(jnp.sum(p, axis=1)), 1.0, rtol=1e-4)


def test_inception_detector_in_fid_pipeline(inception_params):
    from morphganformer_tpu.metrics.inception import make_detector
    from morphganformer_tpu.metrics.extract import features_for_dataset

    det = make_detector(inception_params, jit=True)
    rng = np.random.RandomState(1)
    dataset = [rng.rand(4, 32, 32, 3) * 255 for _ in range(2)]
    stats = features_for_dataset(det, dataset, max_items=8,
                                 capture_mean_cov=True)
    mean, cov = stats.get_mean_cov()
    assert mean.shape == (2048,)
    assert np.all(np.isfinite(mean))


def test_inception_converter_roundtrip(inception_params, tmp_path):
    """random params -> flat npz naming -> loader reproduces the tree."""
    from tools.convert_inception import load_inception_npz

    flat = {}
    for tag, val in inception_params.items():
        if tag in ("fc_w", "fc_b"):
            flat[tag] = np.asarray(val)
        elif "w" in val:  # plain conv_bn block
            for leaf in ("w", "scale", "shift"):
                flat[f"{tag}_{leaf}"] = np.asarray(val[leaf])
        else:  # mixed block of branches
            for branch, bp in val.items():
                for leaf in ("w", "scale", "shift"):
                    flat[f"{tag}.{branch}_{leaf}"] = np.asarray(bp[leaf])
    path = str(tmp_path / "inc.npz")
    np.savez(path, **flat)
    loaded = load_inception_npz(path)

    from morphganformer_tpu.metrics.inception import inception_features
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3) * 255,
                    jnp.float32)
    a = inception_features(inception_params, x)
    b = inception_features(loaded, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_ppl_smoke():
    from tests.test_models import small_cfg
    from morphganformer_tpu.metrics.ppl import compute_ppl
    from morphganformer_tpu.models import init_generator

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=2)
    feat = lambda img: jnp.mean(img.reshape(img.shape[0], -1, 16), axis=1)
    for space in ("w", "z"):
        ppl = compute_ppl(model, variables, cfg, feat, num_samples=8,
                          batch=4, space=space, crop=False)
        assert np.isfinite(ppl) and ppl >= 0
