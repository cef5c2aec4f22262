"""Metrics math tests against analytic values (spec: reference metrics/)."""

import numpy as np
import pytest

from morphganformer_tpu.metrics import core
from morphganformer_tpu.metrics.feature_stats import FeatureStats


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    mu = rng.randn(16)
    a = rng.randn(16, 16)
    cov = a @ a.T
    assert core.frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_analytic_isotropic():
    """For isotropic Gaussians: FID = |mu1-mu2|^2 + d*(s1-s2)^2."""
    d = 8
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    s1, s2 = 1.0, 3.0
    fid = core.frechet_distance(mu1, np.eye(d) * s1 ** 2, mu2, np.eye(d) * s2 ** 2)
    want = np.sum((mu1 - mu2) ** 2) + d * (s1 - s2) ** 2
    assert fid == pytest.approx(want, rel=1e-6)


def test_feature_stats_mean_cov():
    rng = np.random.RandomState(1)
    x = rng.randn(5000, 4) * np.array([1, 2, 3, 4]) + np.array([0, 1, 2, 3])
    stats = FeatureStats(capture_mean_cov=True)
    for i in range(0, 5000, 640):
        stats.append(x[i:i + 640])
    mean, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-2, atol=1e-2)


def test_feature_stats_max_items_and_capture_all():
    stats = FeatureStats(capture_all=True, max_items=100)
    stats.append(np.ones((80, 3)))
    stats.append(np.ones((80, 3)))
    assert stats.num_items == 100
    assert stats.is_full()
    assert stats.get_all().shape == (100, 3)


def test_kid_same_distribution_near_zero():
    rng = np.random.RandomState(2)
    a = rng.randn(2000, 16)
    b = rng.randn(2000, 16)
    kid = core.compute_kid_from_features(a, b, num_subsets=20,
                                         max_subset_size=500,
                                         rng=np.random.RandomState(3))
    assert abs(kid) < 0.01
    shifted = b + 2.0
    kid2 = core.compute_kid_from_features(a, shifted, num_subsets=20,
                                          max_subset_size=500,
                                          rng=np.random.RandomState(3))
    assert kid2 > kid + 0.1


def test_inception_score_uniform_is_one():
    probs = np.full((1000, 10), 0.1)
    mean, std = core.compute_is_from_probs(probs, num_splits=5)
    assert mean == pytest.approx(1.0, abs=1e-5)
    # Confident, diverse predictions give high IS.
    onehot = np.eye(10)[np.arange(1000) % 10] * 0.99 + 0.001
    onehot /= onehot.sum(1, keepdims=True)
    mean2, _ = core.compute_is_from_probs(onehot, num_splits=5)
    assert mean2 > 5.0


def test_precision_recall_identical_sets():
    rng = np.random.RandomState(4)
    feats = rng.randn(500, 8).astype(np.float32)
    p, r = core.compute_pr_from_features(feats, feats.copy(), nhood_size=3)
    assert p == pytest.approx(1.0)
    assert r == pytest.approx(1.0)
    far = feats + 100.0
    p2, r2 = core.compute_pr_from_features(feats, far.astype(np.float32))
    assert p2 == pytest.approx(0.0)
    assert r2 == pytest.approx(0.0)


def test_slerp_preserves_norm():
    rng = np.random.RandomState(5)
    a = rng.randn(4, 16)
    b = rng.randn(4, 16)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    for t in [0.0, 0.25, 0.5, 1.0]:
        s = core.slerp(a, b, t)
        np.testing.assert_allclose(np.linalg.norm(s, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(core.slerp(a, b, 0.0), a, atol=1e-6)
    np.testing.assert_allclose(core.slerp(a, b, 1.0), b, atol=1e-5)


def test_registry_end_to_end_with_dummy_detector():
    """compute_metric over a synthetic 'dataset' and 'generator'."""
    import jax

    from morphganformer_tpu.metrics.registry import (
        compute_metric, is_valid_metric, list_valid_metrics)

    assert is_valid_metric("fid50k_full")
    assert "kid50k_full" in list_valid_metrics()

    rng = np.random.RandomState(6)

    def detector(imgs):
        x = np.asarray(imgs, dtype=np.float32).reshape(len(imgs), -1)
        return x[:, :32]

    dataset = [rng.rand(8, 8, 8, 3) * 255 for _ in range(4)]

    def gen(rng_key, batch):
        u = jax.random.uniform(rng_key, (batch, 8, 8, 3))
        return u * 2.0 - 1.0  # [-1, 1] like G output

    result = compute_metric("fid2k_full", detector=detector, dataset=dataset,
                            G=gen, max_items=32, batch=8)
    assert "fid2k_full" in result["results"]
    assert np.isfinite(result["results"]["fid2k_full"])
    assert result["total_time"] > 0
