"""Feature extraction loops for metrics.

Behavioral spec: metrics/metric_utils.py — dataset-side extraction with stats
caching (:166-208) and generator-side sampling (:222-263: z ~ N(0,1), G at
psi=1, [-1,1] -> uint8 range before the detector).

`detector` is any callable batch_imgs -> features (jit it yourself for TPU);
`dataset` is any iterable yielding NHWC uint8/float batches; `G` is a
(model, variables, cfg) bundle or a callable rng,batch -> images.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np

from morphganformer_tpu.metrics.feature_stats import FeatureStats


def _to_detector_range(imgs):
    """[-1,1] float -> quantized [0,255] float, matching the reference
    EXACTLY (metric_utils.py:250-252: `(img * 127.5 + 128).clamp(0,
    255).to(torch.uint8)` — note +128, not +127.5, and the uint8
    truncation): detector features, hence FID, are sensitive to the
    quantization grid once real Inception weights are in play. Inputs
    already in uint8 range pass through with a clamp only (dataset images
    are quantized at the source)."""
    x = np.asarray(imgs, dtype=np.float32)
    if x.max() <= 1.5:  # assume [-1, 1]
        x = np.clip(x * 127.5 + 128.0, 0, 255).astype(np.uint8)
        return x.astype(np.float32)
    return np.clip(x, 0, 255)


def features_for_dataset(detector, dataset: Iterable, max_items=None,
                         capture_all=False, capture_mean_cov=False,
                         cache_path: Optional[str] = None, **_kw):
    """Extract detector features over a dataset iterable, with optional
    stats cache (reference metric_utils.py:176-195)."""
    import os
    if cache_path is not None and os.path.exists(cache_path):
        return FeatureStats.load(cache_path)
    stats = FeatureStats(capture_all=capture_all,
                         capture_mean_cov=capture_mean_cov,
                         max_items=max_items)
    for batch in dataset:
        if stats.is_full():
            break
        feats = np.asarray(detector(_to_detector_range(batch)))
        stats.append(feats)
    if cache_path is not None:
        stats.save(cache_path)
    return stats


def features_for_generator(detector, G, max_items=50000, batch=16,
                           capture_all=False, capture_mean_cov=False,
                           seed=0, **_kw):
    """Sample z -> G -> detector (reference metric_utils.py:222-263)."""
    import jax

    sample = _make_sampler(G, batch)
    stats = FeatureStats(capture_all=capture_all,
                         capture_mean_cov=capture_mean_cov,
                         max_items=max_items)
    rng = jax.random.PRNGKey(seed)
    while not stats.is_full():
        rng, sub = jax.random.split(rng)
        imgs = sample(sub)
        feats = np.asarray(detector(_to_detector_range(imgs)))
        stats.append(feats)
    return stats


def probs_for_generator(detector, G, max_items=50000, batch=16, seed=0, **_kw):
    """Class-probability extraction for IS (reference inception_score.py)."""
    stats = features_for_generator(detector, G, max_items=max_items,
                                   batch=batch, capture_all=True, seed=seed)
    return stats.get_all()


def _make_sampler(G, batch):
    """Normalize the generator argument into rng -> NHWC images."""
    import jax

    if callable(G) and not isinstance(G, tuple):
        return lambda rng: G(rng, batch)
    model, variables, cfg = G

    @jax.jit
    def forward(z):
        return model.apply(variables, z, noise_mode="const")

    def sample(rng):
        z = jax.random.normal(rng, (batch, cfg.k, cfg.z_dim))
        return forward(z)

    return sample
