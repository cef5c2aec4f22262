"""Projection engine tests: true gradient descent through G converges on a
self-generated target (the property the reference's severed-graph projection
lacks, SURVEY.md §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphganformer_tpu.losses.stack import build_loss_stack, parse_loss_spec
from morphganformer_tpu.models import init_generator
from morphganformer_tpu.projection.engine import (
    ProjectionConfig,
    cosine_ramp_lr,
    latent_stats,
    project,
)
from tests.test_models import small_cfg


def test_cosine_ramp_lr_matches_reference_formula():
    import math
    for t in [0.0, 0.01, 0.05, 0.3, 0.7, 0.76, 0.9, 1.0]:
        ramp = min(1.0, (1 - t) / 0.25)
        ramp = 0.5 - 0.5 * math.cos(ramp * math.pi)
        want = 0.1 * ramp * min(1, t / 0.05)
        got = float(cosine_ramp_lr(jnp.asarray(t), 0.1))
        assert got == pytest.approx(want, abs=1e-6)


def test_parse_loss_spec():
    assert parse_loss_spec("mse") == {"mse": 1.0}
    assert parse_loss_spec("lpips+mse") == {"lpips": 1.0, "mse": 1.0}
    assert parse_loss_spec("lpips+0.01*wing+1*mse") == {
        "lpips": 1.0, "wing": 0.01, "mse": 1.0}


def test_loss_stack_components():
    loss_fn = build_loss_stack({"mse": 1.0, "ssim": 0.5})
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.ones((1, 16, 16, 3)) * 0.5
    total, comps = loss_fn(a, b)
    assert set(comps) == {"mse", "ssim"}
    assert float(total) == pytest.approx(
        float(comps["mse"]) + 0.5 * float(comps["ssim"]), rel=1e-6)
    with pytest.raises(KeyError):
        build_loss_stack({"nope": 1.0})


def test_latent_stats_shapes():
    cfg = small_cfg()
    mean, std = latent_stats(None, None, cfg, jax.random.PRNGKey(0),
                             n_mean_latent=1000)
    assert mean.shape == (cfg.k, cfg.z_dim)
    assert np.abs(np.asarray(mean)).mean() < 0.1       # near zero
    # Reference std is a global scalar ~ sqrt(k * z_dim).
    assert float(std) == pytest.approx(np.sqrt(cfg.k * cfg.z_dim), rel=0.1)


def test_projection_converges_on_self_target():
    """Project a target the generator itself produced: loss must fall by a
    large factor within 150 steps — evidence of true end-to-end gradients."""
    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)

    z_true = jax.random.normal(jax.random.PRNGKey(42), (1, cfg.k, cfg.z_dim))
    target = model.apply(variables, z_true, truncation_psi=0.7,
                         noise_mode="const")

    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(1),
                             n_mean_latent=512)
    pcfg = ProjectionConfig(steps=150, chunk=50, lr=0.05, n_mean_latent=512)
    loss_fn = build_loss_stack({"mse": 1.0})
    result = project(model, variables, target, loss_fn, pcfg, mean, std,
                     rng=jax.random.PRNGKey(2))

    first = float(result.loss_history[0])
    assert result.best_loss < first * 0.25, \
        f"projection failed to converge: {first} -> {result.best_loss}"
    assert result.latent.shape == (1, cfg.k, cfg.z_dim)
    assert result.best_img.shape == target.shape
    assert result.loss_history.shape == (150,)
    assert "mse" in result.components_history
    # Best image matches the best loss.
    mse = float(jnp.mean((result.best_img - target) ** 2))
    assert mse == pytest.approx(result.best_loss, rel=1e-3)


def test_batched_projection_per_image_best():
    """Morph-pair style batch-2 projection tracks per-image bests."""
    import dataclasses

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=2)
    z_true = jax.random.normal(jax.random.PRNGKey(7), (2, cfg.k, cfg.z_dim))
    targets = model.apply(variables, z_true, truncation_psi=0.7,
                          noise_mode="const")
    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(1),
                             n_mean_latent=256)
    pcfg = ProjectionConfig(steps=100, chunk=50, lr=0.05)
    loss_fn = build_loss_stack({"mse": 1.0})
    res = project(model, variables, targets, loss_fn, pcfg, mean, std,
                  rng=jax.random.PRNGKey(2))
    assert res.latent.shape == (2, cfg.k, cfg.z_dim)
    assert res.per_image_loss.shape == (2,)
    # Each best image matches its own target at its own best loss.
    for i in range(2):
        mse = float(jnp.mean((res.best_img[i] - targets[i]) ** 2))
        assert mse == pytest.approx(float(res.per_image_loss[i]), rel=1e-3)


def test_projection_independent_of_progress_callback():
    """Identical config/seed must yield identical latents whether or not a
    progress callback chunks the execution (ADVICE r2: noise windows are
    keyed per cfg.chunk, not per scan call)."""
    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)
    z_true = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.k, cfg.z_dim))
    target = model.apply(variables, z_true, truncation_psi=0.7,
                         noise_mode="const")
    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(1),
                             n_mean_latent=256)
    pcfg = ProjectionConfig(steps=60, chunk=25, lr=0.05)
    loss_fn = build_loss_stack({"mse": 1.0})
    res_plain = project(model, variables, target, loss_fn, pcfg, mean, std,
                        rng=jax.random.PRNGKey(2))
    calls = []
    res_prog = project(model, variables, target, loss_fn, pcfg, mean, std,
                       rng=jax.random.PRNGKey(2),
                       progress=lambda s, l, b: calls.append(s))
    assert calls == [25, 50, 60]
    np.testing.assert_array_equal(np.asarray(res_plain.latent),
                                  np.asarray(res_prog.latent))
    np.testing.assert_allclose(np.asarray(res_plain.loss_history),
                               np.asarray(res_prog.loss_history), rtol=1e-6)


def test_projection_converges_in_bfloat16():
    """The performance configuration (bf16 synthesis) still descends."""
    import dataclasses

    cfg = dataclasses.replace(small_cfg(), dtype="bfloat16")
    model, variables = init_generator(cfg, seed=0, batch=1)
    z_true = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.k, cfg.z_dim))
    target = model.apply(variables, z_true, truncation_psi=0.7,
                         noise_mode="const")
    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(4),
                             n_mean_latent=256)
    pcfg = ProjectionConfig(steps=120, chunk=60, lr=0.05)
    res = project(model, variables, target, build_loss_stack({"mse": 1.0}),
                  pcfg, mean, std, rng=jax.random.PRNGKey(5))
    first = float(res.loss_history[0])
    assert res.best_loss < first * 0.35, (first, res.best_loss)


def test_morph_roundtrip():
    from morphganformer_tpu.morph import (
        demorph_latent, load_latent_mat, morph_latents, save_latent_mat)
    import tempfile, os

    rng = np.random.RandomState(0)
    w1 = rng.randn(17, 32).astype(np.float32)
    w2 = rng.randn(17, 32).astype(np.float32)
    morph = morph_latents(w1, w2)
    np.testing.assert_allclose(morph, 0.5 * w1 + 0.5 * w2, rtol=1e-6)
    # De-morph recovers the second identity given the first.
    rec = demorph_latent(morph, w1)
    np.testing.assert_allclose(rec, w2, rtol=1e-4, atol=1e-5)
    # .mat round trip (reference output format).
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "w.mat")
        save_latent_mat(p, w1)
        back = load_latent_mat(p)
        np.testing.assert_allclose(back, w1, rtol=1e-6)


def test_w_plus_projection_converges():
    """W+ mode optimizes per-layer ws (VERDICT r1 #5): init = mapped prior
    mean, loss must fall substantially, and best_step must be consistent
    with the per-image tracker (ADVICE r1: carried through the scan)."""
    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)

    z_true = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.k, cfg.z_dim))
    target = model.apply(variables, z_true, truncation_psi=0.7,
                         noise_mode="const")

    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(1),
                             n_mean_latent=256)
    pcfg = ProjectionConfig(steps=120, chunk=40, lr=0.02, n_mean_latent=256,
                            w_plus=True)
    loss_fn = build_loss_stack({"mse": 1.0})
    result = project(model, variables, target, loss_fn, pcfg, mean, std,
                     rng=jax.random.PRNGKey(2))

    assert result.latent.ndim == 4                        # [B, k, num_ws, w]
    assert result.latent.shape == (1, cfg.k, cfg.num_ws, cfg.w_dim)
    first = float(result.loss_history[0])
    assert result.best_loss < first * 0.5, \
        f"W+ projection failed to converge: {first} -> {result.best_loss}"
    # best_step comes from the scan carry, not chunk-mean argmin.
    assert 0 <= result.best_step < pcfg.steps
    assert int(result.per_image_step[0]) == result.best_step


def _reference_noise_fns():
    """Extract the reference's noise_regularize/noise_normalize_ function
    definitions (1024_example_MSE.py:31-59) by AST so the golden executes
    the reference code without importing the script's heavy module scope
    (lpips/loader/dlib)."""
    import ast

    path = "/root/reference/1024_example_MSE.py"
    if not __import__("os").path.exists(path):
        pytest.skip("reference repository not mounted")
    torch = pytest.importorskip("torch")
    with open(path, encoding="utf-8-sig") as f:
        tree = ast.parse(f.read())
    wanted = {n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name in ("noise_regularize", "noise_normalize_")}
    ns = {"torch": torch}
    for node in wanted.values():
        mod = ast.Module(body=[node], type_ignores=[])
        exec(compile(mod, path, "exec"), ns)
    return ns["noise_regularize"], ns["noise_normalize_"], torch


def test_noise_regularize_matches_reference():
    """Golden: the multi-scale autocorrelation penalty and the noise
    normalization match the reference's (parsed-but-never-called)
    implementations, executed."""
    from morphganformer_tpu.projection.engine import (
        noise_regularize_loss, normalize_noises)

    ref_reg, ref_norm, torch = _reference_noise_fns()
    rng = np.random.RandomState(0)
    maps = {f"b{s}/noise_const": rng.randn(s, s).astype(np.float32)
            for s in (4, 8, 16, 64)}

    ref_val = ref_reg([torch.from_numpy(m)[None, None] for m in maps.values()])
    ours_val = noise_regularize_loss({k: jnp.asarray(v)
                                      for k, v in maps.items()})
    np.testing.assert_allclose(float(ours_val), float(ref_val), rtol=1e-5)

    ref_tensors = [torch.from_numpy(m.copy())[None, None]
                   for m in maps.values()]
    ref_norm(ref_tensors)
    ours_norm = normalize_noises({k: jnp.asarray(v) for k, v in maps.items()})
    for t, k in zip(ref_tensors, maps):
        # torch .std() is the sample std (ddof=1); jnp.std is population —
        # the maps re-normalize every step so the 1/(n-1) factor washes out;
        # compare at the matching ddof.
        m = maps[k]
        expect = (m - m.mean()) / (m.std(ddof=1) + 0)
        np.testing.assert_allclose(np.asarray(t[0, 0]), expect, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ours_norm[k]),
            (m - m.mean()) / (m.std(ddof=0) + 1e-8), rtol=1e-4)


def test_projection_with_noise_regularize():
    """cfg.noise_regularize > 0: the per-layer const-noise maps co-optimize
    with the latent (the behavior the reference's dead flag was for)."""
    import dataclasses

    from morphganformer_tpu.projection.engine import split_noise_buffers

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)
    # Random init zeros every noise_strength; give the maps real influence
    # so gradients flow into them.
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.full_like(v, 0.5)
        if any(getattr(e, "key", None) == "noise_strength" for e in p) else v,
        variables)

    z_true = jax.random.normal(jax.random.PRNGKey(42), (1, cfg.k, cfg.z_dim))
    target = model.apply(variables, z_true, truncation_psi=0.7,
                         noise_mode="const")
    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(1),
                             n_mean_latent=256)
    pcfg = ProjectionConfig(steps=100, chunk=50, lr=0.05,
                            noise_regularize=1e3)
    loss_fn = build_loss_stack({"mse": 1.0})
    res = project(model, variables, target, loss_fn, pcfg, mean, std,
                  rng=jax.random.PRNGKey(2))

    first = float(res.loss_history[0])
    assert res.best_loss < first * 0.5, \
        f"noise-regularized projection diverged: {first} -> {res.best_loss}"
    # The optimized maps come back, keyed like the buffer tree, normalized,
    # and actually different from the init.
    init_noises = split_noise_buffers(variables)
    assert res.noises is not None and set(res.noises) == set(init_noises)
    moved = 0.0
    for k, n in res.noises.items():
        assert float(jnp.abs(jnp.mean(n))) < 1e-3
        assert float(jnp.std(n)) == pytest.approx(1.0, abs=1e-2)
        moved += float(jnp.max(jnp.abs(n - init_noises[k])))
    assert moved > 1e-3, "noise maps never moved"
    # best_img regeneration uses the BEST noise maps (loss reproduces).
    mse = float(jnp.mean((res.best_img - target) ** 2))
    assert mse == pytest.approx(res.best_loss, rel=1e-3)

    # Disabled path: unchanged contract.
    res0 = project(model, variables, target, loss_fn,
                   dataclasses.replace(pcfg, noise_regularize=0.0, steps=4),
                   mean, std, rng=jax.random.PRNGKey(2))
    assert res0.noises is None


def test_w_plus_projection_with_noise_regularize():
    """W+ mode composes with noise-map co-optimization."""
    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)
    z_true = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.k, cfg.z_dim))
    target = model.apply(variables, z_true, truncation_psi=0.7,
                         noise_mode="const")
    mean, std = latent_stats(model, variables, cfg, jax.random.PRNGKey(1),
                             n_mean_latent=128)
    pcfg = ProjectionConfig(steps=40, chunk=20, lr=0.05, w_plus=True,
                            noise_regularize=1e3)
    loss_fn = build_loss_stack({"mse": 1.0})
    res = project(model, variables, target, loss_fn, pcfg, mean, std,
                  rng=jax.random.PRNGKey(2))
    assert res.noises is not None
    assert res.latent.ndim == 4  # [B, k, num_ws, w_dim]
    assert res.best_loss < float(res.loss_history[0])
    # Regeneration contract holds in W+ mode with optimized noises too.
    mse = float(jnp.mean((res.best_img - target) ** 2))
    assert mse == pytest.approx(res.best_loss, rel=1e-3)
