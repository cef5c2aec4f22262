"""Loss-layer tests: pixel losses vs skimage/analytic values, wing losses vs
the reference formulas, LPIPS/MDF/iresnet architecture forward+grad."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphganformer_tpu.losses import (
    adaptive_wing_loss,
    dssim_loss,
    mse_loss,
    psnr,
    ssim,
    wing_loss,
)


def test_psnr_analytic():
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.ones((1, 16, 16, 3)) * 0.2
    # mse = 0.04, psnr = 10*log10(4/0.04) = 20 dB
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)


def test_ssim_identical_is_one():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    assert float(dssim_loss(x, x)) == pytest.approx(0.0, abs=1e-5)


def test_ssim_matches_skimage():
    structural_similarity = pytest.importorskip(
        "skimage.metrics", reason="scikit-image not installed"
    ).structural_similarity
    rng = np.random.RandomState(1)
    a = rng.rand(64, 64).astype(np.float32)
    b = np.clip(a + rng.randn(64, 64).astype(np.float32) * 0.1, 0, 1)
    want = structural_similarity(a, b, gaussian_weights=True, sigma=1.5,
                                 use_sample_covariance=False, data_range=1.0)
    got = float(ssim(jnp.asarray(a)[None, :, :, None],
                     jnp.asarray(b)[None, :, :, None], data_range=1.0))
    assert got == pytest.approx(want, abs=5e-3)


def test_wing_loss_piecewise():
    """Check both branches against the reference formulas
    (wing_loss.py:18-27), omega=10, epsilon=2."""
    omega, eps = 10.0, 2.0
    c = omega - omega * np.log(1 + omega / eps)
    pred = jnp.asarray([[0.0, 0.0]])
    # Small residual (5 < omega): log branch.
    tgt = jnp.asarray([[5.0, 5.0]])
    want = omega * np.log(1 + 5.0 / eps)
    assert float(wing_loss(pred, tgt)) == pytest.approx(want, rel=1e-6)
    # Large residual (20 >= omega): linear branch.
    tgt = jnp.asarray([[20.0, 20.0]])
    assert float(wing_loss(pred, tgt)) == pytest.approx(20.0 - c, rel=1e-6)


def test_adaptive_wing_loss_branches():
    """Reference adaptive_wing_loss.py:18-39: omega=14 theta=0.5 eps=1 alpha=2.1."""
    omega, theta, eps, alpha = 14.0, 0.5, 1.0, 2.1
    y = 0.3
    p = alpha - y
    # Small delta branch (reference normalizes by OMEGA here, not eps —
    # adaptive_wing_loss.py:33; golden-tested in test_golden_reference).
    pred, tgt = jnp.asarray([0.1]), jnp.asarray([y])
    delta = abs(y - 0.1)
    want = omega * np.log(1 + (delta / omega) ** p)
    assert float(adaptive_wing_loss(pred, tgt)) == pytest.approx(want, rel=1e-3)
    # Large delta branch.
    pred = jnp.asarray([2.0])
    delta = abs(y - 2.0)
    a = omega * (1 / (1 + (theta / eps) ** p)) * p * \
        ((theta / eps) ** (p - 1)) / eps
    c = theta * a - omega * np.log(1 + (theta / eps) ** p)
    assert float(adaptive_wing_loss(pred, tgt)) == pytest.approx(
        a * delta - c, rel=1e-5)


def test_wing_loss_gradients():
    g = jax.grad(lambda p: wing_loss(p, jnp.ones((2, 3)) * 4))(jnp.zeros((2, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_lpips_architecture_forward_and_grad():
    from morphganformer_tpu.losses.lpips import (
        lpips_distance, make_lpips_loss, random_lpips_params)

    rng = np.random.RandomState(2)
    img0 = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    img1 = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    for net in ("alex", "vgg", "squeeze"):
        params = random_lpips_params(net)
        # jit: eager tower dispatch is ~10x slower on the 1-CPU box and the
        # persistent compile cache makes warm suite runs skip the compile.
        dist = jax.jit(lambda p, a, b, n=net: lpips_distance(p, a, b, net=n))
        d = dist(params, img0, img1)
        assert d.shape == (2,)
        assert np.all(np.asarray(d) >= 0)
        d_same = dist(params, img0, img0)
        np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)

    alex_params = random_lpips_params("alex")
    g = jax.jit(jax.grad(
        lambda x, p, b: make_lpips_loss(p, "alex")(x, b)))(
            img0, alex_params, img1)
    assert float(jnp.abs(g).sum()) > 0


def test_mdf_loss_forward_and_grad():
    from morphganformer_tpu.losses.mdf import make_mdf_loss, random_mdf_params

    ds = random_mdf_params(num_discs=3)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    loss_fn = make_mdf_loss(ds, num_scales=3)
    assert float(loss_fn(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(loss_fn(x, y)) > 0
    g = jax.grad(lambda a: loss_fn(a, y))(x)
    assert float(jnp.abs(g).sum()) > 0


def test_iresnet_embedding_and_identity_loss():
    from morphganformer_tpu.losses.face_embedding import (
        cosine_similarity, iresnet_embed, make_identity_loss,
        random_iresnet_params)

    params = random_iresnet_params("iresnet18")
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 112, 112, 3).astype(np.float32)) * 2 - 1
    emb = jax.jit(iresnet_embed)(params, x)
    assert emb.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(emb)))

    loss_fn = jax.jit(lambda p, a, b: make_identity_loss(p)(a, b))
    y = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    x64 = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    assert float(loss_fn(params, x64, x64)) == pytest.approx(0.0, abs=1e-6)
    assert float(loss_fn(params, x64, y)) > 0
    sim = jax.jit(cosine_similarity)(params, x64, x64)
    np.testing.assert_allclose(np.asarray(sim), 1.0, atol=1e-4)


@pytest.mark.slow  # heaviest tower compile in the default suite (~60s cold);
# the iresnet/lpips/mdf tower tests keep converter-shape coverage by default
def test_facenet_architecture():
    from morphganformer_tpu.losses.facenet import (
        facenet_embed, make_facenet_loss, random_facenet_params)

    params = random_facenet_params()
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(2, 160, 160, 3).astype(np.float32)) * 2 - 1
    e = jax.jit(facenet_embed)(params, x)
    assert e.shape == (2, 512)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(e, axis=-1)), 1.0,
                               rtol=1e-5)
    # Params stay traced args (a jitted closure would embed them as XLA
    # constants -> huge executable, cache-unfriendly).
    loss = jax.jit(lambda p, a, b: make_facenet_loss(p)(a, b))
    y = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)) * 2 - 1
    assert float(loss(params, y, y)) == pytest.approx(0.0, abs=1e-6)
    g = jax.jit(jax.grad(lambda a, p, b: make_facenet_loss(p)(a, b)))(
        y, params, -y)
    assert float(jnp.abs(g).sum()) > 0


def test_landmark_net_and_differentiable_wing():
    from morphganformer_tpu.losses.landmarks import (
        make_landmark_fn, random_landmark_params, soft_argmax)
    from morphganformer_tpu.losses.wing import make_wing_loss_term

    params = random_landmark_params()
    fn = make_landmark_fn(params, image_size=64)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    c = fn(x)
    assert c.shape == (2, 68, 2)
    assert 0 <= float(c.min()) and float(c.max()) <= 64

    # soft_argmax decodes a peaked heatmap to its peak location.
    hm = jnp.full((1, 64, 64, 1), -10.0).at[0, 10, 50, 0].set(10.0)
    xy = soft_argmax(hm)
    assert float(xy[0, 0, 0]) == pytest.approx((50 + 0.5) / 64, abs=0.02)  # x
    assert float(xy[0, 0, 1]) == pytest.approx((10 + 0.5) / 64, abs=0.02)  # y

    wing = make_wing_loss_term(fn)
    y = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    g = jax.grad(lambda a: wing(a, y))(x)
    assert float(jnp.abs(g).sum()) > 0


def test_lbp_codes_and_soft_variant():
    from morphganformer_tpu.losses.lbp import (
        lbp_distance, local_binary_pattern, soft_lbp_loss)

    rng = np.random.RandomState(8)
    img = (rng.rand(32, 32) * 255).astype(np.uint8)
    codes = local_binary_pattern(img)
    assert codes.shape == (32, 32) and codes.dtype == np.uint8
    # A constant image: all neighbors >= center -> code 255 everywhere.
    flat = np.full((16, 16), 100, np.uint8)
    assert np.all(local_binary_pattern(flat) == 255)
    assert lbp_distance(img, img) == 0.0

    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    assert float(soft_lbp_loss(a, a)) == pytest.approx(0.0, abs=1e-7)
    assert float(soft_lbp_loss(a, b)) > 0


def test_loss_stack_with_perceptual_terms():
    """The CLI path: extra terms plug into the weighted stack."""
    from morphganformer_tpu.losses.lpips import make_lpips_loss, random_lpips_params
    from morphganformer_tpu.losses.stack import build_loss_stack

    lpips_term = make_lpips_loss(random_lpips_params("alex"), "alex")
    loss_fn = build_loss_stack({"lpips": 1.0, "mse": 1.0},
                               extra_terms={"lpips": lpips_term})
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)) * 2 - 1
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)) * 2 - 1
    total, comps = loss_fn(a, b)
    assert set(comps) == {"lpips", "mse"}
    assert float(total) > 0
