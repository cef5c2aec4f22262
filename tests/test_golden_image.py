"""Golden-image parity harness vs the PyTorch reference (SURVEY.md §4b).

Protocol: convert a real pretrained snapshot with tools/convert_checkpoint.py,
dump a fixed ws tensor and the reference implementation's generated image for
that ws with its stored noise buffers (noise_mode='const' here injects the
converted noise_const buffers, bypassing RNG mismatch — SURVEY.md §7.2.5),
then require SSIM >= 0.99 (BASELINE.md north star).

Zero-egress environments have no pretrained weights, so the test skips unless
$MGT_GOLDEN_DIR points at a directory with:
    ckpt/            converted checkpoint (arch.json + Gs.msgpack)
    ws.npy           [1, k, num_ws, w_dim] float32 (reference mapping output)
    reference.png    reference G(ws) image (RGB)
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.environ.get("MGT_GOLDEN_DIR")

pytestmark = pytest.mark.skipif(
    not GOLDEN_DIR,
    reason="golden-image parity needs real pretrained weights: set "
           "MGT_GOLDEN_DIR to a dir with ckpt/, ws.npy, reference.png "
           "(see module docstring; weights are not available in the "
           "zero-egress build environment)")


def test_golden_image_ssim():
    import jax.numpy as jnp
    from PIL import Image

    from morphganformer_tpu.checkpoint.io import load_generator
    from morphganformer_tpu.losses.pixel import ssim

    cfg, model, variables = load_generator(os.path.join(GOLDEN_DIR, "ckpt"),
                                           role="Gs")
    ws = jnp.asarray(np.load(os.path.join(GOLDEN_DIR, "ws.npy")))
    img, _ = model.apply(variables, ws, noise_mode="const",
                         method=type(model).run_synthesis)

    ref = np.asarray(Image.open(
        os.path.join(GOLDEN_DIR, "reference.png")).convert("RGB"),
        dtype=np.float32) / 127.5 - 1.0
    got = np.asarray(img[0], dtype=np.float32)
    assert got.shape == ref.shape, (got.shape, ref.shape)

    score = float(ssim(jnp.asarray(got)[None], jnp.asarray(ref)[None]))
    assert score >= 0.99, f"SSIM {score:.4f} < 0.99 vs reference image"
