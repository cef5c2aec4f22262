"""Real-weight MDF conversion + parity tests (VERDICT r2 #2).

The reference environment bundles the only full pretrained loss networks
available here: /root/reference/mdf-main/weights/Ds_{SISR,Denoising,JPEG}.pth,
loaded by the reference at mdfloss.py:16-48. These tests convert the real
pickles with the stub unpickler (no reference code executed) and assert the
JAX MDF activations match a hand-rolled numpy forward computed directly from
the captured torch tensors (OIHW conv + un-folded BatchNorm), rtol<=1e-4.

Skipped when /root/reference is not mounted.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from morphganformer_tpu.losses.mdf import mdf_loss, wdiscriminator_taps

REF_WEIGHTS = "/root/reference/mdf-main/weights"
_HAVE_REF = os.path.isdir(REF_WEIGHTS)

pytestmark = pytest.mark.skipif(
    not _HAVE_REF, reason="reference MDF weights not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def sisr_npz(tmp_path_factory):
    from tools.convert_mdf import convert

    out = tmp_path_factory.mktemp("mdf") / "mdf_sisr.npz"
    convert(os.path.join(REF_WEIGHTS, "Ds_SISR.pth"), str(out))
    return str(out)


def _np_conv2d(x, w, b, pad):
    """Naive NCHW conv, stride 1 (executable spec for the parity check)."""
    n, cin, h, wd = x.shape
    cout, _, kh, kw = w.shape
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh, ow = x.shape[2] - kh + 1, x.shape[3] - kw + 1
    # im2col
    cols = np.zeros((n, cin, kh, kw, oh, ow), np.float32)
    for i in range(kh):
        for j in range(kw):
            cols[:, :, i, j] = x[:, :, i:i + oh, j:j + ow]
    y = np.einsum("ncijhw,ocij->nohw", cols, w, optimize=True)
    return y + b[None, :, None, None]


def _np_bn(x, gamma, beta, mean, var, eps=1e-5):
    return (x - mean[None, :, None, None]) / np.sqrt(
        var[None, :, None, None] + eps) * gamma[None, :, None, None] \
        + beta[None, :, None, None]


def _np_taps(sd, x, pad):
    """Numpy WDiscriminator forward from raw torch tensors
    (SinGAN/models.py:28-36, is_loss=True)."""
    def block(x, pre):
        y = _np_conv2d(x, sd[f"{pre}.conv.weight"], sd[f"{pre}.conv.bias"], pad)
        y = _np_bn(y, sd[f"{pre}.norm.weight"], sd[f"{pre}.norm.bias"],
                   sd[f"{pre}.norm.running_mean"], sd[f"{pre}.norm.running_var"])
        return np.where(y >= 0, y, 0.2 * y)

    x1 = block(x, "head")
    x2 = x1
    j = 1
    while f"body.block{j}.conv.weight" in sd:
        x2 = block(x2, f"body.block{j}")
        j += 1
    x3 = _np_conv2d(x2, sd["tail.weight"], sd["tail.bias"], pad)
    return [x1, x2, x3]


def test_all_three_real_files_convert(tmp_path):
    from tools.convert_mdf import convert, load_mdf_params

    expected = {"Ds_SISR.pth": 9, "Ds_Denoising.pth": 9, "Ds_JPEG.pth": 8}
    for fname, n_discs in expected.items():
        out = tmp_path / (fname + ".npz")
        convert(os.path.join(REF_WEIGHTS, fname), str(out))
        ds, padding = load_mdf_params(str(out), with_padding=True)
        assert len(ds) == n_discs
        assert padding == 0
        for d in ds:
            # SinGAN doubles nfc every few scales; in channels are RGB.
            assert d["head"]["w"].shape[-2] == 3
            assert d["head"]["w"].shape[-1] >= 32
            assert d["tail_w"].shape[-1] == 1


def test_real_weight_activation_parity(sisr_npz):
    """JAX taps from the converted npz == numpy forward from the raw torch
    tensors, for every discriminator in the stack."""
    from tools.convert_mdf import (_load_ds_stubbed, _named_tensors,
                                   load_mdf_params)

    ds, padding = load_mdf_params(sisr_npz, with_padding=True)
    torch_ds = _load_ds_stubbed(os.path.join(REF_WEIGHTS, "Ds_SISR.pth"))
    rng = np.random.RandomState(0)
    x_nchw = rng.randn(2, 3, 16, 16).astype(np.float32)
    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))

    for i, (d_jax, d_torch) in enumerate(zip(ds, torch_ds)):
        sd = {k: np.asarray(v, np.float32)
              for k, v in _named_tensors(d_torch)}
        ref_taps = _np_taps(sd, x_nchw, padding)
        got_taps = wdiscriminator_taps(d_jax, x_nhwc, padding)
        assert len(got_taps) == len(ref_taps) == 3
        for got, ref in zip(got_taps, ref_taps):
            got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
            np.testing.assert_allclose(got_nchw, ref, rtol=1e-4, atol=1e-5,
                                       err_msg=f"disc {i}")


def test_real_weight_loss_runs(sisr_npz):
    from tools.convert_mdf import load_mdf_params

    ds, padding = load_mdf_params(sisr_npz, with_padding=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    loss = float(mdf_loss(ds, x, y, num_scales=8, padding=padding))
    assert np.isfinite(loss) and loss > 0
    assert float(mdf_loss(ds, x, x, num_scales=8, padding=padding)) == \
        pytest.approx(0.0, abs=1e-6)
