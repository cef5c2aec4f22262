"""Real LPIPS calibration-head conversion tests (VERDICT r2 #3).

The reference bundles its LPIPS linear heads at
/root/reference/lpips/weights/v0.1/{alex,vgg,squeeze}.pth (loaded by the
reference at lpips/__init__.py:13-41); the feature towers are
torchvision-pretrained and unavailable in a zero-egress env. These tests
convert the real heads with `--tower none` semantics and assert the
converted lin{k} vectors equal the torch state-dict values bit-for-bit,
are non-negative (the trained heads are), and match the tower channel
widths — then run the loss as "real calibration x placeholder tower".

Skipped when /root/reference is not mounted.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from morphganformer_tpu.losses.lpips import (LPIPS_CHANNELS,
                                             load_lpips_params,
                                             make_lpips_loss)

REF_HEADS = "/root/reference/lpips/weights/v0.1"
_HAVE_REF = os.path.isdir(REF_HEADS)

pytestmark = pytest.mark.skipif(
    not _HAVE_REF, reason="reference LPIPS heads not mounted")

torch = pytest.importorskip("torch")

NETS = ["alex", "vgg", "squeeze"]


@pytest.fixture(scope="module")
def heads_npz(tmp_path_factory):
    from tools.convert_lpips import convert_lins

    d = tmp_path_factory.mktemp("lpips")
    paths = {}
    for net in NETS:
        out = d / f"lpips_{net}.npz"
        np.savez(out, **convert_lins(os.path.join(REF_HEADS, f"{net}.pth")))
        paths[net] = str(out)
    return paths


def test_heads_match_torch_state_dict(heads_npz):
    for net in NETS:
        data = np.load(heads_npz[net])
        state = torch.load(os.path.join(REF_HEADS, f"{net}.pth"),
                           map_location="cpu", weights_only=True)
        chans = LPIPS_CHANNELS[net]
        assert len(data.files) == len(chans)
        for k, c in enumerate(chans):
            got = data[f"lin{k}"]
            ref = state[f"lin{k}.model.1.weight"].numpy().reshape(-1)
            assert got.shape == (c,)
            np.testing.assert_array_equal(got, ref.astype(np.float32))
            assert (got >= 0).all(), f"{net} lin{k} has negative weights"


def test_heads_only_npz_loads_with_placeholder_tower(heads_npz):
    for net in NETS:
        params = load_lpips_params(heads_npz[net], net)
        assert params.get("tower_source") == "random"
        assert len(params["lins"]) == len(LPIPS_CHANNELS[net])
        params.pop("tower_source")
        loss = make_lpips_loss(params, net)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        y = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        val = float(loss(x, y))
        assert np.isfinite(val) and val > 0
        assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_cli_tower_none(tmp_path):
    """`python tools/convert_lpips.py alex out.npz --tower none` writes a
    heads-only npz from the bundled reference heads."""
    out = tmp_path / "alex_heads.npz"
    r = subprocess.run(
        [sys.executable, os.path.join("tools", "convert_lpips.py"),
         "alex", str(out), "--tower", "none",
         "--lins", os.path.join(REF_HEADS, "alex.pth")],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert r.returncode == 0, r.stderr
    data = np.load(out)
    assert sorted(data.files) == [f"lin{k}" for k in range(5)]
