"""LPIPS perceptual loss in JAX (NHWC).

Behavioral spec: the vendored lpips/ package in the reference —
PerceptualLoss(model='net-lin', net in {alex, vgg, squeeze})
(lpips/__init__.py:13-41), PNetLin forward (networks_basic.py:27-92):
ScalingLayer -> feature tower -> unit-normalize per channel -> squared diff
-> learned 1x1 linear heads -> spatial average -> sum over layers.
Calibration weights are the reference's bundled lpips/weights/v0.1/*.pth;
tower weights are torchvision-pretrained. Both load through
tools/convert_lpips.py into an .npz this module reads.

Towers are re-implemented functionally (weights as an explicit pytree, not
flax modules) so the whole loss jits into the projection step. Slice
boundaries match lpips/pretrained_networks.py:
  vgg16:   relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 (chns 64,128,256,512,512)
  alexnet: relu after each of the 5 convs (chns 64,192,384,256,256)
  squeeze: 7 slices (chns 64,128,256,384,384,512,512)
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# ScalingLayer constants (networks_basic.py:95-99), RGB order.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

LPIPS_CHANNELS = {
    "vgg": [64, 128, 256, 512, 512],
    "alex": [64, 192, 384, 256, 256],
    "squeeze": [64, 128, 256, 384, 384, 512, 512],
}


def _conv(x, w, b, stride=1, padding=0):
    """Correlation conv, NHWC x, HWIO w, torch-style symmetric int padding."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b[None, None, None, :]


def _maxpool(x, size=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1),
        "VALID")


def _relu(x):
    return jax.nn.relu(x)


def vgg16_features(params: Dict, x) -> List:
    """VGG16 tower (torchvision layout), returns the 5 LPIPS slices."""
    cfg = [(64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
           (512, 512, 512)]
    outs = []
    i = 0
    for block in cfg:
        for _ in block:
            x = _relu(_conv(x, params[f"w{i}"], params[f"b{i}"], padding=1))
            i += 1
        outs.append(x)
        if len(outs) < 5:
            x = _maxpool(x, 2, 2)
    return outs


def alexnet_features(params: Dict, x) -> List:
    """AlexNet tower (torchvision layout), 5 LPIPS slices."""
    outs = []
    x = _relu(_conv(x, params["w0"], params["b0"], stride=4, padding=2))
    outs.append(x)
    x = _maxpool(x)
    x = _relu(_conv(x, params["w1"], params["b1"], padding=2))
    outs.append(x)
    x = _maxpool(x)
    x = _relu(_conv(x, params["w2"], params["b2"], padding=1))
    outs.append(x)
    x = _relu(_conv(x, params["w3"], params["b3"], padding=1))
    outs.append(x)
    x = _relu(_conv(x, params["w4"], params["b4"], padding=1))
    outs.append(x)
    return outs


def _fire(params, prefix, x, idx):
    s = _relu(_conv(x, params[f"w{idx}_s"], params[f"b{idx}_s"]))
    e1 = _conv(s, params[f"w{idx}_e1"], params[f"b{idx}_e1"])
    e3 = _conv(s, params[f"w{idx}_e3"], params[f"b{idx}_e3"], padding=1)
    return jnp.concatenate([_relu(e1), _relu(e3)], axis=-1)


def squeezenet_features(params: Dict, x) -> List:
    """SqueezeNet 1.1 tower, 7 LPIPS slices (pretrained_networks.py:10-52)."""
    outs = []
    x = _relu(_conv(x, params["w0"], params["b0"], stride=2))          # [0,1]
    outs.append(x)
    x = _maxpool(x)
    x = _fire(params, "f", x, 1)
    x = _fire(params, "f", x, 2)                                        # [2..4]
    outs.append(x)
    x = _maxpool(x)
    x = _fire(params, "f", x, 3)
    x = _fire(params, "f", x, 4)                                        # [5..7]
    outs.append(x)
    x = _maxpool(x)
    x = _fire(params, "f", x, 5)                                        # [8,9]
    outs.append(x)
    x = _fire(params, "f", x, 6)                                        # [10]
    outs.append(x)
    x = _fire(params, "f", x, 7)                                        # [11]
    outs.append(x)
    x = _fire(params, "f", x, 8)                                        # [12]
    outs.append(x)
    return outs


_TOWERS = {"vgg": vgg16_features, "alex": alexnet_features,
           "squeeze": squeezenet_features}


def normalize_tensor(x, eps=1e-10):
    """Unit-normalize over channels (lpips/__init__.py normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params: Dict, img0, img1, net: str = "alex"):
    """LPIPS distance per batch element. Images NHWC in [-1, 1].

    params: {"tower": {...}, "lins": [w_per_layer ...]} from
    tools/convert_lpips.py. Linear head weights w: [C] (1x1 conv to 1ch,
    no bias, weights clamped non-negative as in the trained heads).
    """
    tower = _TOWERS[net]
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def prep(x):
        return (x - shift) / scale

    f0 = tower(params["tower"], prep(img0))
    f1 = tower(params["tower"], prep(img1))
    val = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        d = jnp.square(normalize_tensor(a) - normalize_tensor(b))
        w = params["lins"][k]  # [C]
        layer = jnp.sum(d * w[None, None, None, :], axis=-1)  # 1x1 conv to 1ch
        val = val + jnp.mean(layer, axis=(1, 2))              # spatial average
    return val


def make_lpips_loss(params: Dict, net: str = "alex"):
    """Loss-stack term: mean LPIPS distance between img and target."""
    def loss(img, target):
        return jnp.mean(lpips_distance(params, img, target, net=net))
    return loss


def random_lpips_params(net: str = "alex", seed: int = 0) -> Dict:
    """Random-weight LPIPS params (architecture testing without the
    pretrained files; reference supports pnet_rand the same way,
    networks_basic.py:30)."""
    rng = np.random.RandomState(seed)

    def conv_p(cin, cout, k):
        fan = cin * k * k
        return (rng.randn(k, k, cin, cout).astype(np.float32) / np.sqrt(fan),
                np.zeros(cout, np.float32))

    tower = {}
    if net == "vgg":
        cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
               (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
               (512, 512), (512, 512), (512, 512)]
        for i, (cin, cout) in enumerate(cfg):
            tower[f"w{i}"], tower[f"b{i}"] = conv_p(cin, cout, 3)
    elif net == "alex":
        specs = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
                 (256, 256, 3)]
        for i, (cin, cout, k) in enumerate(specs):
            tower[f"w{i}"], tower[f"b{i}"] = conv_p(cin, cout, k)
    elif net == "squeeze":
        tower["w0"], tower["b0"] = conv_p(3, 64, 3)
        fire_specs = [(64, 16, 64), (128, 16, 64), (128, 32, 128),
                      (256, 32, 128), (256, 48, 192), (384, 48, 192),
                      (384, 64, 256), (512, 64, 256)]
        for idx, (cin, sq, ex) in enumerate(fire_specs, start=1):
            tower[f"w{idx}_s"], tower[f"b{idx}_s"] = conv_p(cin, sq, 1)
            tower[f"w{idx}_e1"], tower[f"b{idx}_e1"] = conv_p(sq, ex, 1)
            tower[f"w{idx}_e3"], tower[f"b{idx}_e3"] = conv_p(sq, ex, 3)
    else:
        raise ValueError(net)

    lins = [np.abs(rng.randn(c)).astype(np.float32) * 0.1
            for c in LPIPS_CHANNELS[net]]
    return {"tower": jax.tree_util.tree_map(jnp.asarray, tower),
            "lins": [jnp.asarray(l) for l in lins]}


def load_lpips_params(path: str, net: str = "alex") -> Dict:
    """Load converted LPIPS params from the .npz written by
    tools/convert_lpips.py.

    Heads-only npz (from `convert_lpips.py <net> out.npz --tower none`, the
    only conversion possible in a zero-egress env — the reference bundles
    just the calibration heads, lpips/weights/v0.1/*.pth): the real heads
    are combined with a seeded random tower (real calibration × placeholder
    tower) and the result carries `"tower_source": "random"` so callers can
    surface the caveat."""
    data = np.load(path)
    tower = {}
    lins = []
    for key in data.files:
        if key.startswith("lin"):
            lins.append((int(key[3:]), jnp.asarray(data[key])))
        else:
            tower[key] = jnp.asarray(data[key])
    lins = [v for _, v in sorted(lins)]
    expected = len(LPIPS_CHANNELS[net])
    assert len(lins) == expected, (
        f"{path}: {len(lins)} lin heads, expected {expected} for '{net}'")
    if not tower:
        tower = random_lpips_params(net)["tower"]
        return {"tower": tower, "lins": lins, "tower_source": "random"}
    return {"tower": tower, "lins": lins}
