"""Image range/format utilities (behavioral spec: reference misc.py:94-150).

Generator output is NHWC float in [-1, 1]; these helpers convert to PIL /
uint8 and build image grids for visualization, matching the reference's
output formats (drange handling of misc.py:102-130).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def adjust_range(x, from_range=(-1.0, 1.0), to_range=(0.0, 255.0)):
    """Linear range remap (reference misc.py:102-112)."""
    x = np.asarray(x, dtype=np.float32)
    lo_f, hi_f = from_range
    lo_t, hi_t = to_range
    scale = (hi_t - lo_t) / (hi_f - lo_f)
    return x * scale + (lo_t - lo_f * scale)


def to_pil(img_hwc, drange=(-1.0, 1.0)):
    """NHWC/HWC float image -> PIL (reference misc.py:114-124, CHW there)."""
    img = np.asarray(img_hwc)
    if img.ndim == 4:
        img = img[0]
    assert img.ndim == 3
    img = adjust_range(img, drange, (0, 255))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    if img.shape[-1] == 1:
        return Image.fromarray(img[:, :, 0], "L")
    return Image.fromarray(img, "RGB")


def from_pil(pil_img, size=None, drange=(-1.0, 1.0)):
    """PIL -> HWC float in drange (inverse of to_pil, for projection targets)."""
    if size is not None:
        pil_img = pil_img.resize((size, size), Image.LANCZOS)
    img = np.asarray(pil_img.convert("RGB"), dtype=np.float32)
    return adjust_range(img, (0, 255), drange)


def load_target(path, size=1024, drange=(-1.0, 1.0)):
    """Load a projection target: resize shortest side to `size`, center crop,
    normalize to drange — the reference's torchvision transform
    (1024_example_MSE.py:88-108: Resize + CenterCrop + Normalize(0.5, 0.5)).
    Returns [1, size, size, 3] float32 NHWC."""
    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, round(w * scale)), max(size, round(h * scale))),
                     Image.LANCZOS)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = adjust_range(np.asarray(img, dtype=np.float32), (0, 255), drange)
    return arr[None]


def crop_max_rectangle(pil_img, ratio=1.0):
    """Crop the largest centered rectangle with the given width/height ratio
    (reference misc.py:88-99)."""
    if ratio is None or ratio == 1.0:
        return pil_img
    w, h = pil_img.size
    s = min(w, h * ratio)
    cw, ch = int(s), int(s / ratio)
    left, top = (w - cw) // 2, (h - ch) // 2
    return pil_img.crop((left, top, left + cw, top + ch))


def create_img_grid(imgs_nhwc, rows=None, cols=None, drange=(-1.0, 1.0)):
    """Tile a batch of NHWC images into one PIL grid (reference misc.py:134-150)."""
    imgs = np.asarray(imgs_nhwc)
    n, h, w, c = imgs.shape
    if cols is None:
        cols = int(np.ceil(np.sqrt(n)))
    if rows is None:
        rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), dtype=np.float32)
    grid[:] = drange[0]
    for i in range(n):
        r, cc = divmod(i, cols)
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = imgs[i]
    return to_pil(grid, drange)
