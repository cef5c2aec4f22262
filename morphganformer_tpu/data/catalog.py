"""Dataset and pretrained-model catalog.

Behavioral spec: prepare_data.py in the reference (dataset catalog with
URLs + md5 and download/convert driver, :27-60,93-185) and the gdrive
pretrained-snapshot catalog (loader.py:16-21). Zero-egress environments can
point --from-dir at already-downloaded archives.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import shutil
import zipfile
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    url: Optional[str]
    md5: Optional[str]
    resolution: int
    ratio: float = 1.0


# Reference catalog (prepare_data.py:27-60).
DATASETS = {
    "ffhq": DatasetSpec(
        "ffhq", "https://drive.google.com/uc?id=1TbKvkxSyphXG0Jy4A3JNPwGPeNEMEPAE",
        None, 1024, 1.0),
    "bedrooms": DatasetSpec(
        "bedrooms", "http://dl.yf.io/lsun/scenes/bedroom_train_lmdb.zip",
        None, 256, 188 / 256),
    "cityscapes": DatasetSpec(
        "cityscapes", "https://drive.google.com/uc?id=1t9Bphol1JXOpvelxxQJG71MPlCkrptL5",
        None, 256, 0.5),
    "clevr": DatasetSpec(
        "clevr", "https://dl.fbaipublicfiles.com/clevr/CLEVR_v1.0.zip",
        None, 256, 0.75),
}

# Pretrained GANformer snapshots (loader.py:16-21).
PRETRAINED = {
    "clevr": "https://drive.google.com/uc?id=1Ss7qNZsLCBZTzaBvCvYPOTfLLRUpBqSM",
    "cityscapes": "https://drive.google.com/uc?id=1tAYNqWS9D2cRTYwNPXwCVUYDDbkZYLvq",
    "ffhq": "https://drive.google.com/uc?id=1tgs-hHaziWrh0piC2UigcLlZdhjxr0r5",
    "bedrooms": "https://drive.google.com/uc?id=1sdvsbqEdSUDnXTDrLZdB8sN81PJ9RBBo",
}


def md5_file(path, chunk=1 << 20):
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def prepare(name: str, out_root: str, from_dir: Optional[str] = None,
            from_archive: Optional[str] = None, max_images=None):
    """Build the PNG-pyramid dataset for a catalog entry from a local
    archive/folder (download step is the user's in zero-egress setups)."""
    spec = DATASETS[name]
    out_dir = os.path.join(out_root, name)
    if from_archive:
        tmp = os.path.join(out_root, f"_{name}_extract")
        os.makedirs(tmp, exist_ok=True)
        with zipfile.ZipFile(from_archive) as z:
            z.extractall(tmp)
        from_dir = tmp
    assert from_dir, (
        f"dataset '{name}' needs --from-dir/--from-archive "
        f"(source: {spec.url})")
    from cli.dataset_tool import create_from_images
    create_from_images(out_dir, from_dir, spec.resolution)
    if from_archive:
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir
