#!/usr/bin/env python
"""Face-embedding extraction + morph-detection ("fingerprinting") eval.

Behavioral spec: extract_FaceNet.py + Facenet_torch/ in the reference —
extract identity embeddings for a folder of images, then train/evaluate an
SVM separating bona fide from morph embeddings
(Facenet_torch/extract_feature_fingerprinting.py:14-18).

The embedding network is the converted ArcFace iresnet
(tools/convert_iresnet.py); --random-backbone runs the pipeline with random
weights (plumbing smoke tests).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def extract_dir(params, path, size=112, batch=16):
    import jax
    import jax.numpy as jnp

    from morphganformer_tpu.losses.face_embedding import iresnet_embed
    from morphganformer_tpu.utils.image import load_target

    files = sorted(glob.glob(os.path.join(path, "*.png"))
                   + glob.glob(os.path.join(path, "*.jpg")))
    assert files, f"no images in {path}"
    embed = jax.jit(lambda x: iresnet_embed(params, x))
    feats = []
    for i in range(0, len(files), batch):
        imgs = np.concatenate([load_target(f, size=size)
                               for f in files[i:i + batch]])
        feats.append(np.asarray(embed(jnp.asarray(imgs))))
    return files, np.concatenate(feats)


def svm_fingerprinting(bona_feats, morph_feats, test_frac=0.3, seed=0):
    """Linear-SVM morph detection (reference Facenet_torch pipeline)."""
    from sklearn.model_selection import train_test_split
    from sklearn.svm import LinearSVC

    x = np.concatenate([bona_feats, morph_feats])
    y = np.concatenate([np.zeros(len(bona_feats)), np.ones(len(morph_feats))])
    xtr, xte, ytr, yte = train_test_split(x, y, test_size=test_frac,
                                          random_state=seed, stratify=y)
    clf = LinearSVC(max_iter=5000)
    clf.fit(xtr, ytr)
    return {"train_acc": float(clf.score(xtr, ytr)),
            "test_acc": float(clf.score(xte, yte)),
            "num_bona": len(bona_feats), "num_morph": len(morph_feats)}


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Face feature extraction + "
                                            "morph fingerprinting")
    p.add_argument("--backbone", help="Converted iresnet .npz")
    p.add_argument("--backbone-name", default="iresnet18")
    p.add_argument("--random-backbone", action="store_true")
    p.add_argument("--images", help="Folder to extract embeddings for")
    p.add_argument("--out", default="features.npz")
    p.add_argument("--bona", help="Bona fide folder (fingerprinting mode)")
    p.add_argument("--morph", help="Morph folder (fingerprinting mode)")
    args = p.parse_args()

    if args.random_backbone:
        from morphganformer_tpu.losses.face_embedding import random_iresnet_params
        params = random_iresnet_params(args.backbone_name)
    else:
        assert args.backbone, "need --backbone or --random-backbone"
        from tools.convert_iresnet import load_iresnet_npz
        params = load_iresnet_npz(args.backbone, args.backbone_name)

    if args.bona and args.morph:
        _, bona = extract_dir(params, args.bona)
        _, morph = extract_dir(params, args.morph)
        import json
        print(json.dumps(svm_fingerprinting(bona, morph)))
    else:
        assert args.images, "need --images or --bona/--morph"
        files, feats = extract_dir(params, args.images)
        np.savez(args.out, files=np.asarray(files), features=feats)
        print(f"{len(files)} embeddings ({feats.shape[1]}-d) -> {args.out}")


if __name__ == "__main__":
    main()
