"""Landmark-Delaunay warping of GAN morphs.

Behavioral spec: 1024_warp_morphs.py in the reference — generate the latent
morph, average the bona fide landmark sets, Delaunay-triangulate the average
landmarks (+12 border anchor points, :141-144), and warp each triangle of the
generated morph onto the averaged geometry (:157-210 via cv2 affine patches).

Re-implemented without OpenCV/dlib: scipy.spatial.Delaunay for the
triangulation and a vectorized inverse-mapping piecewise-affine warp with
bilinear sampling (numpy). Landmarks come from any 68-point provider (a
converted landmark network, or precomputed CSVs as produced by
AdaptiveWingLoss/facial_landmarks_2.py in the reference).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay


def border_anchor_points(size=1024):
    """The reference's 12 border anchors (1024_warp_morphs.py:141-144),
    scaled to `size`."""
    m = size - 1
    t1, t2 = size // 3, 2 * size // 3
    return np.asarray([
        [0, 0], [0, t1], [0, t2], [0, m],
        [t1, 0], [t2, 0], [m, 0], [m, t1],
        [m, t2], [m, m], [t1, m], [t2, m]], dtype=np.float64)


def _affine_from_triangles(dst_tri, src_tri):
    """2x3 affine A s.t. src = A @ [dst, 1] for each triangle.
    dst_tri/src_tri: [T, 3, 2] (x, y) points."""
    T = dst_tri.shape[0]
    ones = np.ones((T, 3, 1))
    d = np.concatenate([dst_tri, ones], axis=2)          # [T,3,3]
    affines = np.zeros((T, 2, 3))
    for t in range(T):
        # Solve d[t] @ A.T = src_tri[t] for A [2,3].
        sol, *_ = np.linalg.lstsq(d[t], src_tri[t], rcond=None)
        affines[t] = sol.T
    return affines


def piecewise_affine_warp(img, src_points, dst_points, fill=None):
    """Warp `img` so src_points land on dst_points, affine per Delaunay
    triangle of dst_points. img: [H, W, C] float; points: [N, 2] as (x, y).
    Pixels outside every triangle keep `fill` (default: the source image)."""
    img = np.asarray(img, dtype=np.float64)
    h, w, c = img.shape
    src_points = np.asarray(src_points, dtype=np.float64)
    dst_points = np.asarray(dst_points, dtype=np.float64)

    tri = Delaunay(dst_points)
    simplices = tri.simplices                              # [T, 3]
    affines = _affine_from_triangles(dst_points[simplices],
                                     src_points[simplices])

    # For every output pixel, which triangle contains it?
    ys, xs = np.mgrid[0:h, 0:w]
    pix = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    tri_idx = tri.find_simplex(pix)                        # [-1 outside]
    inside = tri_idx >= 0

    out = np.array(img if fill is None else
                   np.full_like(img, fill), dtype=np.float64)
    if not np.any(inside):
        return out

    p = pix[inside]
    a = affines[tri_idx[inside]]                           # [M, 2, 3]
    src_xy = np.einsum("mij,mj->mi", a[:, :, :2], p) + a[:, :, 2]
    sx = np.clip(src_xy[:, 0], 0, w - 1.001)
    sy = np.clip(src_xy[:, 1], 0, h - 1.001)

    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0)[:, None]
    fy = (sy - y0)[:, None]
    vals = (img[y0, x0] * (1 - fx) * (1 - fy)
            + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy
            + img[y0 + 1, x0 + 1] * fx * fy)

    flat = out.reshape(-1, c)
    flat[inside] = vals
    return flat.reshape(h, w, c)


def warp_morph_to_average_landmarks(morph_img, morph_landmarks, landmarks_a,
                                    landmarks_b):
    """The reference's post-hoc refinement (1024_warp_morphs.py:157-210):
    warp the GAN morph so its landmarks land on the average of the two bona
    fide landmark sets. All landmark arrays: [68, 2] (x, y)."""
    size = morph_img.shape[0]
    anchors = border_anchor_points(size)
    avg = (np.asarray(landmarks_a, np.float64)
           + np.asarray(landmarks_b, np.float64)) / 2.0
    src = np.concatenate([np.asarray(morph_landmarks, np.float64), anchors])
    dst = np.concatenate([avg, anchors])
    return piecewise_affine_warp(morph_img, src, dst)


def load_landmarks_csv(path):
    """Read a landmarks CSV row per point (x,y) — the format written by the
    reference's AdaptiveWingLoss/facial_landmarks_2.py batch extractor."""
    pts = np.loadtxt(path, delimiter=",", dtype=np.float64)
    assert pts.ndim == 2 and pts.shape[1] == 2
    return pts
