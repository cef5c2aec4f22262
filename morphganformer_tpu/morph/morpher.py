"""Face morphing and de-morphing by latent arithmetic.

Behavioral spec:
  * Morph: W = 0.5*w1 + 0.5*w2, regenerate
    (projection_example_v2_percept_morph.py:356-365, 1024_merge_morph_22.py:83-86).
  * Latents persist as MATLAB .mat dicts {'w': array}
    (projection_example_v1_percept_morph.py:252-255), read back by the merge
    scripts (1024_merge_morph_22.py:70-76).
  * De-morph: the reference README describes the reference-image defense via
    the same generator (README.md:101-107) but ships only data prep
    (process/select_bona_B.py); the latent arithmetic itself is the inversion
    of the morph equation: given the morph latent W and one projected
    accomplice latent w_acc, the other identity is
        w_rec = (W - alpha*w_acc) / (1 - alpha)
    (alpha = morph weight, 0.5 by default).
"""

from __future__ import annotations

import numpy as np
import scipy.io as sio


def morph_latents(w1, w2, alpha=0.5):
    """W = alpha*w1 + (1-alpha)*w2. The reference always uses 0.5
    (projection_example_v2_percept_morph.py:362)."""
    return alpha * np.asarray(w1) + (1.0 - alpha) * np.asarray(w2)


def demorph_latent(w_morph, w_accomplice, alpha=0.5):
    """Invert the morph given one known (accomplice) latent: recover the
    latent of the second identity."""
    return (np.asarray(w_morph) - alpha * np.asarray(w_accomplice)) / (1.0 - alpha)


def save_latent_mat(path, w, key="w"):
    """Persist a latent as {'w': array} .mat
    (projection_example_v1_percept_morph.py:252-255)."""
    sio.savemat(str(path), {key: np.asarray(w)})


def load_latent_mat(path, key="w"):
    """Read a latent back (1024_merge_morph_22.py:70-76)."""
    data = sio.loadmat(str(path))
    return np.asarray(data[key])
