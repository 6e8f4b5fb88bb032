"""Test-image loading with an offline fallback.

The reference uses scipy's raccoon photo (``scipy.misc.face``) as its 2-D
fixture (``/root/reference/tnmf/utils/data_loading.py``).  That dataset was
removed from scipy and now requires a network download via
``scipy.datasets``, so this module first tries the real image and otherwise
synthesizes a deterministic natural-image stand-in with comparable statistics
(smooth multi-scale structure, values in [0, 1], shape (768, 1024[, 3])).
Tests use the synthetic image directly for full determinism.
"""

from __future__ import annotations

import numpy as np

_FACE_SHAPE = (768, 1024)


def synthetic_face(gray: bool = True) -> np.ndarray:
    """Deterministic smooth multi-scale test image in [0, 1].

    Built from a fixed-seed random Fourier series (a 1/f-like spectrum), so
    it has the long-range correlations of a natural photo without any data
    dependency.  Independent of the global NumPy RNG state.
    """
    rng = np.random.default_rng(20260816)
    h, w = _FACE_SHAPE
    y = np.linspace(0, 2 * np.pi, h, endpoint=False)[:, None]
    x = np.linspace(0, 2 * np.pi, w, endpoint=False)[None, :]
    channels = []
    for _ in range(3):
        img = np.zeros((h, w))
        for ky in range(-4, 5):
            for kx in range(-4, 5):
                if kx == 0 and ky == 0:
                    continue
                amp = 1.0 / (kx * kx + ky * ky)
                phase = rng.uniform(0, 2 * np.pi)
                img += amp * np.cos(ky * y + kx * x + phase)
        img -= img.min()
        img /= img.max()
        channels.append(img)
    rgb = np.stack(channels, axis=-1)
    if gray:
        return rgb @ np.array([0.299, 0.587, 0.114])
    return rgb


def racoon_image(gray: bool = True, scale: float = 1.) -> np.ndarray:
    """The raccoon test photo (if available offline) or its synthetic
    stand-in, rescaled by ``scale`` and normalized to [0, 1].

    Keeps the reference's name/signature (including its spelling).
    """
    img = None
    try:
        from scipy.datasets import face
        img = np.asarray(face(gray), dtype=float) / 255
    except Exception:
        img = synthetic_face(gray)
    if scale != 1.:
        try:
            from PIL import Image
            pil = Image.fromarray(np.uint8(np.clip(img, 0, 1) * 255))
            pil = pil.resize([int(scale * s) for s in pil.size])
            img = np.asarray(pil, dtype=float) / 255
        except Exception:
            step = max(1, int(round(1 / scale)))
            img = img[::step, ::step]
    return img
