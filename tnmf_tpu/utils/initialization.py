"""Data-dependent dictionary initializations (``w_init=`` on the model).

The reference initializes W uniformly at random (``_Backend.py:83-98``);
these host-side schemes give better, deterministic starting points:

* ``'patches'`` — each atom is an atom-shaped window cut from the data at
  a random (sample, position), the standard dictionary-learning warm
  start: atoms begin as actual data content instead of noise, which
  typically cuts the iterations-to-tolerance substantially.  Works for
  every geometry, mode and rank.
* ``'nndsvd'`` — Nonnegative Double Singular Value Decomposition
  (Boutsidis & Gallopoulos 2008), the sklearn ``NMF(init='nndsvda')``
  scheme: deterministic W *and* H from the data's leading singular
  vectors, with zeros filled by the data mean (the 'a' variant — plain
  NNDSVD zeros are absorbing under multiplicative updates and could
  never recover).  Only meaningful for the degenerate plain-NMF geometry
  (``prod(transform_shape) == 1``), where the factorization is a plain
  matrix product; cross-checked against sklearn's implementation in
  ``tests/test_w_init.py``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _randint(rng, n: int) -> int:
    """Uniform integer in [0, n) from either RNG API (the global
    ``np.random`` module or a ``Generator``)."""
    return int(rng.random() * n) if n > 1 else 0


def patches_init(V: np.ndarray, n_atoms: int, atom_shape: Tuple[int, ...],
                 rng) -> np.ndarray:
    """Atom-shaped windows cut from random (sample, position) locations.

    A small positive floor (1% of the mean patch level) is added so no
    entry starts at exactly zero — zero is absorbing under MU.
    """
    sample_shape = V.shape[2:]
    if any(a > s for a, s in zip(atom_shape, sample_shape)):
        raise ValueError(
            f"w_init='patches' needs atom_shape {tuple(atom_shape)} to fit "
            f'inside the samples {tuple(sample_shape)}')
    W = np.empty((n_atoms, V.shape[1]) + tuple(atom_shape),
                 dtype=np.asarray(V).dtype)
    for m in range(n_atoms):
        i = _randint(rng, V.shape[0])
        sl = tuple(slice(st, st + a) for st, a in
                   ((_randint(rng, s - a + 1), a)
                    for s, a in zip(sample_shape, atom_shape)))
        W[m] = V[(i, slice(None)) + sl]
    floor = max(float(W.mean()), np.finfo(W.dtype).tiny) * 0.01
    return W + floor


def nndsvda_init(X: np.ndarray, k: int,
                 eps: float = 1e-6) -> Tuple[np.ndarray, np.ndarray]:
    """NNDSVD with zero-filling by the data mean (the 'a' variant).

    ``X: (n, f)`` nonnegative; returns ``(A, B)`` with ``A: (n, k)``,
    ``B: (k, f)`` and ``X ~ A @ B`` — sklearn's
    ``_initialize_nmf(X, k, init='nndsvda')`` recipe, except the SVD is
    exact (``np.linalg.svd``) where sklearn uses a randomized sketch, so
    the two agree on the well-determined leading triplet and produce
    equal-quality (not bitwise-equal) trailing components.  Entries below
    ``eps`` truncate to the data mean, like sklearn's.
    """
    n, f = X.shape
    if k > min(n, f):
        raise ValueError(
            f"w_init='nndsvd' needs n_atoms <= min(n_samples, n_features) "
            f'= {min(n, f)}, got {k}')
    U, S, Vt = np.linalg.svd(X, full_matrices=False)
    A = np.zeros((n, k), dtype=X.dtype)
    B = np.zeros((k, f), dtype=X.dtype)
    A[:, 0] = np.sqrt(S[0]) * np.abs(U[:, 0])
    B[0] = np.sqrt(S[0]) * np.abs(Vt[0])
    for j in range(1, k):
        x, y = U[:, j], Vt[j]
        xp, xn = np.maximum(x, 0), np.maximum(-x, 0)
        yp, yn = np.maximum(y, 0), np.maximum(-y, 0)
        np_norm, yp_norm = np.linalg.norm(xp), np.linalg.norm(yp)
        nn_norm, yn_norm = np.linalg.norm(xn), np.linalg.norm(yn)
        mp, mn = np_norm * yp_norm, nn_norm * yn_norm
        if mp > mn:
            u, v, sigma = xp / (np_norm or 1), yp / (yp_norm or 1), mp
        else:
            u, v, sigma = xn / (nn_norm or 1), yn / (yn_norm or 1), mn
        lbd = np.sqrt(S[j] * sigma)
        A[:, j] = lbd * u
        B[j] = lbd * v
    avg = X.mean()
    A[A < eps] = avg
    B[B < eps] = avg
    return A, B
