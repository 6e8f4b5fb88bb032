"""Pure-NumPy oracle implementation of the conv-NMF operators.

This module is the executable specification of the factorization math.  It is
deliberately written as simple shifted-view sums (a Python loop over the atom
offsets) with no FFT, no striding tricks and no convolution library calls, so
that its correctness is evident by inspection.  The fast JAX strategies in
:mod:`tnmf_tpu.ops.fft` and :mod:`tnmf_tpu.ops.conv` are regression-tested
against it for every reconstruction mode and rank.

Semantics (derived from the reference implementation, see
``/root/reference/tnmf/backends/NumPy_FFT.py:16-93`` and
``/root/reference/tnmf/backends/_NumPyFFTBackend.py:49-88``):

Let ``S`` = sample shape, ``A`` = atom shape, ``T`` = transform shape.

*Reconstruction*::

    R[n, c, x] = sum_{m, a} W[m, c, a] * Hp[n, m, x + (A-1) - a]

where ``Hp`` is ``H`` extended on the *left* of every shift axis to length
``S + A - 1`` according to the mode: 'valid' needs no extension
(``T = S + A - 1`` already), 'full' zero-pads, 'circular' wraps and 'reflect'
reflects evenly.

*Gradients* (the ``(neg, pos)`` contract: each is evaluated with ``X = V``
for the negative part and ``X = R`` for the positive part)::

    grad_H[n, m, t] = sum_{c, a} Xp[n, c, t + a] * W[m, c, a]
    grad_W[m, c, a] = sum_{n, t} H[n, m, t]      * Xp[n, c, t + a]

where ``Xp`` is ``X`` extended on the *right* by ``A - 1`` per axis ('full':
no extension needed, 'circular': wrap, 'reflect': even reflection) — except
in 'valid' mode, where ``Xp`` is zero-padded by ``A - 1`` on *both* sides
(activation shifts hang off both sample edges).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .modes import transform_shape


def _spatial_pad(x: np.ndarray, ndim: int, left: Tuple[int, ...], right: Tuple[int, ...], mode: str) -> np.ndarray:
    """Pad the trailing ``ndim`` axes of ``x``."""
    pad = [(0, 0)] * (x.ndim - ndim) + [(l, r) for l, r in zip(left, right)]
    if mode == 'zero':
        return np.pad(x, pad, mode='constant', constant_values=0.0)
    if mode == 'wrap':
        return np.pad(x, pad, mode='wrap')
    if mode == 'reflect':
        return np.pad(x, pad, mode='reflect')
    raise ValueError(mode)


def _extend_H_left(H: np.ndarray, mode: str, atom_shape: Tuple[int, ...]) -> np.ndarray:
    left = tuple(a - 1 for a in atom_shape)
    zero = (0,) * len(atom_shape)
    if mode == 'valid':
        return H
    if mode == 'full':
        # T = S - A + 1: zero-extend to cover shifts hanging over both edges
        return _spatial_pad(H, len(atom_shape), left, left, 'zero')
    if mode == 'circular':
        return _spatial_pad(H, len(atom_shape), left, zero, 'wrap')
    if mode == 'reflect':
        return _spatial_pad(H, len(atom_shape), left, zero, 'reflect')
    raise ValueError(mode)


def _extend_X_right(X: np.ndarray, mode: str, atom_shape: Tuple[int, ...]) -> np.ndarray:
    right = tuple(a - 1 for a in atom_shape)
    zero = (0,) * len(atom_shape)
    if mode == 'valid':
        return _spatial_pad(X, len(atom_shape), right, right, 'zero')
    if mode == 'full':
        return X
    if mode == 'circular':
        return _spatial_pad(X, len(atom_shape), zero, right, 'wrap')
    if mode == 'reflect':
        return _spatial_pad(X, len(atom_shape), zero, right, 'reflect')
    raise ValueError(mode)


def _shifted_view(x: np.ndarray, offset: Tuple[int, ...], extent: Tuple[int, ...]) -> np.ndarray:
    """``x[..., o0:o0+e0, o1:o1+e1, ...]`` over the trailing axes."""
    idx = (Ellipsis,) + tuple(slice(o, o + e) for o, e in zip(offset, extent))
    return x[idx]


def reconstruct(W: np.ndarray, H: np.ndarray, mode: str) -> np.ndarray:
    """R[n, c, x] = sum_{m,a} W[m,c,a] * Hp[n,m,x+(A-1)-a]."""
    atom_shape = W.shape[2:]
    ndim = len(atom_shape)
    Hp = _extend_H_left(np.asarray(H), mode, atom_shape)
    sample = tuple(hp - a + 1 for hp, a in zip(Hp.shape[2:], atom_shape))
    R = np.zeros((H.shape[0], W.shape[1]) + sample, dtype=np.result_type(W, H))
    for a in np.ndindex(*atom_shape):
        rev = tuple(A - 1 - ai for A, ai in zip(atom_shape, a))
        # R[n,c,x] += Hp[n,m,x+a'] * W[m,c,A-1-a']  summed over a'
        R += np.einsum('nm...,mc->nc...', _shifted_view(Hp, a, sample), W[(slice(None), slice(None)) + rev])
    return R


def corr_H(X: np.ndarray, W: np.ndarray, mode: str) -> np.ndarray:
    """``corr(X~, W)`` contracted over channels — the H-gradient correlation
    applied to an arbitrary data-space tensor ``X`` (``X = V`` gives the
    Euclidean neg part, ``X = R`` the pos part; the beta-divergence rules
    feed ``V * R**(beta-2)`` / ``R**(beta-1)``, see :mod:`tnmf_tpu.ops.beta`)."""
    atom_shape = W.shape[2:]
    tshape = transform_shape(mode, X.shape[2:], atom_shape)
    Xp = _extend_X_right(np.asarray(X), mode, atom_shape)
    G = np.zeros((X.shape[0], W.shape[0]) + tshape, dtype=np.result_type(W, X))
    for a in np.ndindex(*atom_shape):
        G += np.einsum('nc...,mc->nm...', _shifted_view(Xp, a, tshape), W[(slice(None), slice(None)) + a])
    return G


def corr_W(X: np.ndarray, H: np.ndarray, mode: str, atom_shape: Tuple[int, ...]) -> np.ndarray:
    """``corr(X~, H)`` contracted over samples and shifts — the W-gradient
    correlation applied to an arbitrary data-space tensor ``X``."""
    tshape = H.shape[2:]
    Xp = _extend_X_right(np.asarray(X), mode, atom_shape)
    G = np.zeros((H.shape[1], X.shape[1]) + tuple(atom_shape), dtype=np.result_type(H, X))
    Hflat = np.ascontiguousarray(H).reshape(H.shape[0], H.shape[1], -1)
    for a in np.ndindex(*atom_shape):
        Xflat = np.ascontiguousarray(_shifted_view(Xp, a, tshape)).reshape(X.shape[0], X.shape[1], -1)
        G[(slice(None), slice(None)) + a] = np.einsum('nmt,nct->mc', Hflat, Xflat)
    return G


def reconstruction_gradient_H(V: np.ndarray, W: np.ndarray, H: np.ndarray, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    """(neg, pos) = (corr(V~, W), corr(R~, W)) contracted over channels."""
    R = reconstruct(W, H, mode)
    return corr_H(V, W, mode), corr_H(R.astype(np.result_type(W, H)), W, mode)


def reconstruction_gradient_W(V: np.ndarray, W: np.ndarray, H: np.ndarray, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    """(neg, pos) = (corr(V~, H), corr(R~, H)) contracted over samples and shifts."""
    R = reconstruct(W, H, mode)
    return corr_W(V, H, mode, W.shape[2:]), corr_W(R, H, mode, W.shape[2:])


def reconstruction_energy(V: np.ndarray, W: np.ndarray, H: np.ndarray, mode: str) -> float:
    R = reconstruct(W, H, mode)
    return float(0.5 * np.sum(np.square(V - R)))
