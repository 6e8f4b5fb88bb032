"""Direct-convolution strategy for the conv-NMF operators.

Maps each of the three operators onto a single ``lax.conv_general_dilated``
call, which XLA lowers onto the TPU MXU (the systolic array).  This is the
TPU-native analogue of the reference's strided-view einsum backend
(``/root/reference/tnmf/backends/NumPy.py``) — the sliding-window ("im2col")
structure that the reference builds manually with
``np.lib.stride_tricks.as_strided`` is exactly what the hardware convolution
unit consumes natively.  Unlike the reference's coordinate-space backend,
which only supports the 'valid' mode (``NumPy.py:26-27``), all four
reconstruction modes are supported here via the same boundary-extension
scheme used by :mod:`tnmf_tpu.ops.fft`.

Preferred for small atoms, where the FFT padding overhead dominates; the
engine selects between 'fft' and 'conv' by a FLOPs heuristic.

Dimension-number cheat sheet (k spatial dims):

* reconstruct: contract atoms      → lhs H (N,M,*) batch=N feat=M;
  kernel flip(W)^T (C,M,*A); out (N,C,*S).
* grad_H:      contract channels   → lhs Xext (N,C,*) batch=N feat=C;
  kernel W (M,C,*A); out (N,M,*T).
* grad_W:      contract samples+shifts → lhs Xext (N,C,*) batch=C feat=N;
  kernel H (N,M,*T) I=N O=M; out (C,M,*A) → transposed to (M,C,*A).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from .modes import ConvPlan

_SPATIAL = 'DHW'  # up to 3 explicit spatial letters; rank > 3 uses generic dims


def _dim_letters(ndim: int) -> str:
    if ndim <= 3:
        return _SPATIAL[3 - ndim:]
    raise NotImplementedError(
        'direct-conv strategy supports up to 3 shift dimensions; '
        'use the fft strategy for higher ranks')


def _pad_spatial(x: jnp.ndarray, left, right, mode: str) -> jnp.ndarray:
    pad = [(0, 0)] * 2 + [(l, r) for l, r in zip(left, right)]
    if mode == 'zero':
        return jnp.pad(x, pad)
    return jnp.pad(x, pad, mode=mode)


def extend_data(X: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Same boundary extension as :func:`tnmf_tpu.ops.fft.extend_data`,
    but materialized for every mode (incl. zeros) so the convolutions below
    all run with padding=0."""
    am1 = tuple(a - 1 for a in plan.atom_shape)
    zero = (0,) * plan.ndim
    if plan.mode == 'valid':
        return _pad_spatial(X, am1, am1, 'zero')
    if plan.mode == 'full':
        return X
    if plan.mode == 'circular':
        return _pad_spatial(X, zero, am1, 'wrap')
    if plan.mode == 'reflect':
        return _pad_spatial(X, zero, am1, 'reflect')
    raise ValueError(plan.mode)


def _extend_H(H: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Left-extend H to length S+A-1 per axis (see oracle docstring)."""
    am1 = tuple(a - 1 for a in plan.atom_shape)
    zero = (0,) * plan.ndim
    if plan.mode == 'valid':
        return H
    if plan.mode == 'full':
        return _pad_spatial(H, am1, am1, 'zero')
    if plan.mode == 'circular':
        return _pad_spatial(H, am1, zero, 'wrap')
    if plan.mode == 'reflect':
        return _pad_spatial(H, am1, zero, 'reflect')
    raise ValueError(plan.mode)


def prepare_data(V: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """The extended data tensor; loop-invariant per fit."""
    return extend_data(V, plan)


def _conv(lhs, rhs, dn, preferred, precision=None):
    # sub-float32 storage (bfloat16) still accumulates in float32 on the MXU
    if jnp.dtype(preferred).itemsize < 4:
        preferred = jnp.float32
    return lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,) * (lhs.ndim - 2),
        padding=[(0, 0)] * (lhs.ndim - 2),
        dimension_numbers=dn,
        preferred_element_type=preferred,
        precision=precision,
    )


def reconstruct(W: jnp.ndarray, H: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    sp = _dim_letters(plan.ndim)
    dn = ('NC' + sp, 'OI' + sp, 'NC' + sp)
    Hp = _extend_H(H, plan)
    # R[n,c,x] = sum_{m,a} Hp[n,m,x+a] * W[m,c,A-1-a]
    Wk = jnp.flip(jnp.swapaxes(W, 0, 1), axis=tuple(range(2, 2 + plan.ndim)))
    # accumulate in f32 under low-precision storage, store R in storage dtype
    return _conv(Hp, Wk, dn, W.dtype, plan.lax_precision).astype(W.dtype)


def grad_H_pair(Vp: jnp.ndarray, R: jnp.ndarray, W: jnp.ndarray, plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    sp = _dim_letters(plan.ndim)
    dn = ('NC' + sp, 'OI' + sp, 'NC' + sp)
    Rp = extend_data(R, plan)
    # G[n,m,t] = sum_{c,a} Xp[n,c,t+a] * W[m,c,a]   (correlation: no flip).
    # The neg (X=V) and pos (X=R) parts run as ONE convolution with V and R
    # stacked along the batch axis: one bigger MXU kernel instead of two
    # half-occupancy ones (measured 20-35% faster per MU iteration on v5e).
    X2 = jnp.concatenate([Vp, Rp], axis=0)
    G2 = _conv(X2, W, dn, W.dtype, plan.lax_precision)
    n = Vp.shape[0]
    return G2[:n], G2[n:]


def grad_W_pair(Vp: jnp.ndarray, R: jnp.ndarray, H: jnp.ndarray, plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    sp = _dim_letters(plan.ndim)
    # batch role <- channel axis, feature role <- sample axis (contracted)
    dn = ('CN' + sp, 'IO' + sp, 'NC' + sp)
    Rp = extend_data(R, plan)
    # G[c,m,a] = sum_{n,t} Xp[n,c,a+t] * H[n,m,t]; neg/pos stacked along the
    # channel axis (the conv's batch role) — see grad_H_pair.
    X2 = jnp.concatenate([Vp, Rp], axis=1)
    G2 = jnp.swapaxes(_conv(X2, H, dn, H.dtype, plan.lax_precision), 0, 1)
    c = Vp.shape[1]
    return G2[:, :c], G2[:, c:]
