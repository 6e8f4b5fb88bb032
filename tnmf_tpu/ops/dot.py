"""Plain-matmul lowering for the degenerate single-transform problem.

Applies when ``prod(plan.transform_shape) == 1`` — i.e. reconstruction
mode ``'full'`` with ``atom_shape == sample_shape``: shift invariance
degenerates to classic Lee–Seung NMF, ``V[n,c,*S] ~ sum_m H[n,m] *
W[m,c,*S]``.  Every operator then collapses to a single MXU matmul over
the flattened ``(c, *S)`` feature axis — no convolution, no FFT, no
extension padding, no one-hot kernels.  The conv strategy handles this
case correctly but lowers it as a full-sample-sized convolution kernel;
the matmul formulation is the speed-of-light program for these shapes
(and is what sklearn's ``NMF(solver='mu')`` computes, at TPU speed —
cross-checked in ``tests/test_dot_strategy.py``).

Same functional contract as :mod:`tnmf_tpu.ops.conv` /
:mod:`tnmf_tpu.ops.fft`: ``prepare_data`` / ``reconstruct`` /
``grad_H_pair`` / ``grad_W_pair``; H keeps its canonical
``(n, m, *transform_shape)`` layout (the shift axes are all length 1),
so regularizers, masks, beta losses and the transform-group adapter
compose unchanged.  Reference role: the degenerate corner of every
backend (``_Backend.py:60-73`` gives ``full`` -> sample - atom + 1 = 1).

Like the conv strategy, matmuls accumulate in float32 under bfloat16
storage and honor ``plan.lax_precision``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .modes import ConvPlan


def _dot(a, b, preferred, precision):
    # sub-float32 storage (bfloat16) still accumulates in float32 on the MXU
    if jnp.dtype(preferred).itemsize < 4:
        preferred = jnp.float32
    return jnp.matmul(a, b, precision=precision,
                      preferred_element_type=preferred)


def prepare_data(V: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Identity: the single-offset correlation needs no extension."""
    del plan
    return V


def reconstruct(W: jnp.ndarray, H: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """R[n,c,*S] = sum_m H[n,m] * W[m,c,*S] — one (n,m)x(m,cF) matmul."""
    h = H.reshape(H.shape[:2])                      # (n, m)
    W2 = W.reshape(W.shape[0], -1)                  # (m, c*F)
    R = _dot(h, W2, W.dtype, plan.lax_precision)
    return R.reshape((H.shape[0],) + W.shape[1:]).astype(W.dtype)


def grad_H_pair(Vp: jnp.ndarray, R: jnp.ndarray, W: jnp.ndarray,
                plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(neg, pos) of dE/dH: X . W over (c, *S), V and R stacked along the
    batch axis into one matmul (same trick as the conv strategy)."""
    n = Vp.shape[0]
    X2 = jnp.concatenate([Vp, R], axis=0)
    G2 = _dot(X2.reshape(X2.shape[0], -1),
              W.reshape(W.shape[0], -1).T, W.dtype, plan.lax_precision)
    G2 = G2.astype(W.dtype).reshape(G2.shape + (1,) * plan.ndim)
    return G2[:n], G2[n:]


def grad_W_pair(Vp: jnp.ndarray, R: jnp.ndarray, H: jnp.ndarray,
                plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(neg, pos) of dE/dW: H^T . X over samples, V and R stacked along the
    channel axis into one matmul."""
    h = H.reshape(H.shape[:2])                      # (n, m)
    c = Vp.shape[1]
    X2 = jnp.concatenate([Vp, R], axis=1)           # (n, 2c, *S)
    G2 = _dot(h.T, X2.reshape(X2.shape[0], -1), H.dtype, plan.lax_precision)
    G2 = G2.astype(H.dtype).reshape((h.shape[1],) + X2.shape[1:])
    return G2[:, :c], G2[:, c:]
