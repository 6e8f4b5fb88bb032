"""FFT strategy for the conv-NMF operators (jnp.fft on XLA).

Replaces the reference's scipy-FFT convolution backends
(``/root/reference/tnmf/backends/NumPy_FFT.py``,
``NumPy_CachingFFT.py``) with a single functional, jit-compatible
implementation.  Two structural improvements over the reference:

1. **No flips.** The reference realizes correlations by flipping one operand
   and convolving (``NumPy_FFT.py:29``).  Here correlations use the
   cross-correlation theorem directly: ``corr = irfft(F(X) * conj(F(K)))``.
   With the mode-specific boundary extension applied to ``X`` *before* the
   transform, every gradient becomes a plain ``[0:size]`` crop — no
   ``np.flip``, no per-plan crop offsets
   (cf. the ``lower_idx`` arithmetic in ``_NumPyFFTBackend.py:49-88``).

2. **Native circular mode.** Cyclic convolution of period ``S`` *is* the
   'circular' reconstruction mode, so those FFTs run at exactly the sample
   length with no padding and no cropping at all.

The transform of the (extended) data tensor ``V`` is loop-invariant; the
engine computes it once per fit via :func:`prepare_data` and passes it to the
gradient kernels — this is the dataflow equivalent of the reference's
``CachingFFT`` machinery (``NumPy_CachingFFT.py:22-140``) without any cache
invalidation state.  Repeated subexpressions inside one jitted update step
(e.g. ``F(W)`` shared between reconstruction and grad_H) are deduplicated by
XLA common-subexpression elimination.

All functions are shape-polymorphic in the leading sample axis so that
minibatch slices re-use the same code.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .modes import ConvPlan


# ---------------------------------------------------------------------------
# matmul-DFT transforms (TPU)
#
# XLA's TPU FFT lowering is extremely slow (measured 98 ms for ONE fft-path
# reconstruction at the 64x256x256 scale — dozens of times the conv path).
# On TPU, transforms therefore run as DFT matrix contractions instead:
# more FLOPs than an FFT, but executed on the MXU at ~2 orders of magnitude
# higher throughput.  Measured on v5e: a full fft-strategy MU iteration at
# 64x256x256 drops to 135 ms (the XLA-FFT route spent 98 ms on reconstruct
# alone).  Axes up to 4096 use a single dense contraction; longer axes a
# two-stage Cooley-Tukey split (see _full_dft_axis), so there is no length
# cliff; only axes with no factorization into two <=4096 factors (e.g. a
# prime circular period > 4096) fall back to jnp.fft.  CPU keeps jnp.fft
# (exact, f64-capable — the oracle-parity and golden tests run there).
#
# Precision: DFT matmuls default to bf16x3 passes (Precision.HIGH,
# ~8e-5 roundtrip error — measured) rather than the engine-wide bf16
# default (2.7e-2 roundtrip, too lossy for spectral transforms); an
# explicit plan precision overrides ('highest' -> 3e-6, 'default' ->
# single-pass bf16 speed).
# ---------------------------------------------------------------------------

_DFT_MAX_LEN = 4096   # largest single-stage D matrix: 4096 x 2049 c64 = 67 MB
# beyond _DFT_MAX_LEN a two-stage Cooley-Tukey split (two MXU contractions
# plus a twiddle multiply) keeps arbitrary fast lengths on the MXU; the cap
# below only bounds the split search (L1*L2 with both factors <= 4096)
_DFT_MAX_TOTAL = _DFT_MAX_LEN * _DFT_MAX_LEN


def _use_matmul_dft(plan: ConvPlan) -> bool:
    try:
        return (jax.devices()[0].platform == 'tpu'
                and max(plan.fft_shape) <= _DFT_MAX_TOTAL
                and all(_split_len(L) is not None for L in plan.fft_shape))
    except Exception:  # pragma: no cover - uninitialized backend
        return False


def _split_len(L: int):
    """Factor ``L = L1 * L2`` with both factors <= ``_DFT_MAX_LEN``, as
    close to ``sqrt(L)`` as possible.  Returns None when no such split
    exists (never for the 5-smooth / pow2 lengths of
    :func:`tnmf_tpu.ops.modes.fast_fft_len`).  ``L <= _DFT_MAX_LEN`` needs
    no split and returns ``(L, 1)``."""
    if L <= _DFT_MAX_LEN:
        return (L, 1)
    for d in range(int(math.isqrt(L)), 1, -1):
        if L % d == 0 and L // d <= _DFT_MAX_LEN:
            return (L // d, d)
    return None


def _dft_precision(plan: ConvPlan):
    # The spectral roundtrip amplifies multiply error, so the DFT matmuls are
    # floored at Precision.HIGH (bf16x3 passes ~ full f32 products, ~8e-5
    # roundtrip) even under an engine-wide 'default' precision — a single
    # bf16 pass here would cost ~2.7e-2 roundtrip error, a far larger cliff
    # than 'default' causes anywhere else.  'highest' still upgrades (3e-6).
    if plan.precision == 'highest':
        return lax.Precision.HIGHEST
    return lax.Precision.HIGH


def _angles(n_out: int, n_in: int, period: int, rdtype) -> jnp.ndarray:
    """(n_out, n_in) angles 2*pi*k*n/period, reduced mod period in exact
    integer arithmetic first (f32 cos/sin of ~1e8 radians would be pure
    noise)."""
    k = jnp.arange(n_out, dtype=jnp.int32)[:, None]
    n = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    red = (k * n) % period
    return red.astype(rdtype) * jnp.asarray(2.0 * jnp.pi / period, rdtype)


def _contract_axis(x, M, axis, precision):
    """Contract ``M[k, u]`` against axis ``axis`` of ``x``, output index k
    in place of u."""
    ins = list('abcdefgh'[:x.ndim])
    ins[axis] = 'u'
    outs = list(ins)
    outs[axis] = 'k'
    return jnp.einsum(f"{''.join(ins)},ku->{''.join(outs)}", x, M,
                      precision=precision)


def _dft_mat(n_out: int, n_in: int, period: int, sign: float, rdtype) -> jnp.ndarray:
    """(n_out, n_in) DFT matrix e^{sign * 2 pi i k n / period}."""
    ang = _angles(n_out, n_in, period, rdtype)
    return jax.lax.complex(jnp.cos(ang), sign * jnp.sin(ang))


def _full_dft_axis(x: jnp.ndarray, axis: int, L: int, sign: float, rdtype, prec) -> jnp.ndarray:
    """Full (length-L complex) DFT along ``axis`` with implicit zero padding.

    ``sign=-1`` is the forward transform, ``+1`` the unnormalized inverse.
    Lengths above ``_DFT_MAX_LEN`` run as a two-stage Cooley-Tukey split
    ``L = L1 * L2``: a DFT_L1 contraction, a twiddle multiply, and a DFT_L2
    contraction — O(L * (L1 + L2)) MXU work instead of O(L^2), which removes
    the former >4096 performance cliff (round-2 verdict) where the path fell
    back to XLA's TPU FFT (measured ~25x slower than MXU contractions)."""
    L1, L2 = _split_len(L)
    if L2 == 1:
        return _contract_axis(x, _dft_mat(L, x.shape[axis], L, sign, rdtype), axis, prec)
    n_in = x.shape[axis]
    if n_in < L:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, L - n_in)
        x = jnp.pad(x, pad)
    # n = L2*n1 + n2, k = k1 + L1*k2:
    #   X[k1 + L1 k2] = sum_n2 e^{s 2pi i k1 n2 / L} e^{s 2pi i k2 n2 / L2}
    #                   * sum_n1 x[L2 n1 + n2] e^{s 2pi i k1 n1 / L1}
    x = x.reshape(x.shape[:axis] + (L1, L2) + x.shape[axis + 1:])
    x = _contract_axis(x, _dft_mat(L1, L1, L1, sign, rdtype), axis, prec)
    tshape = [1] * x.ndim
    tshape[axis], tshape[axis + 1] = L1, L2
    x = x * _dft_mat(L1, L2, L, sign, rdtype).reshape(tshape)
    x = _contract_axis(x, _dft_mat(L2, L2, L2, sign, rdtype), axis + 1, prec)
    # (k1, k2) -> k = k1 + L1*k2: k2 becomes the outer split dim
    x = jnp.moveaxis(x, axis + 1, axis)
    return x.reshape(x.shape[:axis] + (L,) + x.shape[axis + 2:])


def _dft_rfftn(x: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    rdt = x.dtype
    prec = _dft_precision(plan)
    axes = plan.shift_axes
    for axis, L in zip(axes, plan.fft_shape):
        last = axis == axes[-1]
        if L <= _DFT_MAX_LEN:
            n_out = L // 2 + 1 if last else L
            x = _contract_axis(x, _dft_mat(n_out, x.shape[axis], L, -1.0, rdt), axis, prec)
        else:
            x = _full_dft_axis(x, axis, L, -1.0, rdt, prec)
            if last:  # keep only the non-negative half spectrum
                idx = [slice(None)] * x.ndim
                idx[axis] = slice(0, L // 2 + 1)
                x = x[tuple(idx)]
    return x


def _dft_irfftn(x: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    rdt = jnp.float32 if x.dtype == jnp.complex64 else jnp.float64
    prec = _dft_precision(plan)
    axes = plan.shift_axes
    for axis, L in zip(axes[:-1], plan.fft_shape[:-1]):
        if L <= _DFT_MAX_LEN:
            M = _dft_mat(L, x.shape[axis], L, 1.0, rdt) / L
            x = _contract_axis(x, M, axis, prec)
        else:
            x = _full_dft_axis(x, axis, L, 1.0, rdt, prec) / L
    axis = axes[-1]
    L = plan.fft_shape[-1]
    K = x.shape[axis]
    if L > _DFT_MAX_LEN:
        # rebuild the full spectrum from conjugate symmetry, run the
        # two-stage inverse, keep the real part
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(1, L - K + 1)
        upper = jnp.flip(jnp.conj(x[tuple(idx)]), axis=axis)
        full = jnp.concatenate([x, upper], axis=axis)
        return jnp.real(_full_dft_axis(full, axis, L, 1.0, rdt, prec)) / L
    # last axis: half spectrum -> real output.  x[n] = (1/L) sum_k w_k *
    # Re(X[k] e^{2 pi i k n / L}), w = 1 at k=0 (and k=L/2 for even L), 2
    # in between (the conjugate-symmetric upper half folded in).
    ang = _angles(L, K, L, rdt)  # (L, K) with [n, k] = 2 pi k n / L
    w = jnp.full((K,), 2.0, rdt).at[0].set(1.0)
    if L % 2 == 0 and K == L // 2 + 1:
        w = w.at[K - 1].set(1.0)
    C = jnp.cos(ang) * (w / L)
    S = jnp.sin(ang) * (-w / L)
    return (_contract_axis(jnp.real(x), C, axis, prec)
            + _contract_axis(jnp.imag(x), S, axis, prec))


def _rfftn(x: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    if jnp.dtype(x.dtype).itemsize < 4:
        x = x.astype(jnp.float32)  # FFT needs >= single precision
    if _use_matmul_dft(plan):
        return _dft_rfftn(x, plan)
    return jnp.fft.rfftn(x, s=plan.fft_shape, axes=plan.shift_axes)


def _irfftn(x: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    if _use_matmul_dft(plan):
        return _dft_irfftn(x, plan)
    return jnp.fft.irfftn(x, s=plan.fft_shape, axes=plan.shift_axes)


def _crop(x: jnp.ndarray, start: Tuple[int, ...], size: Tuple[int, ...]) -> jnp.ndarray:
    idx = (Ellipsis,) + tuple(slice(o, o + s) for o, s in zip(start, size))
    return x[idx]


def _pad_spatial(x: jnp.ndarray, left: Tuple[int, ...], right: Tuple[int, ...], mode: str) -> jnp.ndarray:
    pad = [(0, 0)] * 2 + [(l, r) for l, r in zip(left, right)]
    if mode == 'zero':
        return jnp.pad(x, pad)
    return jnp.pad(x, pad, mode=mode)


def extend_data(X: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Mode-specific boundary extension of a data-space tensor (V or R).

    After this extension both gradient correlations read only non-negative
    lags, so their inverse transforms crop at ``[0 : size]`` uniformly.
    """
    am1 = tuple(a - 1 for a in plan.atom_shape)
    zero = (0,) * plan.ndim
    if plan.mode == 'valid':
        return _pad_spatial(X, am1, am1, 'zero')
    if plan.mode == 'full':
        return X
    if plan.mode == 'circular':
        return X  # periodicity comes from the exact-length FFT itself
    if plan.mode == 'reflect':
        return _pad_spatial(X, zero, am1, 'reflect')
    raise ValueError(plan.mode)


def prepare_data(V: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Fourier transform of the extended data tensor; loop-invariant per fit."""
    return _rfftn(extend_data(V, plan), plan)


def reconstruct(W: jnp.ndarray, H: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """R[n,c,x] = sum_{m,a} W[m,c,a] * Hext[n,m,x+(A-1)-a]."""
    am1 = tuple(a - 1 for a in plan.atom_shape)
    if plan.mode == 'reflect':
        Hp = _pad_spatial(H, am1, (0,) * plan.ndim, 'reflect')
    else:
        # valid: H already spans S+A-1; full/circular: FFT zero-fill / cyclic
        # wrap realize the extension for free.
        Hp = H
    Hf = _rfftn(Hp, plan)
    Wf = _rfftn(W, plan)
    Rf = jnp.einsum('nm...,mc...->nc...', Hf, Wf, precision=plan.lax_precision)
    R = _irfftn(Rf, plan).astype(W.dtype)
    if plan.mode in ('valid', 'reflect'):
        return _crop(R, am1, plan.sample_shape)
    # full: conv_full(H, W) has exactly sample length; circular: exact period
    return _crop(R, (0,) * plan.ndim, plan.sample_shape)


def corr_H(Xf: jnp.ndarray, W: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Single-stream Fourier-domain H-gradient correlation:
    ``G[n,m,t] = sum_{c,a} Xext[n,c,t+a] W[m,c,a]`` from the transformed
    prepared tensor ``Xf``.  The batch extent is free; repeated calls with
    the same W share one ``rfftn(W)`` via XLA CSE."""
    Wf_c = jnp.conj(_rfftn(W, plan))
    Gf = jnp.einsum('nc...,mc...->nm...', Xf, Wf_c, precision=plan.lax_precision)
    return _crop(_irfftn(Gf, plan), (0,) * plan.ndim, plan.transform_shape)


def corr_W(Xf: jnp.ndarray, H: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Single-stream Fourier-domain W-gradient correlation, summed over
    samples and shifts; ``H`` arrives in data space."""
    Hf_c = jnp.conj(_rfftn(H, plan))
    Gf = jnp.einsum('nc...,nm...->mc...', Xf, Hf_c, precision=plan.lax_precision)
    return _crop(_irfftn(Gf, plan), (0,) * plan.ndim, plan.atom_shape)


def grad_H_pair_prepared(Af: jnp.ndarray, Bf: jnp.ndarray, W: jnp.ndarray,
                         plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(neg, pos) H-gradient correlations of two already-transformed
    streams, batch-stacked into one contraction."""
    G2 = corr_H(jnp.concatenate([Af, Bf], axis=0), W, plan)
    n = Af.shape[0]
    return G2[:n], G2[n:]


def grad_W_pair_prepared(Af: jnp.ndarray, Bf: jnp.ndarray, H: jnp.ndarray,
                         plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(neg, pos) W-gradient correlations of two already-transformed
    streams, channel-stacked into one contraction."""
    G2 = corr_W(jnp.concatenate([Af, Bf], axis=1), H, plan)
    c = Af.shape[1]
    return G2[:, :c], G2[:, c:]


def grad_H_pair(Vf: jnp.ndarray, R: jnp.ndarray, W: jnp.ndarray, plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(neg, pos) parts of dE/dH: corr(Xext, W) summed over channels.

    ``Vf`` is the precomputed :func:`prepare_data` transform of V; ``R`` is
    the current data-space reconstruction.
    """
    Rf = _rfftn(extend_data(R, plan), plan)
    tshape = plan.transform_shape
    zero = (0,) * plan.ndim
    Wf_c = jnp.conj(_rfftn(W, plan))
    out = []
    for Xf in (Vf, Rf):
        Gf = jnp.einsum('nc...,mc...->nm...', Xf, Wf_c, precision=plan.lax_precision)
        out.append(_crop(_irfftn(Gf, plan), zero, tshape))
    return tuple(out)


def grad_W_pair(Vf: jnp.ndarray, R: jnp.ndarray, H: jnp.ndarray, plan: ConvPlan) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(neg, pos) parts of dE/dW: corr(Xext, H) summed over samples and shifts."""
    zero = (0,) * plan.ndim
    Hf_c = jnp.conj(_rfftn(H, plan))
    Rf = _rfftn(extend_data(R, plan), plan)
    out = []
    for Xf in (Vf, Rf):
        Gf = jnp.einsum('nc...,nm...->mc...', Xf, Hf_c, precision=plan.lax_precision)
        out.append(_crop(_irfftn(Gf, plan), zero, plan.atom_shape))
    return tuple(out)
