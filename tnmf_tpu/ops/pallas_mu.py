"""Pallas TPU kernels for the multiplicative-update epilogue.

Two kernels:

* :func:`mu_ratio` — the plain elementwise MU ratio
  ``out = arr * neg / (pos + reg)`` in one VMEM pass (mostly useful as the
  simple template; XLA fuses this case well by itself).

* :func:`inhibited_mu_h` — the full H-update epilogue with lateral
  inhibition folded in: for each sample, one kernel invocation computes the
  separable inhibition field ``g = H * k_x * k_y`` (zero-padded small-tap
  convolutions), the same-atom term ``inh*(g - H)``, the cross-atom term
  ``cross/(M-1) * (sum_m g - g)``, and the multiplicative ratio
  ``H * neg / (pos + terms + reg)`` — all in a single pass through VMEM.
  On the XLA path this is 1-2 convolution dispatches per shift axis plus a
  chain of elementwise ops with HBM round trips between the conv outputs
  and the ratio; here the activation tile is loaded once.

The kernels handle 1-D and 2-D shift shapes (the dominant cases; rank-3+
falls back to the XLA path).  Grid is over samples; each block holds all
atoms of one sample so the cross-atom reduction stays in VMEM.  Eligibility
(shapes, VMEM footprint) is checked by :func:`inhibited_mu_h_supported`.

Gradient note: these kernels are *update rules*, not differentiated
through — no custom VJP is required (the MU algorithm never
backpropagates).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep a little headroom below the ~16 MB of VMEM per core
_VMEM_BUDGET = 10 * 1024 * 1024


def _ratio_kernel(arr_ref, neg_ref, pos_ref, reg_ref, out_ref):
    # mixed dtypes (bf16 arr, f32 neg/pos) promote inside the kernel; the
    # store must be cast back to the output dtype explicitly
    reg = reg_ref[0, 0]
    out_ref[:] = (arr_ref[:] * neg_ref[:] / (pos_ref[:] + reg)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=('interpret',))
def mu_ratio(arr, neg, pos, reg, *, interpret: bool = False):
    """Elementwise ``arr * neg / (pos + reg)`` as a single Pallas pass."""
    shape = arr.shape
    n = math.prod(shape)
    lanes = 128
    rows = -(-n // lanes)
    pad = rows * lanes - n

    def flat(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(rows, lanes)

    reg2 = jnp.asarray(reg, arr.dtype).reshape(1, 1)
    # row-tile the grid so arbitrarily large tensors stream through VMEM
    tile = min(rows, max(8, _VMEM_BUDGET // (4 * lanes * 4)))
    grid = (-(-rows // tile),)
    spec = pl.BlockSpec((tile, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ratio_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), arr.dtype),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=spec,
        interpret=interpret,
    )(flat(arr), flat(neg), flat(pos), reg2)
    return out.reshape(-1)[:n].reshape(shape)


# ---------------------------------------------------------------------------
# fused inhibited H update
# ---------------------------------------------------------------------------

def inhibited_mu_h_supported(h_shape: Tuple[int, ...], n_shift: int,
                             taps: Tuple[int, ...], dtype) -> bool:
    """Whether the fused kernel applies: TPU backend, 1-2 shift axes, and the
    per-sample working set (4 tensors + 2 scratches over all atoms) fits the
    budget."""
    if n_shift not in (1, 2):
        return False
    try:
        if jax.devices()[0].platform != 'tpu':
            return False  # Mosaic lowering requires a TPU backend
    except Exception:
        return False
    M = h_shape[1]
    spatial = h_shape[2:]
    # gradient pairs and scratches may be f32 even under bf16 storage
    # (the kernel computes in the promoted dtype), so budget conservatively
    itemsize = max(jnp.dtype(dtype).itemsize, 4)
    pads = [t - 1 for t in taps]
    if n_shift == 1:
        scratch = M * (spatial[0] + pads[0])
    else:
        scratch = M * (spatial[0] + pads[0]) * (spatial[1] + pads[1]) \
            + M * (spatial[0] + pads[0]) * spatial[1]
    per_sample = (4 * M * math.prod(spatial) + scratch) * itemsize
    return per_sample <= _VMEM_BUDGET


def _make_kernel_2d(M, X, Y, tx, ty, use_same, use_cross, cdtype):
    """All arithmetic runs in ``cdtype`` (the promoted H/neg/pos dtype —
    float32 when storage is bfloat16); the store casts back to the output
    ref's dtype, so mixed bf16-H / f32-gradient inputs are legal."""
    rx, ry = (tx - 1) // 2, (ty - 1) // 2

    def kernel(h_ref, neg_ref, pos_ref, kx_ref, ky_ref, scal_ref, out_ref,
               pad_ref, tmp_ref):
        h = h_ref[0].astype(cdtype)
        # zero-padded copy of H: (M, X + 2rx, Y + 2ry)
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[:, rx:rx + X, ry:ry + Y] = h
        # separable inhibition field, axis Y then axis X, taps unrolled
        tmp_ref[:] = jnp.zeros_like(tmp_ref)
        for t in range(ty):
            tmp_ref[:] += ky_ref[0, t] * pad_ref[:, :, t:t + Y]
        g = jnp.zeros((M, X, Y), cdtype)
        for t in range(tx):
            g = g + kx_ref[0, t] * tmp_ref[:, t:t + X, :]

        inh = scal_ref[0, 0]
        cross = scal_ref[0, 1]
        reg = scal_ref[0, 2]
        pos = pos_ref[0].astype(cdtype)
        if use_same:
            pos = pos + inh * (g - h)
        if use_cross:
            pos = pos + cross * (jnp.sum(g, axis=0, keepdims=True) - g)
        out_ref[0] = (h * neg_ref[0].astype(cdtype) / (pos + reg)).astype(out_ref.dtype)

    return kernel, (pltpu.VMEM((M, X + 2 * rx, Y + 2 * ry), cdtype),
                    pltpu.VMEM((M, X + 2 * rx, Y), cdtype))


def _make_kernel_1d(M, X, tx, use_same, use_cross, cdtype):
    rx = (tx - 1) // 2

    def kernel(h_ref, neg_ref, pos_ref, kx_ref, scal_ref, out_ref, pad_ref):
        h = h_ref[0].astype(cdtype)
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[:, rx:rx + X] = h
        g = jnp.zeros((M, X), cdtype)
        for t in range(tx):
            g = g + kx_ref[0, t] * pad_ref[:, t:t + X]
        inh = scal_ref[0, 0]
        cross = scal_ref[0, 1]
        reg = scal_ref[0, 2]
        pos = pos_ref[0].astype(cdtype)
        if use_same:
            pos = pos + inh * (g - h)
        if use_cross:
            pos = pos + cross * (jnp.sum(g, axis=0, keepdims=True) - g)
        out_ref[0] = (h * neg_ref[0].astype(cdtype) / (pos + reg)).astype(out_ref.dtype)

    return kernel, (pltpu.VMEM((M, X + 2 * rx), cdtype),)


@partial(jax.jit, static_argnames=('use_same', 'use_cross', 'interpret'))
def inhibited_mu_h(H, neg, pos, kernels, inhibition, cross_inhibition, reg, *,
                   use_same: bool = True, use_cross: bool = False,
                   interpret: bool = False):
    """Fused H update with lateral inhibition.

    Args:
      H, neg, pos: (N, M, *shift_shape) activation tensor and gradient parts.
      kernels: per-axis 1-D inhibition kernels (odd lengths).
      inhibition / cross_inhibition: same-atom / cross-atom strengths.
      reg: eps + sparsity (already summed).
    Returns:
      updated H.
    """
    N, M = H.shape[:2]
    spatial = H.shape[2:]
    n_shift = len(spatial)
    taps = tuple(k.shape[0] for k in kernels)
    dtype = H.dtype
    # compute dtype: mixed bf16 storage with f32 gradient pairs runs in f32
    cdtype = jnp.promote_types(jnp.promote_types(dtype, neg.dtype), pos.dtype)

    cross_scaled = cross_inhibition / max(M - 1, 1)
    scal = jnp.stack([jnp.asarray(inhibition, cdtype),
                      jnp.asarray(cross_scaled, cdtype),
                      jnp.asarray(reg, cdtype)]).reshape(1, 3)

    big = pl.BlockSpec((1, M) + spatial, lambda n: (n,) + (0,) * (1 + n_shift),
                       memory_space=pltpu.VMEM)
    smem = lambda w: pl.BlockSpec((1, w), lambda n: (0, 0), memory_space=pltpu.SMEM)  # noqa: E731

    if n_shift == 2:
        kfn, scratch = _make_kernel_2d(M, *spatial, *taps, use_same, use_cross, cdtype)
        in_specs = [big, big, big, smem(taps[0]), smem(taps[1]), smem(3)]
        args = (H, neg, pos,
                kernels[0].astype(cdtype).reshape(1, -1),
                kernels[1].astype(cdtype).reshape(1, -1), scal)
    elif n_shift == 1:
        kfn, scratch = _make_kernel_1d(M, spatial[0], taps[0], use_same, use_cross, cdtype)
        in_specs = [big, big, big, smem(taps[0]), smem(3)]
        args = (H, neg, pos, kernels[0].astype(cdtype).reshape(1, -1), scal)
    else:
        raise NotImplementedError('fused inhibition kernel supports rank 1-2')

    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct(H.shape, dtype),
        grid=(N,),
        in_specs=in_specs,
        out_specs=big,
        scratch_shapes=list(scratch),
        interpret=interpret,
    )(*args)
