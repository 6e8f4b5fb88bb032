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
falls back to the XLA path).  The 2-D kernel tiles each sample over
x-chunks (halos delivered as half-size neighbor-block views of the same
zero-chunk-padded array), so arbitrarily large samples stream through
VMEM; all atoms stay in the block so the cross-atom reduction is local.
The 1-D kernel holds whole samples (1-D problems are small).  Eligibility
(platform, shapes, tiling feasibility) is checked by
:func:`inhibited_mu_h_supported`.  Measured on v5e with full
data-dependent consumers (benchmarks/pallas_fusion.py): the XLA
banded-matmul chain (:mod:`tnmf_tpu.ops.inhibition`) beats this kernel
~5x at both fixture scale (16x16x128x128) and large batch scale
(64x16x248x248) — the kernel's unrolled tap loops are VPU-bound while the
band contraction rides the MXU — so the model's auto mode keeps it OFF;
``use_pallas=True`` forces it on for experimentation.

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

def _round16(x: int) -> int:
    # chunk heights stay 16-aligned so the half-size halo blocks (XC // 2)
    # keep the 8-sublane alignment Mosaic requires of block shapes
    return -(-x // 16) * 16


def _chunk_rows_2d(M: int, Y: int, rx: int, ry: int, itemsize: int) -> int:
    """x-chunk size for the tiled 2-D kernel: the largest multiple of 16 with
    ``XC/2 >= rx`` (the halo rides half-size neighbor blocks) whose working
    set — H/neg/pos/out blocks, two halo half-blocks, and the f32 padded /
    y-convolved scratches — fits the VMEM budget.  0 = unsupported."""
    itemsize = max(itemsize, 4)
    for xc in (256, 128, 64, 32, 16):
        if xc // 2 < rx:
            break
        # h + two half halos + neg + pos + out = 5*xc rows of blocks, each
        # double-buffered by the pipeline; plus the f32 scratches and the
        # in-kernel inhibition-field intermediate
        blocks = 2 * M * 5 * xc * Y * itemsize
        scratch = M * ((xc + 2 * rx) * (Y + 2 * ry) + (xc + 2 * rx) * Y + xc * Y) * 4
        if blocks + scratch <= _VMEM_BUDGET:
            return xc
    return 0


def inhibited_mu_h_supported(h_shape: Tuple[int, ...], n_shift: int,
                             taps: Tuple[int, ...], dtype) -> bool:
    """Whether the fused kernel applies: TPU backend, 1-2 shift axes, and a
    feasible tiling (2-D tiles over x-chunks, so sample size is unbounded;
    1-D holds whole samples)."""
    if n_shift not in (1, 2):
        return False
    M = h_shape[1]
    spatial = h_shape[2:]
    # gradient pairs and scratches may be f32 even under bf16 storage
    # (the kernel computes in the promoted dtype), so budget conservatively
    itemsize = max(jnp.dtype(dtype).itemsize, 4)
    pads = [t - 1 for t in taps]
    if n_shift == 2:
        rx, ry = pads[0] // 2, pads[1] // 2
        feasible = _chunk_rows_2d(M, spatial[1], rx, ry, itemsize) >= 1
    else:
        scratch = M * (spatial[0] + pads[0])
        feasible = (4 * M * math.prod(spatial) + scratch) * itemsize <= _VMEM_BUDGET
    if not feasible:
        return False
    try:
        return jax.devices()[0].platform == 'tpu'  # Mosaic needs a TPU backend
    except Exception:
        return False


def _make_kernel_2d(M, XC, HB, Y, tx, ty, use_same, use_cross, cdtype):
    """Tiled 2-D kernel: each grid step owns an x-chunk of ``XC`` rows of
    one sample; the ``rx``-row halos arrive as the tail/head of half-size
    (``HB``) neighbor blocks of the same (zero-chunk-padded) array, so
    samples of any x-extent stream through VMEM.  All arithmetic runs in
    ``cdtype`` (the promoted H/neg/pos dtype — float32 when storage is
    bfloat16); the store casts back to the output ref's dtype."""
    rx, ry = (tx - 1) // 2, (ty - 1) // 2

    def kernel(h_ref, hp_ref, hn_ref, neg_ref, pos_ref, kx_ref, ky_ref,
               scal_ref, out_ref, pad_ref, tmp_ref):
        h = h_ref[0].astype(cdtype)
        # chunk + halo rows of H, zero-padded in y: (M, XC + 2rx, Y + 2ry)
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[:, rx:rx + XC, ry:ry + Y] = h
        if rx:
            pad_ref[:, :rx, ry:ry + Y] = hp_ref[0, :, HB - rx:, :].astype(cdtype)
            pad_ref[:, rx + XC:, ry:ry + Y] = hn_ref[0, :, :rx, :].astype(cdtype)
        # separable inhibition field, axis Y then axis X, taps unrolled
        tmp_ref[:] = jnp.zeros_like(tmp_ref)
        for t in range(ty):
            tmp_ref[:] += ky_ref[0, t] * pad_ref[:, :, t:t + Y]
        g = jnp.zeros((M, XC, Y), cdtype)
        for t in range(tx):
            g = g + kx_ref[0, t] * tmp_ref[:, t:t + XC, :]

        inh = scal_ref[0, 0]
        cross = scal_ref[0, 1]
        reg = scal_ref[0, 2]
        pos = pos_ref[0].astype(cdtype)
        if use_same:
            pos = pos + inh * (g - h)
        if use_cross:
            pos = pos + cross * (jnp.sum(g, axis=0, keepdims=True) - g)
        out_ref[0] = (h * neg_ref[0].astype(cdtype) / (pos + reg)).astype(out_ref.dtype)

    return kernel, (pltpu.VMEM((M, XC + 2 * rx, Y + 2 * ry), cdtype),
                    pltpu.VMEM((M, XC + 2 * rx, Y), cdtype))


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

    if n_shift == 2:
        # tiled over x-chunks: unbounded sample sizes stream through VMEM
        X, Y = spatial
        rx, ry = (taps[0] - 1) // 2, (taps[1] - 1) // 2
        XC = _chunk_rows_2d(M, Y, rx, ry, jnp.dtype(dtype).itemsize)
        if XC < 1:
            raise ValueError('inhibited_mu_h: no feasible tiling; gate with '
                             'inhibited_mu_h_supported')
        # shrink to the sample when it is smaller, but keep the halo (rx)
        # within the half-block side channel; 16-aligned (see _round16)
        XC = max(min(XC, _round16(X)), _round16(2 * rx))
        nc = -(-X // XC)
        HB = XC // 2
        # one zero chunk on each side backs the edge halos (zero-padded
        # 'constant' boundary, like scipy.ndimage.convolve1d in the reference)
        Hx = jnp.pad(H, ((0, 0), (0, 0), (XC, (nc + 1) * XC - X), (0, 0)))
        negx = jnp.pad(neg, ((0, 0), (0, 0), (0, nc * XC - X), (0, 0)))
        posx = jnp.pad(pos, ((0, 0), (0, 0), (0, nc * XC - X), (0, 0)))

        cur = pl.BlockSpec((1, M, XC, Y), lambda n, u: (n, 0, u + 1, 0),
                           memory_space=pltpu.VMEM)
        prev_tail = pl.BlockSpec((1, M, HB, Y), lambda n, u: (n, 0, 2 * u + 1, 0),
                                 memory_space=pltpu.VMEM)
        next_head = pl.BlockSpec((1, M, HB, Y), lambda n, u: (n, 0, 2 * u + 4, 0),
                                 memory_space=pltpu.VMEM)
        blk = pl.BlockSpec((1, M, XC, Y), lambda n, u: (n, 0, u, 0),
                           memory_space=pltpu.VMEM)
        smem2 = lambda w: pl.BlockSpec((1, w), lambda n, u: (0, 0), memory_space=pltpu.SMEM)  # noqa: E731

        kfn, scratch = _make_kernel_2d(M, XC, HB, Y, *taps, use_same, use_cross, cdtype)
        out = pl.pallas_call(
            kfn,
            out_shape=jax.ShapeDtypeStruct((N, M, nc * XC, Y), dtype),
            grid=(N, nc),
            in_specs=[cur, prev_tail, next_head, blk, blk,
                      smem2(taps[0]), smem2(taps[1]), smem2(3)],
            out_specs=blk,
            scratch_shapes=list(scratch),
            interpret=interpret,
        )(Hx, Hx, Hx, negx, posx,
          kernels[0].astype(cdtype).reshape(1, -1),
          kernels[1].astype(cdtype).reshape(1, -1), scal)
        return out[:, :, :X, :]

    if n_shift != 1:
        raise NotImplementedError('fused inhibition kernel supports rank 1-2')

    big = pl.BlockSpec((1, M) + spatial, lambda n: (n, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = lambda w: pl.BlockSpec((1, w), lambda n: (0, 0), memory_space=pltpu.SMEM)  # noqa: E731
    kfn, scratch = _make_kernel_1d(M, spatial[0], taps[0], use_same, use_cross, cdtype)
    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct(H.shape, dtype),
        grid=(N,),
        in_specs=[big, big, big, smem(taps[0]), smem(3)],
        out_specs=big,
        scratch_shapes=list(scratch),
        interpret=interpret,
    )(H, neg, pos, kernels[0].astype(cdtype).reshape(1, -1), scal)
