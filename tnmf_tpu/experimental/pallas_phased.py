"""Fused phased mu_H update as a Pallas TPU kernel — a measured
**negative result**, kept for the record (like its siblings in this
package).

Why this kernel was built (measured on v5e at the flagship 64x256x256 /
16 atoms / C=1 config, ``benchmarks/op_breakdown.py``): the XLA lowering
of the phased H update materializes one of the two gradient convolutions
— an elementwise consumer (the MU ratio) can fuse only one producer chain
— costing two extra H-sized HBM streams per iteration.  ``grad_H pair +
ratio`` measures ~0.78 ms bf16 / ~1.74 ms f32 against a 2-H-stream floor
of ~0.45 / 0.85 ms.  This kernel computes **both** gradient correlations
and the multiplicative ratio in one VMEM pass:

    read  Vs[n]  (phased prepared data, loop-invariant, R-sized)
    read  Rs[n]  (phased extended reconstruction, R-sized)
    read  H[n]   (one H-sized stream)
    write H'[n]  (one H-sized stream)

The phased-domain gradient convolution has tiny taps (``ceil((r-1+a-1)/r)
+ 1`` per axis, e.g. 3x3 for 9x9 atoms at r=4) and phase-multiplied
channel counts, so inside the kernel it is an im2col matmul: the taps and
phased input channels merge into a contraction depth of ``prod(taps) *
C*prod(r)`` (144 at the flagship config) against ``M*prod(r)`` output
columns — both MXU-friendly — while the channels-last carry
(:mod:`tnmf_tpu.ops.phased`) makes the kernel's mandatory default layout
the fast one (phased channels in the 128-lane minor axis).

Gradient statistics accumulate in float32 on the MXU even under bfloat16
storage (the XLA path stores them in bf16 — ``keep_low`` — because there
they are an HBM stream; here they never leave VMEM).  The multiply
precision of the matmuls follows ``plan.lax_precision``, the same policy
the XLA convolutions run under.

**Why it loses** (v5e, flagship config, slope-timed whole-``mu_H``
including the shared reconstruction): 3.34 ms vs XLA's 1.27 ms in bf16,
4.26 vs 2.33 ms in f32 (~0.4x).  Mosaic cannot concatenate vector slices
whose offsets differ on a non-concatenated dimension ("result/input
offset mismatch"), so the in-kernel im2col must round-trip a VMEM
scratch buffer; those per-tap copies run on 16 of 128 vector lanes (the
phased channel count) and cost more than the two H-sized HBM streams the
fusion saves.  Streaming a *pre-computed* im2col (9x data inflation)
would trade the scratch for two V-col streams (~160 MB) — roughly the
same bytes as the waste it removes.  An XLA-level alternative — both
correlations as ONE grouped conv (``feature_group_count=2``,
channel-stacked Vs|Rs, block-diagonal kernel) so a single producer fuses
into the ratio — was also measured: 2.24 ms vs 0.78 ms bf16 (0.35x);
XLA's grouped-conv lowering on TPU is far slower than two plain convs.
The XLA phased path therefore stays the production lowering; the
remaining headroom (~0.3 ms bf16 of a 1.75 ms iteration) does not
justify a hand-scheduled reconstruction+gradient megakernel.

Reference role: the H half of the MU hot loop
(``/root/reference/tnmf/TransformInvariantNMF.py:246-271`` driving
``NumPy_FFT.py:71-88``), re-lowered TPU-first.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import phased
from ..ops.modes import ConvPlan

# per-kernel VMEM budget (bytes): v5e/v4 have ~16 MiB of VMEM per core;
# leave headroom for Mosaic's own buffers and the double-buffered pipeline
_VMEM_BUDGET = 11 * 2 ** 20


def _kernel(add_ref, vs_ref, rs_ref, k2f_ref, h_ref, *rest,
            taps, precision, with_extra):
    """One (sample, row-block) step: im2col both operands, two matmuls,
    MU ratio.  ``rest`` is ``(pe_ref, out_ref, col_ref)`` with the optional
    extra positive term (lateral inhibition), else ``(out_ref, col_ref)``;
    ``col_ref`` is the VMEM im2col scratch (scratch refs follow outputs)."""
    if with_extra:
        pe_ref, out_ref, col_ref = rest
    else:
        pe_ref, (out_ref, col_ref) = None, rest
    j = pl.program_id(1)
    k1, k2 = taps
    _, yb, y2, mp = h_ref.shape
    cp = vs_ref.shape[-1]
    f32 = jnp.float32

    def im2col(ref):
        # assemble the window matrix through the VMEM scratch: shifted
        # window reads land at lane offset i*cp via *stores* (a vector
        # concatenate of slices with mismatched sublane offsets is
        # unimplemented in Mosaic: "result/input offset mismatch on
        # non-concat dimension")
        for dy in range(k1):
            for dx in range(k2):
                i = dy * k2 + dx
                col_ref[:, :, i * cp:(i + 1) * cp] = (
                    ref[0, pl.ds(j * yb + dy, yb), dx:dx + y2, :])
        return col_ref[:].reshape(yb * y2, k1 * k2 * cp)

    k2f = k2f_ref[:]
    dn = (((1,), (0,)), ((), ()))
    gn = lax.dot_general(im2col(vs_ref), k2f, dn,
                         preferred_element_type=f32, precision=precision)
    t = h_ref[0].reshape(yb * y2, mp).astype(f32) * gn
    gp = lax.dot_general(im2col(rs_ref), k2f, dn,
                         preferred_element_type=f32, precision=precision)
    if with_extra:
        gp = gp + pe_ref[0].reshape(yb * y2, mp).astype(f32)
    out = t / (gp + add_ref[0, 0])
    out_ref[0] = out.reshape(yb, y2, mp).astype(out_ref.dtype)


def _row_blocks(Y1, Y2, Mp, E1, E2, Cp, k1, k2, itemsize, extra):
    """Smallest row-block count whose VMEM footprint fits the budget;
    prefers exact divisors of Y1 (no ragged masking)."""
    def est(nj, yb):
        h_blk = yb * Y2 * Mp * itemsize
        xcol = yb * Y2 * k1 * k2 * Cp * itemsize
        g = yb * Y2 * Mp * 4
        # mu_h pads Vs/Rs rows up to nj*yb + k1 - 1 so ragged tail blocks
        # never clamp-shift; budget the PADDED extent, not E1 (an
        # underestimate of up to k1-1 rows near the budget boundary)
        vs = max(E1, nj * yb + k1 - 1) * E2 * Cp * itemsize
        # accounting calibrated against Mosaic's scoped-vmem report (a
        # 17.3M actual vs 11M estimated OOM at the flagship f32 config):
        # double-buffered pipeline blocks for h, out (+ pe) and BOTH
        # full-sample inputs; the im2col scratch plus its read copy; and
        # the f32 stack peak (gn, t, gp, h.astype(f32), out before cast)
        return ((4 + 2 * extra) * h_blk + 4 * vs + 2 * xcol + 5 * g)
    for nj in range(1, Y1 + 1):
        yb = -(-Y1 // nj)
        if est(nj, yb) <= _VMEM_BUDGET:
            # snap to an exact divisor when one is close (<= 25% smaller
            # blocks), avoiding ragged tail blocks
            for nj2 in range(nj, min(Y1, nj + max(1, nj // 4)) + 1):
                if Y1 % nj2 == 0:
                    return nj2
            return nj
    return Y1


def geometry_ok(plan: ConvPlan, dtype) -> bool:
    """Platform-independent applicability: 2-D phased geometry and a TPU
    MXU dtype (interpret-mode tests may run any dtype via ``mu_h``
    directly)."""
    if plan.ndim != 2:
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    return phased.geometry(plan) is not None


def supported(plan: ConvPlan, dtype) -> bool:
    """Whether the compiled fused kernel applies on this backend."""
    if not geometry_ok(plan, dtype):
        return False
    try:
        return jax.devices()[0].platform == 'tpu'  # Mosaic needs a TPU backend
    except Exception:  # pragma: no cover - no backend at all
        return False


def mu_h(Vs: jnp.ndarray, R: jnp.ndarray, W: jnp.ndarray, H: jnp.ndarray,
         plan: ConvPlan, denom_add, pos_extra: Optional[jnp.ndarray] = None,
         *, interpret: bool = False) -> jnp.ndarray:
    """Fused phased H update: ``H * (Vs*K2) / (Rs*K2 [+ pos_extra] +
    denom_add)`` with both correlations and the ratio in one VMEM pass.

    ``Vs`` is the phased prepared data, ``R`` the canonical reconstruction
    (its mode extension + phase blocking happens here, in XLA — an R-sized
    stream), ``H`` the channels-last phased carry.  ``pos_extra``
    (optional, H-shaped) is added to the positive statistics before the
    ratio — the lateral-inhibition term.  Trajectory-equivalent to the XLA
    phased path (tests/test_pallas_phased.py)."""
    g = phased.geometry(plan)
    Rs = phased._extend_phased(R, plan)
    K2 = phased._grad_kernel(W, g)                 # (Mp, Cp, k1, k2)
    Mp, Cp, k1, k2 = K2.shape
    # matmul form: rows ordered (dy, dx, c_phased) to match the im2col
    K2f = K2.transpose(2, 3, 1, 0).reshape(k1 * k2 * Cp, Mp)
    N, Y1, Y2 = H.shape[0], H.shape[1], H.shape[2]
    itemsize = jnp.dtype(H.dtype).itemsize
    nj = _row_blocks(Y1, Y2, Mp, Vs.shape[1], Vs.shape[2], Cp, k1, k2,
                     itemsize, pos_extra is not None)
    yb = -(-Y1 // nj)
    # ragged tail blocks dynamically slice data rows [j*yb+dy, +yb); pad
    # the (small) data tensors so those slices never clamp-shift (clamped
    # starts would misalign valid rows, not just the masked tail)
    need = nj * yb + k1 - 1
    if need > Vs.shape[1]:
        pads = [(0, 0), (0, need - Vs.shape[1]), (0, 0), (0, 0)]
        Vs, Rs = jnp.pad(Vs, pads), jnp.pad(Rs, pads)
    E1, E2 = Vs.shape[1], Vs.shape[2]
    add = jnp.asarray(denom_add, jnp.float32).reshape(1, 1)

    with_extra = pos_extra is not None
    kernel = partial(_kernel, taps=(k1, k2), precision=plan.lax_precision,
                     with_extra=with_extra)
    h_spec = pl.BlockSpec((1, yb, Y2, Mp), lambda n, j: (n, j, 0, 0),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, E1, E2, Cp), lambda n, j: (n, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), d_spec, d_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM), h_spec]
    operands = [add, Vs, Rs, K2f, H]
    if with_extra:
        in_specs.append(h_spec)
        operands.append(pos_extra.astype(H.dtype))
    h_bytes = N * Y1 * Y2 * Mp * itemsize
    return pl.pallas_call(
        kernel,
        grid=(N, nj),
        in_specs=in_specs,
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct(H.shape, H.dtype),
        scratch_shapes=[pltpu.VMEM((yb, Y2, k1 * k2 * Cp), H.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * N * Y1 * Y2 * (k1 * k2 * Cp) * Mp,
            bytes_accessed=(2 + 2 * with_extra) * h_bytes + 2 * Vs.nbytes,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
