"""Pallas TPU kernel for the W-gradient statistics (the grad_W hot spot).

The W gradient of the conv-NMF energy is, per part (neg with X=V, pos with
X=R; reference role: ``/root/reference/tnmf/backends/NumPy_FFT.py:52-69``):

    G[c, m, ax, ay] = sum_{n, tx, ty}  Xp[n, c, tx+ax, ty+ay] * H[n, m, tx, ty]

i.e. a contraction over a *huge* axis (samples x transform positions, easily
10^6-10^7 elements) into a *tiny* output (channels x atoms x atom offsets,
10^3-10^4 elements).  Expressed as ``lax.conv_general_dilated`` (the
'huge-kernel conv', :mod:`tnmf_tpu.ops.conv` ``grad_W_pair``) XLA has almost
no output spatial extent to tile over, so the systolic array runs with a
handful of live rows and columns.

This kernel reshapes the problem so the MXU sees a healthier GEMM:

* output rows  = (ax, m)  - atom x-offsets folded into the atom axis,
* output cols  = (ay, c)  - atom y-offsets folded into the channel axis,
* contraction  = (n, u, ty) streamed in chunks, where ``u = tx + ax``.

For the flagship config (M=16 atoms, 7x7 atoms, C=3 channels with neg/pos
stacked to 6) that is a (112 x 56) output per chunk GEMM instead of the
conv's (16 x 6) - an order of magnitude more live MXU rows/cols.

Measured (v5e, dispatch-amortized, 64x256x256, full data-dependent mu_W
steps — scalar-sum consumers let XLA shrink the conv algebraically and
must not be used): XLA's conv lowering wins in realistic use (kernel at
0.4-0.6x for C=3, M=16/32); with prebuilt stacked inputs the kernel
shows op-level wins at C<=2 (up to ~1.3x) that shrink to ~2% end to end
because both paths pay the same extended-R + stacked-X staging.  The
kernel therefore stays opt-in (``use_pallas=True``).

Identity used (u = tx + ax, with H zero outside [0, Tx)):

    G[c, m, ax, ay] = sum_{n, u, ty} Xp[n, c, u, ty+ay] * H[n, m, u-ax, ty]

Layout decisions that carry the performance (earlier drafts lost it all to
relayouts and staging copies):

1. **Flat lane pitch.** Both operands live in HBM as (batch, feature,
   flat) with a row pitch ``P`` (a 128 multiple covering the y-window
   ``Ty+Ay-1``), so the contraction axis is a pure *lane* axis: the Ax
   x-shifts of H are lane slices at 128-aligned offsets ``s*P`` and the Ay
   y-shifts of X are cyclic lane rolls of the chunk tile.  Rolled-in
   wraparound junk lands exactly on contraction positions where the H row
   pitch is zero-padded (``ty >= Ty``), so it never contributes, and no
   sublane<->lane relayout happens in the hot loop.
2. **Pipelined lane-blocked loads, overlap via a second view.** The chunk
   tiles arrive through plain pipelined ``BlockSpec``s over the *flat* lane
   axis (blocks of ``K = UC*P`` lanes).  The H window of chunk ``u``
   overlaps chunk ``u+1`` by ``(Ax-1)*P`` lanes; instead of materializing
   overlapped copies in HBM (measured ~2x the kernel cost in staging), the
   kernel receives the *same* flat H array a second time through a
   half-block spec indexed one chunk ahead and stitches the window with two
   aligned lane slices.  Manual strided DMA was measured descriptor-bound
   (~23 GB/s); whole-block pipelining runs at HBM speed with zero staging.

Per chunk the kernel does aligned slices + rolls + one
(Ax*M, K) x (Ay*C2, K) -> (Ax*M, Ay*C2) ``dot_general`` accumulated in f32
into a VMEM-resident output block across the whole sequential grid.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.modes import ConvPlan

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024
_VMEM_LIMIT = 15 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sublane(itemsize: int) -> int:
    return {4: 8, 2: 16}.get(itemsize, 8)


def _geometry(plan: ConvPlan, M: int, C2: int, itemsize: int):
    """(P, UC, Mp, C2p): row pitch, u-chunk size (0 = unsupported), and the
    sublane-padded atom / stacked-channel counts."""
    Tx, Ty = plan.transform_shape
    Ax, Ay = plan.atom_shape
    sub = _sublane(itemsize)
    Mp = _round_up(M, sub)
    C2p = _round_up(C2, sub)
    P = _round_up(Ty + Ay - 1, _LANE)
    out_bytes = (Ax * Mp) * (Ay * C2p) * 4
    for uc in (64, 32, 16, 8, 4, 2):
        if uc < 2 * (Ax - 1):
            break  # overlap head must fit the half-block side channel
        K = uc * P
        lhs = Ax * Mp * K * itemsize
        rhs = Ay * C2p * K * itemsize
        blocks = 2 * (Mp * K + Mp * K // 2 + C2p * K) * itemsize  # double-buffered
        if lhs + rhs + blocks + out_bytes <= _VMEM_BUDGET:
            return P, uc, Mp, C2p
    return P, 0, Mp, C2p


def supported(plan: ConvPlan, n_atoms: int, n_channels2: int, dtype) -> bool:
    """Whether the blocked-GEMM grad_W kernel applies (compiled path)."""
    if plan.ndim != 2:
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    Tx, _ = plan.transform_shape
    Ax, _ = plan.atom_shape
    _, uc, _, _ = _geometry(plan, n_atoms, n_channels2, jnp.dtype(dtype).itemsize)
    # UC never shrinks below 2*(Ax-1) (half-block overlap requirement), so
    # the x-extent must cover at least one chunk
    if not (uc >= 1 and Tx + Ax - 1 >= 1):
        return False
    try:
        return jax.devices()[0].platform == 'tpu'  # Mosaic needs a TPU backend
    except Exception:
        return False


def _make_kernel(Mp, C2p, Ax, Ay, K, P):
    def kernel(ha_ref, hb_ref, x_ref, out_ref):
        ha = ha_ref[0]
        x = x_ref[0]
        # row block ax reads H[u - ax] = lane offset s*P with s = Ax-1-ax;
        # lanes beyond this chunk's block come from the one-ahead half block
        parts = []
        for ax in range(Ax):
            s = (Ax - 1 - ax) * P
            if s == 0:
                parts.append(ha)
            else:
                parts.append(jnp.concatenate(
                    [ha[:, s:], hb_ref[0, :, :s]], axis=1))
        lhs = jnp.concatenate(parts, axis=0)
        # row block ay reads X[u, ty+ay] = flat roll by ay lanes; wrapped
        # elements land at ty >= P - ay where the H pitch padding is zero
        rhs = jnp.concatenate(
            [pltpu.roll(x, K - ay, 1) if ay else x for ay in range(Ay)], axis=0)
        part = lax.dot_general(lhs, rhs, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += part

    return kernel


@partial(jax.jit, static_argnames=('plan', 'interpret'))
def grad_w_gemm(Xp2: jnp.ndarray, H: jnp.ndarray, *, plan: ConvPlan,
                interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(neg, pos) W-gradient statistics from the stacked extended data.

    Args:
      Xp2: (N, 2*C, Ex, Ey) - mode-extended V and R stacked along channels
        (``Ex = Tx+Ax-1``, ``Ey = Ty+Ay-1`` for every reconstruction mode).
      H: (N, M, Tx, Ty) activations.
    Returns:
      (neg, pos), each (M, C, Ax, Ay) in float32 (the accumulation dtype).
    """
    N, C2, Ex, Ey = Xp2.shape
    M = H.shape[1]
    Tx, Ty = plan.transform_shape
    Ax, Ay = plan.atom_shape
    dtype = H.dtype
    itemsize = jnp.dtype(dtype).itemsize

    P, UC, Mp, C2p = _geometry(plan, M, C2, itemsize)
    if UC < 1:
        raise ValueError('grad_w_gemm: unsupported geometry; use supported() to gate')
    n_chunks = -(-Ex // UC)
    Uxp = n_chunks * UC
    K = UC * P
    K2 = K // 2  # overlap side-channel block; (Ax-1)*P <= K2 by geometry

    Xp2 = Xp2.astype(dtype)
    # flat row pitch P >= Ty+Ay-1: H real in [:Tx, :Ty] (the y-pad zeros kill
    # the rhs roll wraparound, the pitch tail, and the x-overrun), X real in
    # [:Ex, :Ey].  M / C2 are sublane-padded so blocks are tiling-aligned;
    # zero rows/channels produce zero GEMM rows/cols, dropped afterwards.
    # One extra chunk of zero rows backs the one-ahead half block.
    Hp = jnp.pad(H, ((0, 0), (0, Mp - M), (Ax - 1, Uxp + UC - (Ax - 1) - Tx), (0, P - Ty)))
    Hflat = Hp.reshape(N, Mp, (Uxp + UC) * P)
    Xpp = jnp.pad(Xp2, ((0, 0), (0, C2p - C2), (0, Uxp - Ex), (0, P - Ey)))
    Xflat = Xpp.reshape(N, C2p, Uxp * P)

    kernel = _make_kernel(Mp, C2p, Ax, Ay, K, P)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Ax * Mp, Ay * C2p), jnp.float32),
        grid=(N, n_chunks),
        in_specs=[
            pl.BlockSpec((1, Mp, K), lambda n, u: (n, 0, u),
                         memory_space=pltpu.VMEM),
            # the same flat H, one chunk ahead, in half-size blocks
            pl.BlockSpec((1, Mp, K2), lambda n, u: (n, 0, 2 * u + 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2p, K), lambda n, u: (n, 0, u),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Ax * Mp, Ay * C2p), lambda n, u: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Uxp * P * (Ax * Mp) * (Ay * C2p),
            bytes_accessed=(Hflat.size * 3 // 2 + Xflat.size) * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Hflat, Hflat, Xflat)

    # (ax*Mp, ay*C2p) -> (M, C2, Ax, Ay), matching conv.grad_W_pair's layout
    G = out.reshape(Ax, Mp, Ay, C2p)[:, :M, :, :C2].transpose(1, 3, 0, 2)
    c = C2 // 2
    return G[:, :c], G[:, c:]
