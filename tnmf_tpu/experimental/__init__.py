"""Experimental TPU kernels — measured negative results, kept opt-in.

Both Pallas kernels here were built for the MU hot loop and benchmarked
honestly against the XLA lowerings with full data-dependent consumers
(benchmarks/pallas_fusion.py, one v5e chip):

* :mod:`.pallas_mu` — fused inhibited H-update epilogue; loses ~5x to the
  XLA banded-matmul inhibition chain (:mod:`tnmf_tpu.ops.inhibition`) at
  every measured scale.
* :mod:`.pallas_gw` — blocked-GEMM W-gradient statistics; 0.4-1.0x XLA's
  conv lowering in realistic mu_W use, and superseded outright by the
  phase-decomposed lowering (:mod:`tnmf_tpu.ops.phased`), which reaches
  the same statistics ~1.7x faster than even XLA's plain conv at the
  flagship scale.
* :mod:`.pallas_phased` — fused phased H-update (both gradient
  correlations + MU ratio in one VMEM pass, targeting the two H-sized
  streams XLA materializes); ~0.4x the XLA phased path in both dtypes —
  the scratch-based in-kernel im2col Mosaic requires costs more than the
  fusion saves (full analysis in its docstring).

They remain available via ``TransformInvariantNMF(use_pallas=True)`` for
experimentation, fall back silently off-TPU or for unsupported shapes, and
their compiled-mode parity is checked on real TPU by
``python bench.py --pallas-check`` (the CI suite runs them in interpreter
mode on CPU).
"""

from . import pallas_gw, pallas_mu, pallas_phased  # noqa: F401

__all__ = ['pallas_gw', 'pallas_mu', 'pallas_phased']
