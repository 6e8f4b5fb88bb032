"""Benchmark: MU iterations/sec on the 2-D conv-NMF config, new framework on
TPU vs the reference NumPy_FFT backend (its default) on CPU.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "iter/s", "vs_baseline": N}

The config mirrors the reference's 2-D regression fixture
(tnmf/tests/test_backends.py: 2 samples x 3 channels x ~76x102 image,
10 atoms of 7x7, sparsity 0.1, 'valid' mode).  The reference publishes no
benchmark numbers (BASELINE.md), so the baseline is measured here, on this
machine, taking the faster of float32/float64 for the reference.
"""

import json
import os
import sys
import time

import numpy as np

N_ATOMS = 10
ATOM_SHAPE = (7, 7)
SPARSITY = 0.1
REFERENCE_PATH = '/root/reference'


def make_V(dtype):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tnmf_tpu.utils.data_loading import synthetic_face
    img = synthetic_face(gray=False)[::10, ::10]
    return np.repeat(img.transpose((2, 0, 1))[np.newaxis], 2, axis=0).astype(dtype)


def bench_reference() -> float:
    """Reference NumPy_FFT iterations/sec (per-iteration wall clock via the
    progress callback, median over the fit)."""
    sys.path.insert(0, REFERENCE_PATH)
    from tnmf.TransformInvariantNMF import TransformInvariantNMF

    best = 0.0
    # best of {f32, f64} x 3 repetitions: the most favorable measurement for
    # the reference (shared-CPU noise otherwise inflates our ratio)
    for dtype in (np.float32, np.float64):
        V = make_V(dtype)
        for _ in range(3):
            stamps = []

            def cb(nmf, it):
                stamps.append(time.perf_counter())
                return True

            np.random.seed(42)
            nmf = TransformInvariantNMF(n_atoms=N_ATOMS, atom_shape=ATOM_SHAPE,
                                        backend='numpy_fft')
            nmf.fit(V, sparsity_H=SPARSITY, n_iterations=12, progress_callback=cb)
            per_iter = float(np.median(np.diff(stamps)))
            best = max(best, 1.0 / per_iter)
    return best


def bench_ours() -> float:
    """Our framework's iterations/sec using the fused on-device loop on the
    default platform (TPU when available)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    from tnmf_tpu import engine
    from tnmf_tpu.ops.modes import ConvPlan

    V = make_V(np.float32)
    plan = ConvPlan.create('valid', V.shape[2:], ATOM_SHAPE)
    strategy = engine.choose_strategy(plan, N_ATOMS, V.shape[1])

    rng = np.random.default_rng(42)
    W = rng.random((N_ATOMS, V.shape[1]) + ATOM_SHAPE).astype(np.float32)
    W /= W.sum(axis=(-2, -1), keepdims=True)
    H = rng.random((V.shape[0], N_ATOMS) + plan.transform_shape).astype(np.float32)

    Vd = jnp.asarray(V)
    Vp = engine.prepare_data(Vd, plan=plan, strategy=strategy)
    kernels = ()
    zero = jnp.float32(0.0)
    sp = jnp.float32(SPARSITY)
    statics = dict(plan=plan, strategy=strategy, update_H=True, update_W=True,
                   use_inhibition=False, use_cross=False)

    def run(n):
        Wn, Hn = engine.fit_loop(Vp, jnp.asarray(W), jnp.asarray(H), n, sp, zero, zero,
                                 kernels, **statics)
        # force full execution via host transfer: on some remote platforms
        # block_until_ready returns before the computation finishes
        return float(np.asarray(Wn).sum())

    run(2)          # compile
    t0 = time.perf_counter()
    run(100)
    base = time.perf_counter() - t0
    n_iters = max(200, int(100 * 2.0 / base))
    t0 = time.perf_counter()
    run(100 + n_iters)
    dt = time.perf_counter() - t0 - base  # subtract dispatch+transfer overhead
    return n_iters / dt


def main():
    ours = bench_ours()
    try:
        ref = bench_reference()
    except Exception as e:
        print(f'reference baseline unavailable: {e!r}', file=sys.stderr)
        ref = None
    result = {
        'metric': 'mu_iterations_per_sec_2d_conv_nmf',
        'value': round(ours, 3),
        'unit': 'iter/s',
        'vs_baseline': round(ours / ref, 3) if ref else None,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
