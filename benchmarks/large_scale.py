"""Large-batch conv-NMF throughput on one chip (the single-chip slice of
BASELINE.md's scale config; the multi-chip path is validated by
``__graft_entry__.dryrun_multichip`` and examples/data_parallel_fit.py).

    python benchmarks/large_scale.py [n_samples]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from tnmf_tpu import engine  # noqa: E402
from tnmf_tpu.ops.modes import ConvPlan  # noqa: E402


def run(n_samples=64, sample=(256, 256), atom=(9, 9), n_atoms=16, n_channels=1,
        dtype='float32', strategy='conv'):
    plan = ConvPlan.create('valid', sample, atom)
    rng = np.random.default_rng(0)
    dt = jnp.dtype(dtype)
    V = jnp.asarray(rng.random((n_samples, n_channels) + sample, np.float32), dt)
    W = rng.random((n_atoms, n_channels) + atom, np.float32)
    W /= W.sum(axis=(-2, -1), keepdims=True)
    W = jnp.asarray(W, dt)
    H = jnp.asarray(rng.random((n_samples, n_atoms) + plan.transform_shape, np.float32), dt)

    Vp = engine.prepare_data(V, plan=plan, strategy=strategy)
    z = jnp.zeros((), dt)
    statics = dict(plan=plan, strategy=strategy, update_H=True, update_W=True,
                   use_inhibition=False, use_cross=False)

    def go(n):
        Wn, _ = engine.fit_loop(Vp, W, H, n, z, z, z, (), **statics)
        return float(np.asarray(Wn.astype(jnp.float32)).sum())

    go(2)  # compile
    t0 = time.perf_counter()
    go(5)
    base = time.perf_counter() - t0
    n = max(10, int(5 * 3.0 / max(base, 1e-3)))
    t0 = time.perf_counter()
    go(5 + n)
    dt_s = time.perf_counter() - t0 - base
    per_iter = dt_s / n
    px = n_samples * n_channels * sample[0] * sample[1]
    print(f'{dtype:9s} {strategy:5s} N={n_samples:4d} {sample}x{atom}: '
          f'{per_iter * 1e3:8.2f} ms/iter  {1 / per_iter:7.2f} it/s  '
          f'{px / per_iter / 1e9:6.2f} Gpx/s', flush=True)
    return per_iter


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    for dtype in ('float32', 'bfloat16'):
        for strategy in ('conv',):
            run(n_samples=n, dtype=dtype, strategy=strategy)
    # the reference fixture scale, for continuity with bench.py
    run(n_samples=2, sample=(76, 102), atom=(7, 7), n_atoms=10, n_channels=3)


if __name__ == '__main__':
    main()
