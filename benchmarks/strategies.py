"""Strategy calibration: fft vs conv MU-iteration time across atom sizes.

Run on the target hardware to calibrate ``engine.choose_strategy`` and the
FFT padding policy:

    python benchmarks/strategies.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from tnmf_tpu import engine  # noqa: E402
from tnmf_tpu.ops.modes import ConvPlan  # noqa: E402


def time_config(sample_shape, atom_shape, strategy, n_samples=4, n_channels=3,
                n_atoms=16, dtype=np.float32, mode='valid', fft_policy='5-smooth'):
    plan = ConvPlan.create(mode, sample_shape, atom_shape, fft_policy)
    rng = np.random.default_rng(0)
    V = rng.random((n_samples, n_channels) + sample_shape).astype(dtype)
    W = rng.random((n_atoms, n_channels) + atom_shape).astype(dtype)
    W /= W.sum(axis=tuple(range(-len(atom_shape), 0)), keepdims=True)
    H = rng.random((n_samples, n_atoms) + plan.transform_shape).astype(dtype)

    Vd = jnp.asarray(V)
    Vp = engine.prepare_data(Vd, plan=plan, strategy=strategy)
    z = jnp.asarray(0.0, dtype)
    statics = dict(plan=plan, strategy=strategy, update_H=True, update_W=True,
                   use_inhibition=False, use_cross=False)

    def run(n):
        Wn, _ = engine.fit_loop(Vp, jnp.asarray(W), jnp.asarray(H), n,
                                jnp.asarray(0.1, dtype), z, z, (), **statics)
        return float(np.asarray(Wn).sum())  # force completion

    run(2)
    t0 = time.perf_counter()
    run(12)
    base = time.perf_counter() - t0
    n = max(30, int(10 * 1.0 / max(base / 10, 1e-4)))
    t0 = time.perf_counter()
    run(12 + n)
    dt = time.perf_counter() - t0 - base
    return dt / n


def main():
    print(f'{"config":38s} {"fft":>10s} {"conv":>10s}  winner')
    cases = [
        ((256,), (8,)), ((256,), (32,)), ((1024,), (64,)),
        ((64, 64), (3, 3)), ((64, 64), (7, 7)), ((64, 64), (15, 15)),
        ((128, 128), (7, 7)), ((128, 128), (15, 15)), ((128, 128), (31, 31)),
        ((256, 256), (7, 7)), ((256, 256), (15, 15)), ((256, 256), (31, 31)),
    ]
    for sample, atom in cases:
        res = {}
        for strategy in ('fft', 'conv'):
            try:
                res[strategy] = time_config(sample, atom, strategy)
            except Exception as e:
                res[strategy] = float('nan')
                print(f'  ! {strategy} failed: {type(e).__name__}: {str(e)[:80]}')
        win = 'conv' if res['conv'] < res['fft'] else 'fft'
        print(f'{str(sample)+" x "+str(atom):38s} {res["fft"]*1e3:9.3f}ms {res["conv"]*1e3:9.3f}ms  {win}')

    print('\nfft policy (valid mode, 128x128 x 15x15):')
    for pol in ('5-smooth', 'pow2'):
        t = time_config((128, 128), (15, 15), 'fft', fft_policy=pol)
        print(f'  {pol:10s} {t*1e3:9.3f}ms')


if __name__ == '__main__':
    main()
