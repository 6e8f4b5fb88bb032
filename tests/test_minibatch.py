"""Minibatch algorithm regression (reference pattern: tnmf/tests/test_minibatch.py).

Includes the structural invariant the reference pins numerically: Cyclic_MU
with any batch size is mathematically identical to full-batch iteration
(H rows are independent given W; the W statistics are plain sums over
batches), so the two trajectories must coincide exactly.
"""

from functools import lru_cache

import numpy as np
import pytest

from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF

from .fixtures import load_goldens, patches_2d

ALGORITHMS = ['full_batch'] + [a.name for a in MiniBatchAlgorithm]
STRATEGIES = ['jax_fft', 'jax_conv']


@lru_cache(maxsize=None)
def fit_nmf(backend, algorithm):
    np.random.seed(seed=42)
    nmf = TransformInvariantNMF(n_atoms=10, atom_shape=(7, 7), backend=backend)
    V = patches_2d()
    if algorithm == 'full_batch':
        nmf.fit_batch(V, sparsity_H=0.1, n_iterations=3)
    else:
        nmf.fit_minibatches(V, sparsity_H=0.1, algorithm=MiniBatchAlgorithm[algorithm],
                            batch_size=5, n_epochs=3, sag_lambda=0.8)
    return nmf


@pytest.mark.parametrize('algorithm', ALGORITHMS)
@pytest.mark.parametrize('backend', STRATEGIES)
def test_expected_energy(backend, algorithm):
    golden = load_goldens()['minibatch'][algorithm]
    nmf = fit_nmf(backend, algorithm)
    assert np.isclose(nmf._energy_function(), golden)
    np.testing.assert_allclose(nmf.W.sum(axis=(-1, -2)), 1.0)


def test_cyclic_equals_full_batch():
    a = fit_nmf('jax_fft', 'full_batch')
    b = fit_nmf('jax_fft', 'Cyclic_MU')
    np.testing.assert_allclose(a.W, b.W, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(a.H, b.H, rtol=1e-8, atol=1e-10)


def test_strategies_agree():
    for algorithm in ('ASG_MU', 'GSAG_MU'):
        a = fit_nmf('jax_fft', algorithm)
        b = fit_nmf('jax_conv', algorithm)
        np.testing.assert_allclose(a.W, b.W, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(a.H, b.H, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('algorithm', [a.name for a in MiniBatchAlgorithm])
def test_python_loop_matches_scan(algorithm):
    """A progress callback forces the per-epoch Python loop (the scan fast
    path cannot dispatch callbacks); its trajectory must be identical to
    the fused on-device scan program."""
    scan = fit_nmf('jax_fft', algorithm)
    np.random.seed(seed=42)
    nmf = TransformInvariantNMF(n_atoms=10, atom_shape=(7, 7), backend='jax_fft')
    epochs = []
    nmf.fit_minibatches(patches_2d(), sparsity_H=0.1,
                        algorithm=MiniBatchAlgorithm[algorithm],
                        batch_size=5, n_epochs=3, sag_lambda=0.8,
                        progress_callback=lambda m, e: epochs.append(e) or True)
    assert epochs == [0, 1, 2]
    np.testing.assert_allclose(nmf.W, scan.W, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(nmf.H, scan.H, rtol=1e-8, atol=1e-10)
