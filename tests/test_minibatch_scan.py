"""The on-device scanned minibatch path must reproduce the Python-loop
path exactly (same updates, same RNG consumption) for every algorithm."""

import logging

import numpy as np
import pytest

from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF


def _fit(V, algorithm, force_python_loop, **kw):
    np.random.seed(42)
    # verbose=2 enables INFO logging, which disables the scan fast path
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3),
                                verbose=2 if force_python_loop else 0)
    if force_python_loop:
        nmf._logger.disabled = True  # silence, but keep isEnabledFor(INFO)
    nmf.fit_minibatches(V, algorithm=algorithm, **kw)
    nmf._logger.disabled = False
    return nmf


@pytest.mark.parametrize('algorithm', list(MiniBatchAlgorithm))
@pytest.mark.parametrize('sag_lambda', [0.8, 1.0])
def test_scan_matches_python_loop(algorithm, sag_lambda):
    V = np.random.default_rng(3).random((12, 2, 10, 10))
    kw = dict(batch_size=3, n_epochs=3, sag_lambda=sag_lambda, sparsity_H=0.1)

    loop = _fit(V, algorithm, force_python_loop=True, **kw)
    scan = _fit(V, algorithm, force_python_loop=False, **kw)

    np.testing.assert_allclose(scan.W, loop.W, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(scan.H, loop.H, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('algorithm', list(MiniBatchAlgorithm))
def test_ragged_batches_scan_matches_python_loop(algorithm):
    """n_samples not divisible by batch_size rides the scan path via
    zero-padded virtual samples (zero rows contribute zero to every MU
    statistic and H=0 is absorbing), reproducing the Python path's short
    final batch exactly."""
    V = np.random.default_rng(3).random((7, 1, 8, 8))
    kw = dict(batch_size=3, n_epochs=2, sparsity_H=0.1)

    loop = _fit(V, algorithm, force_python_loop=True, **kw)
    scan = _fit(V, algorithm, force_python_loop=False, **kw)

    assert scan.H.shape[0] == 7  # padding sliced back off
    np.testing.assert_allclose(scan.W, loop.W, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(scan.H, loop.H, rtol=1e-10, atol=1e-12)
    assert np.isfinite(scan._energy_function())


def test_scan_with_inhibition():
    V = np.random.default_rng(3).random((6, 1, 10, 10))
    kw = dict(batch_size=3, n_epochs=2, inhibition_strength=0.2,
              cross_atom_inhibition_strength=0.1)
    loop = _fit(V, MiniBatchAlgorithm.ASG_MU, True, **kw)
    scan = _fit(V, MiniBatchAlgorithm.ASG_MU, False, **kw)
    np.testing.assert_allclose(scan.W, loop.W, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(scan.H, loop.H, rtol=1e-10, atol=1e-12)
