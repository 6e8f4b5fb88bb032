"""Streaming-fit regression (reference pattern: tnmf/tests/test_stream.py):
samples supplied as an array and as a generator must give identical results;
``max_subsamples`` stops early."""

import numpy as np
import pytest

from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF

from .fixtures import load_goldens, patches_2d

V = patches_2d(n=32)


def _fit(samples):
    np.random.seed(seed=42)
    nmf = TransformInvariantNMF(n_atoms=10, atom_shape=(7, 7), backend='jax_fft')
    nmf.fit(samples, sparsity_H=0.1, algorithm=MiniBatchAlgorithm.ASAG_MU,
            subsample_size=16, batch_size=3, n_epochs=3, sag_lambda=0.8)
    return nmf


@pytest.mark.parametrize('as_generator', [False, True])
def test_stream(as_generator):
    samples = (v for v in V) if as_generator else V
    nmf = _fit(samples)
    assert np.isclose(nmf._energy_function(), load_goldens()['stream']['ASAG_MU'])
    np.testing.assert_allclose(nmf.W.sum(axis=(-1, -2)), 1.0)


def test_stream_limited():
    np.random.seed(seed=42)
    nmf = TransformInvariantNMF(n_atoms=10, atom_shape=(7, 7), backend='jax_fft')
    nmf.fit(V, sparsity_H=0.1, algorithm=MiniBatchAlgorithm.Cyclic_MU,
            subsample_size=16, max_subsamples=1, batch_size=3, n_epochs=3, sag_lambda=0.8)
    assert np.isclose(nmf._energy_function(), load_goldens()['stream']['limited'])
