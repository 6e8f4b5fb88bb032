"""1-D fit regression: seeded pulse-train decomposition across reconstruction
modes and strategies (reference pattern: tnmf/tests/test_1d.py)."""

from functools import lru_cache

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF

from .fixtures import load_goldens, signal_1d

MODES = ['valid', 'full', 'circular', 'reflect']
STRATEGIES = ['jax_fft', 'jax_conv']


@lru_cache(maxsize=None)
def fit_nmf(backend, mode):
    np.random.seed(seed=42)
    nmf = TransformInvariantNMF(
        n_atoms=3, atom_shape=(20,), backend=backend, reconstruction_mode=mode)
    nmf.fit(signal_1d(), n_iterations=10, inhibition_strength=0.1)
    return nmf


@pytest.fixture(name='anchor', scope='module')
def fixture_anchor(request):
    return {mode: fit_nmf('jax_fft', mode) for mode in MODES}


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('backend', STRATEGIES)
def test_expected_energy_and_equivalence(backend, mode, anchor):
    golden = load_goldens()['1d'][mode]
    nmf = fit_nmf(backend, mode)

    assert np.isclose(nmf._energy_function(), golden)

    # all strategies must agree with the anchor strategy
    ref = anchor[mode]
    np.testing.assert_allclose(nmf.W, ref.W, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(nmf.H, ref.H, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(nmf.R, ref.R, rtol=1e-8, atol=1e-10)

    # atoms keep unit sum-norm
    np.testing.assert_allclose(nmf.W.sum(axis=-1), 1.0)
