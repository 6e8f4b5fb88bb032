"""2-D image fit regression across modes and strategies (reference pattern:
tnmf/tests/test_backends.py, with the synthetic stand-in image)."""

from functools import lru_cache

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF

from .fixtures import image_2d, load_goldens

MODES = ['valid', 'full', 'circular']
STRATEGIES = ['jax_fft', 'jax_conv']


@lru_cache(maxsize=None)
def fit_nmf(backend, mode):
    np.random.seed(seed=42)
    nmf = TransformInvariantNMF(
        n_atoms=10, atom_shape=(7, 7), backend=backend, reconstruction_mode=mode)
    nmf.fit(image_2d(), sparsity_H=0.1, n_iterations=10)
    return nmf


@pytest.fixture(name='expected', scope='module')
def fixture_expected():
    out = {}
    for mode in MODES:
        nmf = fit_nmf('jax_conv', mode)
        out[mode] = (nmf.W, nmf.H, nmf.R, nmf.R_partial(0))
    return out


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('backend', STRATEGIES)
def test_expected_factorization(backend, mode, expected):
    golden = load_goldens()['2d'][mode]
    W, H, R, R0 = expected[mode]

    nmf = fit_nmf(backend, mode)
    assert np.isclose(nmf._energy_function(), golden)
    np.testing.assert_allclose(nmf.W, W, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(nmf.H, H, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(nmf.R, R, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(nmf.R_partial(0), R0, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(nmf.W.sum(axis=(-1, -2)), 1.0)


def test_partial_reconstructions_sum_to_R():
    """The model is linear in the atoms: partial reconstructions must add up
    to the full reconstruction exactly."""
    nmf = fit_nmf('jax_fft', 'valid')
    total = sum(nmf.R_partial(i) for i in range(10))
    np.testing.assert_allclose(total, nmf.R, rtol=1e-8, atol=1e-10)
