"""Regularizer behavior regression (reference pattern:
tnmf/tests/test_sparsity_inhibition.py): energy, L1(H) and L0(H) across a
sweep of sparsity / inhibition / cross-inhibition settings, plus the
qualitative monotonicity the numbers encode (more sparsity -> smaller L1)."""

from functools import lru_cache

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF

from .fixtures import image_2d, load_goldens

SETTINGS = [
    dict(),
    dict(sparsity_H=0.1),
    dict(sparsity_H=1.0),
    dict(inhibition_strength=0.1),
    dict(inhibition_strength=1.0),
    dict(cross_atom_inhibition_strength=0.5),
    dict(sparsity_H=0.5, inhibition_strength=0.5, cross_atom_inhibition_strength=0.5),
]


def _key(params):
    return ','.join(f'{k}={v}' for k, v in sorted(params.items())) or 'plain'


def fit_nmf(**params):
    np.random.seed(seed=42)
    nmf = TransformInvariantNMF(n_atoms=5, atom_shape=(5, 5), backend='jax_fft')
    nmf.fit(image_2d(), n_iterations=10, **params)
    return nmf


@pytest.mark.parametrize('params', SETTINGS, ids=_key)
def test_sparsity_inhibition(params):
    golden = load_goldens()['sparsity_inhibition'][_key(params)]
    nmf = fit_nmf(**params)
    H = nmf.H
    assert np.isclose(nmf._energy_function(), golden['energy'])
    assert np.isclose(np.abs(H).sum(), golden['l1'], rtol=1e-5)
    assert int((H > 1e-4).sum()) == golden['l0']


def test_sparsity_monotone():
    l1 = [np.abs(fit_nmf(**p).H).sum() for p in (dict(), dict(sparsity_H=0.5), dict(sparsity_H=2.0))]
    assert l1[0] > l1[1] > l1[2]
