"""bfloat16 mixed-precision: storage in bf16, accumulation in f32.

Quality bar: a bf16 fit must converge to within a few percent of the f32
fit's energy on the same seeded problem — enough for production use at half
the HBM traffic.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF


def _V():
    return np.random.default_rng(0).random((4, 2, 24, 24))


@pytest.mark.parametrize('backend', ['jax_fft', 'jax_conv'])
def test_bf16_fit(backend):
    V = _V()
    np.random.seed(3)
    f32 = TransformInvariantNMF(n_atoms=4, atom_shape=(5, 5), backend=backend, dtype='float32')
    f32.fit(V, n_iterations=20, sparsity_H=0.1)

    np.random.seed(3)
    bf16 = TransformInvariantNMF(n_atoms=4, atom_shape=(5, 5), backend=backend, dtype='bfloat16')
    bf16.fit(V, n_iterations=20, sparsity_H=0.1)

    assert bf16._W.dtype == jnp.bfloat16
    e32, e16 = f32._energy_function(), bf16._energy_function()
    assert np.isfinite(e16)
    assert abs(e16 - e32) / e32 < 0.05, (e16, e32)
    # atoms stay normalized to bf16 resolution
    np.testing.assert_allclose(bf16.W.astype(np.float64).sum(axis=(-1, -2)), 1.0, atol=2e-2)


def test_bf16_minibatch_scan():
    V = _V()
    np.random.seed(3)
    nmf = TransformInvariantNMF(n_atoms=4, atom_shape=(5, 5), dtype='bfloat16')
    nmf.fit_minibatches(V, algorithm=MiniBatchAlgorithm.ASG_MU, batch_size=2, n_epochs=3)
    assert np.isfinite(nmf._energy_function())
    assert nmf._W.dtype == jnp.bfloat16
