"""Direct numerical parity against the reference library (when present).

These tests import the original emdgroup/tnmf package from /root/reference
and assert that seeded fits produce identical trajectories (W, H, R, partial
reconstructions and energies) — the strongest form of the reference's
cross-backend golden-value strategy.  Skipped when the reference checkout is
not available.
"""

import numpy as np
import pytest

from .conftest import REFERENCE_PATH, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason='reference library not available')


@pytest.fixture(scope='module')
def ref_tnmf():
    import sys
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import tnmf as ref
    return ref


@pytest.fixture(scope='module')
def V_2d():
    rng = np.random.default_rng(7)
    return rng.random((3, 2, 16, 14))


# 'reflect' included: the reference implements it in every backend
# (tnmf/backends/_NumPyBackend.py:38-48) and merely leaves its own
# cross-backend tests disabled (tnmf/tests/test_backends.py:21); both our
# strategies match its numpy_fft reflect trajectories to ~1e-16
@pytest.mark.parametrize('mode', ['valid', 'full', 'circular', 'reflect'])
@pytest.mark.parametrize('strategy', ['jax_fft', 'jax_conv'])
def test_fit_batch_parity(ref_tnmf, V_2d, mode, strategy):
    from tnmf.TransformInvariantNMF import TransformInvariantNMF as RefNMF
    from tnmf_tpu import TransformInvariantNMF

    kwargs = dict(n_iterations=5, sparsity_H=0.1, inhibition_strength=0.2,
                  cross_atom_inhibition_strength=0.1)
    np.random.seed(42)
    ref = RefNMF(n_atoms=4, atom_shape=(3, 4), backend='numpy_fft', reconstruction_mode=mode)
    ref.fit(V_2d, **kwargs)

    np.random.seed(42)
    ours = TransformInvariantNMF(n_atoms=4, atom_shape=(3, 4), backend=strategy,
                                 reconstruction_mode=mode)
    ours.fit(V_2d, **kwargs)

    np.testing.assert_allclose(ours.W, ref.W, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.H, ref.H, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.R, ref.R, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.R_partial(0), ref.R_partial(0), rtol=1e-7, atol=1e-9)
    assert np.isclose(ours._energy_function(), ref._energy_function())


@pytest.mark.parametrize('algorithm_value', [4, 5, 6, 7, 8])
def test_fit_minibatches_parity(ref_tnmf, algorithm_value):
    from tnmf.TransformInvariantNMF import MiniBatchAlgorithm as RefAlg
    from tnmf.TransformInvariantNMF import TransformInvariantNMF as RefNMF
    from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF

    rng = np.random.default_rng(3)
    V = rng.random((8, 2, 12, 12))

    np.random.seed(42)
    ref = RefNMF(n_atoms=3, atom_shape=(3, 3), backend='numpy_fft')
    ref.fit_minibatches(V, algorithm=RefAlg(algorithm_value), batch_size=3,
                        n_epochs=3, sag_lambda=0.8, sparsity_H=0.1)

    np.random.seed(42)
    ours = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), backend='jax_fft')
    ours.fit_minibatches(V, algorithm=MiniBatchAlgorithm(algorithm_value), batch_size=3,
                         n_epochs=3, sag_lambda=0.8, sparsity_H=0.1)

    np.testing.assert_allclose(ours.W, ref.W, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.H, ref.H, rtol=1e-7, atol=1e-9)
    assert np.isclose(ours._energy_function(), ref._energy_function())


def test_fit_stream_parity(ref_tnmf):
    from tnmf.TransformInvariantNMF import MiniBatchAlgorithm as RefAlg
    from tnmf.TransformInvariantNMF import TransformInvariantNMF as RefNMF
    from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF

    rng = np.random.default_rng(3)
    V = rng.random((8, 2, 12, 12))
    kw = dict(sparsity_H=0.1, subsample_size=4, batch_size=2, n_epochs=3, sag_lambda=0.8)

    np.random.seed(42)
    ref = RefNMF(n_atoms=3, atom_shape=(3, 3), backend='numpy_fft')
    ref.fit(V, algorithm=RefAlg.ASAG_MU, **kw)

    np.random.seed(42)
    ours = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), backend='jax_fft')
    ours.fit(V, algorithm=MiniBatchAlgorithm.ASAG_MU, **kw)

    np.testing.assert_allclose(ours.W, ref.W, rtol=1e-7, atol=1e-9)
    assert np.isclose(ours._energy_function(), ref._energy_function())


def test_callback_and_keep_W_parity(ref_tnmf):
    from tnmf.TransformInvariantNMF import TransformInvariantNMF as RefNMF
    from tnmf_tpu import TransformInvariantNMF

    rng = np.random.default_rng(3)
    V = rng.random((4, 2, 10, 10))

    def cb(nmf, it):
        return nmf._energy_function() > 12

    np.random.seed(42)
    ref = RefNMF(n_atoms=3, atom_shape=(3, 3), backend='numpy_fft')
    ref.fit(V, n_iterations=50, progress_callback=cb)
    ref.fit(V, n_iterations=3, keep_W=True, update_W=False)

    np.random.seed(42)
    ours = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), backend='jax_fft')
    ours.fit(V, n_iterations=50, progress_callback=cb)
    ours.fit(V, n_iterations=3, keep_W=True, update_W=False)

    np.testing.assert_allclose(ours.W, ref.W, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.H, ref.H, rtol=1e-7, atol=1e-9)


def test_1d_parity(ref_tnmf):
    from tnmf.TransformInvariantNMF import TransformInvariantNMF as RefNMF
    from tnmf_tpu import TransformInvariantNMF

    rng = np.random.default_rng(11)
    V = rng.random((3, 1, 40))

    for mode in ['valid', 'full', 'circular', 'reflect']:
        np.random.seed(42)
        ref = RefNMF(n_atoms=3, atom_shape=(5,), backend='numpy_fft',
                     reconstruction_mode=mode, inhibition_range=3)
        ref.fit(V, n_iterations=8, inhibition_strength=0.1)
        np.random.seed(42)
        ours = TransformInvariantNMF(n_atoms=3, atom_shape=(5,), backend='jax_fft',
                                     reconstruction_mode=mode, inhibition_range=3)
        ours.fit(V, n_iterations=8, inhibition_strength=0.1)
        np.testing.assert_allclose(ours.W, ref.W, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(ours.H, ref.H, rtol=1e-7, atol=1e-9)
