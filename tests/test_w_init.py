"""Data-dependent dictionary initialization (``w_init=``).

The reference only has uniform-random init (``_Backend.py:83-98``).
Pinned here: 'patches' atoms really are normalized data windows and cut
the iterations-to-tolerance, 'nndsvd' matches sklearn's
``_initialize_nmf(init='nndsvda')`` recipe exactly and beats random init
at equal iteration count on the plain-NMF geometry, plus the guard
rails (device init, transform groups, non-degenerate geometry, atom
count limits).
"""

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF
from tnmf_tpu.utils.initialization import nndsvda_init, patches_init


def _V(shape=(6, 2, 20, 20), seed=0):
    return np.random.default_rng(seed).random(shape)


def test_patches_atoms_are_data_windows():
    V = _V()
    rng = np.random.default_rng(3)
    W = patches_init(V, n_atoms=4, atom_shape=(5, 5), rng=rng)
    assert W.shape == (4, 2, 5, 5) and (W > 0).all()
    # every atom must be SOME data window plus the documented constant floor
    for m in range(4):
        found = False
        for i in range(V.shape[0]):
            for y in range(16):
                for x in range(16):
                    d = W[m] - V[i, :, y:y + 5, x:x + 5]
                    if np.allclose(d, d.flat[0], atol=1e-12) and d.flat[0] > 0:
                        found = True
                        break
                if found:
                    break
            if found:
                break
        assert found, f'atom {m} is not a data window'


def test_patches_model_fit_deterministic_and_faster():
    # structured data: samples built from two ground-truth pulses
    from tnmf_tpu.utils.signals import generate_pulse_train
    np.random.seed(7)
    V = np.stack([generate_pulse_train(pulse_length=16, n_pulses=4)[0]
                  for _ in range(6)])

    def final_energy(w_init):
        m = TransformInvariantNMF(n_atoms=3, atom_shape=(16,), seed=1,
                                  w_init=w_init)
        m.fit(V, n_iterations=30)
        return m._energy_function()

    e_patches = final_energy('patches')
    e_random = final_energy('random')
    assert e_patches < e_random  # warm start converges faster
    # deterministic given the seed
    m1 = TransformInvariantNMF(n_atoms=3, atom_shape=(16,), seed=1,
                               w_init='patches')
    m1.fit(V, n_iterations=3)
    m2 = TransformInvariantNMF(n_atoms=3, atom_shape=(16,), seed=1,
                               w_init='patches')
    m2.fit(V, n_iterations=3)
    np.testing.assert_allclose(m1.W, m2.W, rtol=0, atol=0)


def test_nndsvda_matches_sklearn():
    """Same recipe, exact SVD instead of sklearn's randomized sketch: the
    well-determined leading triplet matches tightly; the full init matches
    sklearn's reconstruction quality and positivity."""
    sklearn = pytest.importorskip('sklearn')
    del sklearn
    from sklearn.decomposition._nmf import _initialize_nmf
    X = np.abs(np.random.default_rng(5).standard_normal((24, 40))) + 0.01
    A, B = nndsvda_init(X, 6)
    W_sk, H_sk = _initialize_nmf(X, 6, init='nndsvda', random_state=0)
    np.testing.assert_allclose(A[:, 0], W_sk[:, 0], rtol=1e-6)
    np.testing.assert_allclose(B[0], H_sk[0], rtol=1e-6)
    assert (A > 0).all() and (B > 0).all()
    err = np.linalg.norm(X - A @ B)
    err_sk = np.linalg.norm(X - W_sk @ H_sk)
    assert err <= err_sk * 1.02  # exact SVD can only be as good or better


def test_nndsvd_model_beats_random_at_equal_iterations():
    rng = np.random.default_rng(2)
    # low-rank-ish data so the SVD start has real signal
    truth_A = rng.random((32, 4))
    truth_B = rng.random((4, 48))
    V = (truth_A @ truth_B)[:, np.newaxis, :]

    def final_energy(w_init):
        m = TransformInvariantNMF(n_atoms=4, atom_shape=(48,), seed=1,
                                  reconstruction_mode='full', w_init=w_init)
        m.fit(V, n_iterations=30)
        assert m._strategy == 'dot'
        return m._energy_function()

    assert final_energy('nndsvd') < final_energy('random')


def test_nndsvd_initial_product_preserved_under_normalization():
    # W is sum-normalized per atom; H absorbs the scales so the initial
    # reconstruction equals the raw NNDSVDA product
    rng = np.random.default_rng(4)
    V = rng.random((10, 1, 12))
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(12,), seed=1,
                              reconstruction_mode='full', w_init='nndsvd')
    m.fit(V, n_iterations=0, update_W=False)
    A, B = nndsvda_init(np.asarray(V, np.float64).reshape(10, 12), 3)
    np.testing.assert_allclose(
        m.H.reshape(10, 3) @ m.W.reshape(3, 12), A @ B, rtol=1e-5)


def test_w_init_guard_rails():
    with pytest.raises(ValueError, match='w_init must be'):
        TransformInvariantNMF(n_atoms=2, atom_shape=(3,), w_init='svd')
    with pytest.raises(ValueError, match="requires init='host'"):
        TransformInvariantNMF(n_atoms=2, atom_shape=(3,), w_init='patches',
                              init='device')
    with pytest.raises(ValueError, match='transform groups'):
        TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), w_init='nndsvd',
                              transform_type='shift+flip')
    # nndsvd on a non-degenerate geometry
    m = TransformInvariantNMF(n_atoms=2, atom_shape=(3,), w_init='nndsvd')
    with pytest.raises(ValueError, match='plain-NMF geometry'):
        m.fit(_V((4, 1, 10)), n_iterations=1)
    # too many atoms for the SVD rank
    m = TransformInvariantNMF(n_atoms=20, atom_shape=(8,), w_init='nndsvd',
                              reconstruction_mode='full')
    with pytest.raises(ValueError, match='n_atoms'):
        m.fit(_V((4, 1, 8)), n_iterations=1)
    # patches: atoms must fit inside samples
    m = TransformInvariantNMF(n_atoms=2, atom_shape=(12,), w_init='patches',
                              reconstruction_mode='valid')
    with pytest.raises(ValueError, match='fit inside'):
        m.fit(_V((4, 1, 10)), n_iterations=1)


def test_multiscale_patches_init():
    from tnmf_tpu import MultiScaleTNMF
    from tnmf_tpu.utils.signals import generate_pulse_train
    np.random.seed(11)
    V = np.stack([generate_pulse_train(pulse_length=12, n_pulses=4)[0]
                  for _ in range(5)])

    def final_energy(w_init):
        m = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((4,), (12,)), seed=1,
                           w_init=w_init)
        m.fit(V, n_iterations=25)
        return m._energy_function()

    assert final_energy('patches') < final_energy('random')
    with pytest.raises(ValueError, match='plain-NMF geometry'):
        MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),), w_init='nndsvd')


def test_keep_w_overrides_w_init():
    V = _V((4, 1, 12, 12))
    m = TransformInvariantNMF(n_atoms=2, atom_shape=(4, 4), seed=1,
                              w_init='patches')
    m.fit(V, n_iterations=2)
    W0 = m.W.copy()
    m.fit(V, n_iterations=0, keep_W=True)  # re-init H only
    np.testing.assert_allclose(m.W, W0, rtol=0, atol=0)
