"""API-surface and input-validation tests for the model class."""

import numpy as np
import pytest

from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF


def _V(shape=(2, 1, 12, 12), seed=0):
    return np.random.default_rng(seed).random(shape)


def test_shapes_and_dtypes():
    V = _V()
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 5))
    nmf.fit(V, n_iterations=2)
    assert nmf.W.shape == (3, 1, 4, 5)
    assert nmf.H.shape == (2, 3, 15, 16)   # valid: S + A - 1
    assert nmf.R.shape == V.shape
    assert nmf.V.shape == V.shape
    assert nmf.R_partial(1).shape == V.shape


def test_unknown_backend_and_mode():
    with pytest.raises(KeyError):
        TransformInvariantNMF(n_atoms=2, atom_shape=(3,), backend='cuda')
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3,), reconstruction_mode='same')
    with pytest.raises(ValueError):
        nmf.fit(_V((2, 1, 10)), n_iterations=1)


def test_reference_backend_names_accepted():
    for name in ['numpy', 'numpy_fft', 'numpy_caching_fft', 'pytorch', 'pytorch_fft']:
        nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3,), backend=name)
        nmf.fit(_V((2, 1, 10)), n_iterations=1)
        assert nmf.W.shape == (2, 1, 3)


def test_set_dictionary_enables_serving_without_a_checkpoint():
    V = _V((2, 1, 12, 12)).astype(np.float32)
    teacher = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=1)
    teacher.fit(V, n_iterations=4)

    a = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=9)
    assert a.set_dictionary(teacher.W) is a  # chains
    np.testing.assert_allclose(a.W.sum(axis=(-2, -1)), 1.0, rtol=1e-6)
    Ha = a.transform(V, n_iterations=4)

    b = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=9)
    b.set_dictionary(teacher.W)
    Hb = b.transform(V, n_iterations=4)
    np.testing.assert_allclose(Ha, Hb, rtol=1e-7)  # deterministic serving
    np.testing.assert_allclose(a.W, teacher.W, rtol=1e-6)  # W stayed frozen

    with pytest.raises(ValueError, match='does not match'):
        a.set_dictionary(np.ones((2, 1, 3, 3)))
    with pytest.raises(ValueError, match='nonnegative'):
        a.set_dictionary(-np.ones((3, 1, 3, 3)))


def test_torch_tensor_input_accepted():
    """Drop-in for reference users holding torch data: V may be a (CPU)
    torch.Tensor anywhere an array is accepted (np.asarray interop)."""
    torch = pytest.importorskip('torch')
    V = _V((2, 1, 10, 10)).astype(np.float32)
    np.random.seed(0)
    a = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    a.fit(torch.from_numpy(V.copy()), n_iterations=3, sparsity_H=0.1)
    np.random.seed(0)
    b = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    b.fit(V, n_iterations=3, sparsity_H=0.1)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-6)
    # masks too
    np.random.seed(0)
    c = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    c.fit(torch.from_numpy(V.copy()), n_iterations=3, sparsity_H=0.1,
          mask=torch.ones(V.shape))
    np.testing.assert_allclose(c.W, b.W, rtol=1e-6)


def test_negative_input_rejected():
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3,))
    with pytest.raises(ValueError, match='non-negative'):
        nmf.fit(-_V((2, 1, 10)), n_iterations=1)


def test_update_flags():
    V = _V()
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=2)
    W0, H0 = nmf.W, nmf.H
    nmf.fit(V, n_iterations=2, keep_W=True, update_W=False)
    np.testing.assert_array_equal(nmf.W, W0)
    assert not np.allclose(nmf.H, H0)
    with pytest.raises(ValueError, match='update_H'):
        nmf.fit(V, update_H=False, update_W=False)


def test_callback_abort():
    V = _V()
    calls = []

    def cb(model, iteration):
        calls.append(iteration)
        return iteration < 2

    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=100, progress_callback=cb)
    assert calls == [0, 1, 2]


def test_energy_decreases_plain_mu():
    V = _V()
    energies = []

    def cb(model, iteration):
        energies.append(model._energy_function())
        return True

    np.random.seed(1)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    nmf.fit(V, n_iterations=10, progress_callback=cb)
    assert all(b <= a + 1e-9 for a, b in zip(energies, energies[1:]))


def test_fit_dispatch():
    V = _V((6, 1, 10, 10))
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=1)                                  # -> fit_batch
    nmf.fit(V, batch_size=2, n_epochs=1)                        # -> fit_minibatches
    nmf.fit(V, algorithm=MiniBatchAlgorithm.GSG_MU, n_epochs=1)  # -> fit_minibatches
    nmf.fit(V, subsample_size=3, batch_size=2, n_epochs=1)      # -> fit_stream
    assert nmf.W.shape == (2, 1, 3, 3)


def test_seeded_generator_mode():
    V = _V()
    a = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=11)
    a.fit(V, n_iterations=2)
    b = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=11)
    b.fit(V, n_iterations=2)
    np.testing.assert_array_equal(a.W, b.W)
    c = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=12)
    c.fit(V, n_iterations=2)
    assert not np.allclose(a.W, c.W)


def test_float32_dtype():
    V = _V()
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), dtype='float32')
    nmf.fit(V, n_iterations=3)
    assert nmf.W.dtype == np.float32
    assert np.isfinite(nmf._energy_function())


def test_precision_option():
    V = _V()
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), precision='highest')
    nmf.fit(V, n_iterations=2)
    assert np.isfinite(nmf._energy_function())
    with pytest.raises(ValueError, match='precision'):
        bad = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), precision='float16')
        bad.fit(V, n_iterations=1)


def test_fft_policy_pow2():
    V = _V()
    np.random.seed(0)
    a = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), backend='jax_fft')
    a.fit(V, n_iterations=3)
    np.random.seed(0)
    b = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), backend='jax_fft',
                              fft_policy='pow2')
    b.fit(V, n_iterations=3)
    # the padded FFT length must not change the math
    np.testing.assert_allclose(a.W, b.W, rtol=1e-10, atol=1e-12)


def test_transform_frozen_dictionary():
    """transform() encodes new data against the learned atoms without
    touching W (the serving path)."""
    V = _V((4, 1, 12, 12))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 5))
    nmf.fit(V, n_iterations=5)
    W0 = nmf.W.copy()

    V_new = _V((2, 1, 12, 12), seed=7)
    np.random.seed(1)
    H = nmf.transform(V_new, n_iterations=20, sparsity_H=0.05)
    np.testing.assert_allclose(nmf.W, W0, rtol=0, atol=0)  # frozen
    assert H.shape == (2, 3, 15, 16)
    # the encoding must actually approximate the new data
    err = np.square(V_new - nmf.R).sum() / np.square(V_new).sum()
    assert err < 0.1

    # inverse_transform: default = own R; explicit H round-trips through
    # the reconstruction operator
    np.testing.assert_allclose(nmf.inverse_transform(), nmf.R, rtol=1e-12)
    np.testing.assert_allclose(nmf.inverse_transform(H), nmf.R, rtol=1e-8, atol=1e-12)


def test_transform_chunked_matches_manual_chunks():
    """transform(batch_size=k) (out-of-core serving) is exactly the loop of
    per-chunk transform calls: same RNG consumption, same H."""
    V = _V((4, 1, 12, 12))
    V_new = _V((5, 1, 12, 12), seed=7)  # ragged final chunk (5 = 2+2+1)

    def fitted(seed):
        m = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 5), seed=seed)
        m.fit(V, n_iterations=5)
        return m

    a = fitted(3)
    H_chunked = a.transform(V_new, n_iterations=10, batch_size=2)
    b = fitted(3)
    H_manual = np.concatenate(
        [b.transform(V_new[i:i + 2], n_iterations=10) for i in (0, 2, 4)])
    np.testing.assert_allclose(H_chunked, H_manual, rtol=0, atol=0)
    assert H_chunked.shape[0] == 5
    # a sample-spanning mask is sliced along with the chunks
    mask = (np.arange(V_new.size).reshape(V_new.shape) % 3 != 0).astype(float)
    c = fitted(3)
    H_masked = c.transform(V_new, n_iterations=10, batch_size=2, mask=mask)
    d = fitted(3)
    H_masked_manual = np.concatenate(
        [d.transform(V_new[i:i + 2], n_iterations=10, mask=mask[i:i + 2])
         for i in (0, 2, 4)])
    np.testing.assert_allclose(H_masked, H_masked_manual, rtol=0, atol=0)
    assert not np.allclose(H_masked, H_chunked)


def test_transform_requires_fit():
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 5))
    with pytest.raises(RuntimeError, match='transform'):
        nmf.transform(_V())
    with pytest.raises(RuntimeError, match='inverse_transform'):
        nmf.inverse_transform(np.zeros((1, 3, 15, 16)))


def test_fit_transform():
    """sklearn convention: fit_transform(V) == fit(V); return H — and it
    dispatches through the kwarg front door (minibatch kwargs included)."""
    V = _V()
    np.random.seed(42)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3))
    H = a.fit_transform(V, n_iterations=5, sparsity_H=0.1)
    np.random.seed(42)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3))
    b.fit(V, n_iterations=5, sparsity_H=0.1)
    np.testing.assert_array_equal(H, b.H)
