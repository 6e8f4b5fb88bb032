"""``MiniBatchTransformInvariantNMF`` — the minibatch-first model class
(sklearn ``MiniBatchNMF`` analogue; the reference has the schedule as a
method, ``TransformInvariantNMF.py:350``, not a model configuration).

Pinned: fit equals the base class's ``fit_minibatches`` trajectory
exactly, the ctor schedule rides the sklearn estimator protocol
(clone / set_params), per-call overrides and streaming dispatch work,
and ``partial_fit`` / serving are inherited.
"""

import numpy as np
import pytest

from tnmf_tpu import (MiniBatchAlgorithm, MiniBatchTransformInvariantNMF,
                      TransformInvariantNMF)


def _V(n=8, seed=3):
    return np.random.default_rng(seed).random((n, 1, 12, 12))


def test_fit_matches_base_fit_minibatches():
    V = _V()
    a = MiniBatchTransformInvariantNMF(n_atoms=3, atom_shape=(4, 4),
                                       batch_size=4, n_epochs=3, seed=7)
    a.fit(V)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4), seed=7)
    b.fit_minibatches(V, algorithm=MiniBatchAlgorithm.ASG_MU, batch_size=4,
                      n_epochs=3)
    np.testing.assert_allclose(a.W, b.W, rtol=0, atol=0)
    np.testing.assert_allclose(a.H, b.H, rtol=0, atol=0)


def test_ctor_schedule_and_per_call_override():
    V = _V()
    m = MiniBatchTransformInvariantNMF(n_atoms=2, atom_shape=(3, 3),
                                       batch_size=2, n_epochs=2,
                                       algorithm='Cyclic_MU', seed=1)
    assert m.algorithm is MiniBatchAlgorithm.Cyclic_MU
    m.fit(V)
    base = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1)
    base.fit_minibatches(V, algorithm=MiniBatchAlgorithm.Cyclic_MU,
                         batch_size=2, n_epochs=2)
    np.testing.assert_allclose(m.W, base.W, rtol=0, atol=0)
    # per-call override wins
    m2 = MiniBatchTransformInvariantNMF(n_atoms=2, atom_shape=(3, 3),
                                        batch_size=2, n_epochs=2, seed=1)
    m2.fit(V, algorithm=MiniBatchAlgorithm.Cyclic_MU)
    np.testing.assert_allclose(m2.W, base.W, rtol=0, atol=0)


def test_sklearn_protocol_carries_the_schedule():
    sklearn = pytest.importorskip('sklearn')
    del sklearn
    from sklearn.base import clone
    m = MiniBatchTransformInvariantNMF(n_atoms=2, atom_shape=(3, 3),
                                       batch_size=4, n_epochs=5, seed=1)
    p = m.get_params()
    assert p['batch_size'] == 4 and p['n_epochs'] == 5
    c = clone(m)
    assert c.batch_size == 4 and c.n_epochs == 5
    c.set_params(batch_size=2)
    assert c.batch_size == 2 and c.get_params()['n_epochs'] == 5


def test_partial_fit_and_serving_inherited():
    V = _V(4)
    m = MiniBatchTransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1)
    m.partial_fit(V).partial_fit(V)
    assert m.n_steps_ == 2
    H = m.transform(_V(2, seed=9), n_iterations=5)
    assert H.shape[0] == 2 and np.isfinite(H).all()


def test_stream_dispatch():
    V = _V(6)
    m = MiniBatchTransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1,
                                       batch_size=2, n_epochs=2)
    m.fit(iter(V), subsample_size=3, max_subsamples=2)
    assert np.isfinite(m.W).all()
