"""sklearn estimator-protocol compatibility (get_params / set_params).

The reference model predates the sklearn protocol; here the constructor
kwargs map 1:1 onto ``get_params`` so the model composes with
``sklearn.base.clone``, ``Pipeline`` and the CV search tools.
"""

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF

sklearn = pytest.importorskip('sklearn')
from sklearn.base import clone  # noqa: E402
from sklearn.pipeline import Pipeline  # noqa: E402


def _make_V():
    rng = np.random.default_rng(1)
    return rng.random((3, 1, 16, 16)).astype(np.float32)


def test_get_params_roundtrip():
    nmf = TransformInvariantNMF(n_atoms=4, atom_shape=(3, 3), seed=7,
                                reconstruction_mode='circular',
                                beta_loss='kullback-leibler')
    p = nmf.get_params()
    assert p['n_atoms'] == 4
    assert p['atom_shape'] == (3, 3)
    assert p['seed'] == 7
    assert p['reconstruction_mode'] == 'circular'
    assert p['beta_loss'] == 'kullback-leibler'
    # a fresh model from the params is the same configuration
    again = TransformInvariantNMF(**p)
    assert again.get_params() == p


def test_clone_produces_equivalent_independent_model():
    V = _make_V()
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=11)
    b = clone(a)
    assert b is not a and b.get_params() == a.get_params()
    a.fit(V, n_iterations=4)
    b.fit(V, n_iterations=4)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-6)
    # fitting one does not touch the other's state
    c = clone(a)
    assert c._W is None


def test_set_params_reconfigures_and_validates():
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=0)
    nmf2 = nmf.set_params(n_atoms=5)
    assert nmf2 is nmf and nmf.n_atoms == 5
    assert nmf.get_params()['n_atoms'] == 5
    with pytest.raises(ValueError, match='invalid parameter'):
        nmf.set_params(not_a_param=1)
    # set_params resets fitted state (sklearn: configure before fit)
    V = _make_V()
    nmf.fit(V, n_iterations=2)
    nmf.set_params(n_atoms=2)
    assert nmf._W is None


def test_pipeline_fit_transform_matches_direct():
    V = _make_V()
    direct = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=5)
    H_direct = direct.fit_transform(V, n_iterations=3)

    pipe = Pipeline([('tnmf', TransformInvariantNMF(
        n_atoms=3, atom_shape=(3, 3), seed=5))])
    H_pipe = pipe.fit_transform(V, tnmf__n_iterations=3)
    np.testing.assert_allclose(H_pipe, H_direct, rtol=1e-6)
    # downstream-style transform of new data through the fitted pipeline
    H_new = pipe.transform(V)
    assert H_new.shape == H_direct.shape


def test_multiscale_estimator_protocol():
    from tnmf_tpu import MultiScaleTNMF
    V = _make_V()
    ms = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3, 3), (5, 5)), seed=4)
    twin = clone(ms)
    assert twin.get_params() == ms.get_params()
    ms.fit(V, n_iterations=3, sparsity_H=0.1)
    twin.fit(V, n_iterations=3, sparsity_H=0.1)
    for a, b in zip(ms.W, twin.W):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    ms.set_params(n_atoms=(3, 1))
    assert ms._Ws is None and ms.n_atoms == (3, 1)
    with pytest.raises(ValueError, match='invalid parameter'):
        ms.set_params(bogus=1)


def test_grid_search_over_constructor_params():
    from sklearn.model_selection import GridSearchCV, KFold
    V = _make_V()

    def scorer(est, X, y=None):
        del y
        est.transform(X, n_iterations=3)  # encode the held-out fold
        return -float(est._energy_function())

    gs = GridSearchCV(
        TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=3),
        {'n_atoms': [2, 4]}, scoring=scorer,
        cv=KFold(n_splits=3), refit=True)
    gs.fit(V, n_iterations=3)
    assert gs.best_params_['n_atoms'] in (2, 4)
    assert hasattr(gs.best_estimator_, 'W')


def test_reconstruction_err_matches_sklearn_definition():
    """``reconstruction_err_`` is sklearn's ``_beta_divergence(...,
    square_root=True)`` of the fitted data vs its reconstruction, for every
    beta; ``n_iter_`` aliases ``n_iterations_``."""
    from sklearn.decomposition._nmf import _beta_divergence
    V = _make_V()
    for beta in (2.0, 1.0):
        m = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=0,
                                  beta_loss=beta)
        m.fit(V, n_iterations=4)
        X = V.reshape(V.shape[0], -1)
        R = m.R.reshape(V.shape[0], -1)
        # identity factorization of the same residual: W = X-sized
        # reconstruction, H = identity -> the divergence of (X, R)
        want = _beta_divergence(X, R, np.eye(R.shape[1]), beta,
                                square_root=True)
        np.testing.assert_allclose(m.reconstruction_err_, want, rtol=1e-6)
        assert m.n_iter_ == m.n_iterations_ == 4

    fresh = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    with pytest.raises(RuntimeError, match='fitted'):
        fresh.reconstruction_err_
