"""Tests for the fit extensions beyond the reference API:
callback_interval (chunked callbacks) and record_energies (on-device
energy traces)."""

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF


def _V():
    return np.random.default_rng(0).random((3, 2, 14, 14))


def test_record_energies_matches_callback_trace():
    V = _V()
    np.random.seed(1)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    a.fit(V, n_iterations=6, sparsity_H=0.1, record_energies=True)
    assert a.energies_.shape == (6,)

    trace = []
    np.random.seed(1)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    b.fit(V, n_iterations=6, sparsity_H=0.1,
          progress_callback=lambda nmf, it: trace.append(nmf._energy_function()) or True)
    np.testing.assert_allclose(a.energies_, trace, rtol=1e-10)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-12)


def test_record_energies_monotone_plain_mu():
    np.random.seed(2)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    nmf.fit(_V(), n_iterations=10, record_energies=True)
    e = nmf.energies_
    assert np.all(np.diff(e) <= 1e-9)


def test_callback_interval_chunks():
    V = _V()
    seen = []

    np.random.seed(1)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    a.fit(V, n_iterations=10, progress_callback=lambda nmf, it: seen.append(it) or True,
          callback_interval=4)
    assert seen == [3, 7, 9]

    # trajectory identical to the unchunked fit
    np.random.seed(1)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    b.fit(V, n_iterations=10)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-12)
    np.testing.assert_allclose(a.H, b.H, rtol=1e-12)


def test_callback_interval_abort():
    calls = []

    def cb(nmf, it):
        calls.append(it)
        return len(calls) < 2

    np.random.seed(1)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    nmf.fit(_V(), n_iterations=100, progress_callback=cb, callback_interval=5)
    assert calls == [4, 9]


def test_record_energies_with_callback():
    """record_energies must be honored alongside a progress callback (it
    used to be silently dropped) and match the fused no-callback trace."""
    V = _V()
    np.random.seed(1)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    a.fit(V, n_iterations=6, sparsity_H=0.1, record_energies=True)

    np.random.seed(1)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    b.fit(V, n_iterations=6, sparsity_H=0.1, record_energies=True,
          progress_callback=lambda nmf, it: True)
    np.testing.assert_allclose(b.energies_, a.energies_, rtol=1e-10)

    # chunked-callback path records the full per-iteration trace too
    np.random.seed(1)
    c = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    c.fit(V, n_iterations=6, sparsity_H=0.1, record_energies=True,
          progress_callback=lambda nmf, it: True, callback_interval=4)
    np.testing.assert_allclose(c.energies_, a.energies_, rtol=1e-10)


def test_record_energies_beyond_chunk():
    """n_iterations above engine.ENERGY_CHUNK exercises the multi-chunk
    driver; the trace must be exact per-iteration and the trajectory
    identical to the plain fit."""
    from tnmf_tpu import engine
    V = _V()
    n = engine.ENERGY_CHUNK + 5
    np.random.seed(3)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    a.fit(V, n_iterations=n, record_energies=True)
    assert a.energies_.shape == (n,)
    assert np.all(np.isfinite(a.energies_))

    np.random.seed(3)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    b.fit(V, n_iterations=n)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-12)
    np.testing.assert_allclose(np.float64(a.energies_[-1]), b._energy_function(), rtol=1e-10)


def test_minibatch_record_energies():
    from tnmf_tpu import MiniBatchAlgorithm
    V = np.random.default_rng(0).random((6, 1, 10, 10))
    np.random.seed(1)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, algorithm=MiniBatchAlgorithm.ASG_MU, batch_size=2, n_epochs=4,
            record_energies=True)
    assert len(nmf.energies_) == 4
    assert nmf.energies_[-1] <= nmf.energies_[0]
    assert np.isclose(nmf.energies_[-1], nmf._energy_function())


def test_minibatch_scan_energy_trace_matches_python_loop():
    """record_energies now runs inside the on-device minibatch scan; its
    per-epoch trace must equal the Python loop's (forced via callback)."""
    from tnmf_tpu import MiniBatchAlgorithm
    V = np.random.default_rng(0).random((7, 1, 10, 10))  # ragged: 7 = 2*3+1
    for alg in (MiniBatchAlgorithm.ASG_MU, MiniBatchAlgorithm.GSAG_MU):
        np.random.seed(1)
        scan = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
        scan.fit(V, algorithm=alg, batch_size=3, n_epochs=3,
                 record_energies=True)
        np.random.seed(1)
        pyloop = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
        pyloop.fit(V, algorithm=alg, batch_size=3, n_epochs=3,
                   record_energies=True,
                   progress_callback=lambda m, e: True)
        np.testing.assert_allclose(np.asarray(scan.energies_, np.float64),
                                   np.asarray(pyloop.energies_, np.float64),
                                   rtol=1e-9)
        np.testing.assert_allclose(scan.W, pyloop.W, rtol=1e-9, atol=1e-11)


def test_tol_early_stopping():
    """sklearn-style tol: the adaptive on-device while_loop stops once the
    relative energy improvement per check interval drops below tol."""
    V = np.random.default_rng(3).random((3, 1, 16, 16)).astype(np.float32)
    np.random.seed(42)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(5, 5))
    nmf.fit(V, n_iterations=500, sparsity_H=0.1, tol=1e-3, tol_check_every=10)
    assert nmf.n_iterations_ is not None
    assert 10 <= nmf.n_iterations_ < 500
    assert nmf.n_iterations_ % 10 == 0
    assert np.isfinite(nmf._energy_function())


def test_tol_loop_matches_plain_fit_when_not_triggered():
    """With tol=0 the adaptive loop must run exactly n_iterations and
    reproduce the plain fused loop bitwise."""
    V = np.random.default_rng(3).random((3, 1, 14, 12)).astype(np.float32)
    np.random.seed(42)
    plain = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 5))
    plain.fit(V, n_iterations=7, sparsity_H=0.1)
    np.random.seed(42)
    adap = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 5))
    adap.fit(V, n_iterations=7, sparsity_H=0.1, tol=0.0, tol_check_every=3)
    assert adap.n_iterations_ == 7
    np.testing.assert_array_equal(np.asarray(adap._W), np.asarray(plain._W))
    np.testing.assert_array_equal(np.asarray(adap._H), np.asarray(plain._H))


def test_tol_rejects_callbacks():
    V = np.random.default_rng(3).random((2, 1, 8, 8)).astype(np.float32)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    with pytest.raises(ValueError, match='tol-based'):
        nmf.fit(V, n_iterations=5, tol=1e-3,
                progress_callback=lambda m, i: True)


def test_n_iterations_set_on_all_fit_paths():
    """sklearn n_iter_ semantics: n_iterations_ reflects the actual count on
    the fused, chunked-callback, and per-iteration callback paths too."""
    V = np.random.default_rng(3).random((2, 1, 10, 10)).astype(np.float32)

    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=4)
    assert nmf.n_iterations_ == 4

    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=9, progress_callback=lambda m, i: i < 5)
    assert nmf.n_iterations_ == 6  # aborted after iteration index 5

    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=9, callback_interval=4,
            progress_callback=lambda m, i: i < 4)
    assert nmf.n_iterations_ == 8  # two chunks of 4, aborted at done-1 == 7


def test_tol_rejects_periodic_checkpointing(tmp_path):
    V = np.random.default_rng(3).random((2, 1, 8, 8)).astype(np.float32)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    with pytest.raises(ValueError, match='checkpoint_every'):
        nmf.fit(V, n_iterations=5, tol=1e-3,
                checkpoint_every=2, checkpoint_path=str(tmp_path / 'c.npz'))


def test_record_energies_composes_with_tol():
    """record_energies + tol (previously rejected): the trace is
    accumulated inside the same on-device while_loop, trimmed to the
    iterations actually run, and the early-stopped trajectory is a
    prefix of the fixed-count recording run's."""
    V = _V()
    np.random.seed(3)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    a.fit(V, n_iterations=200, tol=1e-3, tol_check_every=5,
          record_energies=True)
    assert a.n_iterations_ < 200  # actually early-stopped
    assert a.energies_.shape == (a.n_iterations_,)
    assert np.isfinite(a.energies_).all()
    np.testing.assert_allclose(a.energies_[-1],
                               float(a._energy_function()), rtol=1e-10)

    # identical trajectory + identical trace prefix vs the plain
    # (no-tol) on-device recording loop run for the same count
    np.random.seed(3)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    b.fit(V, n_iterations=a.n_iterations_, record_energies=True)
    np.testing.assert_allclose(a.energies_, b.energies_, rtol=1e-10)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-12)
    np.testing.assert_allclose(a.H, b.H, rtol=1e-12)


def test_record_energies_composes_with_extrapolate():
    """record_energies + extrapolate (previously rejected): the
    accepted-iterate energy trace comes out of the accelerated
    while_loop without perturbing its trajectory."""
    V = _V()
    np.random.seed(4)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    a.fit(V, n_iterations=40, tol=None, extrapolate=True,
          record_energies=True)
    assert a.energies_.shape == (40,)
    assert np.isfinite(a.energies_).all()
    np.testing.assert_allclose(a.energies_[-1],
                               float(a._energy_function()), rtol=1e-10)
    # the overall trend is downward even if single safeguard blocks are
    # not (extrapolation may overshoot between restarts)
    assert a.energies_[-1] < a.energies_[0]

    # recording is read-only: same trajectory as the non-recording loop
    np.random.seed(4)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    b.fit(V, n_iterations=40, tol=None, extrapolate=True)
    np.testing.assert_allclose(a.W, b.W, rtol=1e-12)
    np.testing.assert_allclose(a.H, b.H, rtol=1e-12)
    assert b.energies_ is None


def test_record_energies_extrapolate_tol_trims_trace():
    """All three together: early stop + acceleration + on-device trace."""
    V = _V()
    np.random.seed(5)
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    m.fit(V, n_iterations=2000, tol=1e-4, tol_check_every=10,
          extrapolate=True, record_energies=True)
    assert m.n_iterations_ < 2000
    assert m.energies_.shape == (m.n_iterations_,)
    assert np.isfinite(m.energies_).all()
    np.testing.assert_allclose(m.energies_[-1],
                               float(m._energy_function()), rtol=1e-10)
