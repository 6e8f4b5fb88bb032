"""Pins for seldom-hit single-process branches of the model driver:
whole-batch minibatch slices, shuffled-accessor de-shuffling, epoch
callback abort, verbose energy logging, and jax-array inputs.  (The
remaining untraced lines are multi-host paths exercised by the
two-process subprocess tests in test_distributed.py.)
"""

import logging

import jax.numpy as jnp
import numpy as np

from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF


def _V(shape=(4, 1, 10, 10), seed=3):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


def test_minibatch_whole_batch_slice():
    """``batch_size=None`` yields the whole-batch sentinel slice; each
    'batch' update then writes H back without slicing (reference
    ``sliceNone``, ``_Backend.py:10``)."""
    V = _V()
    np.random.seed(0)
    mb = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    mb.fit_minibatches(V, algorithm=MiniBatchAlgorithm.Cyclic_MU,
                       batch_size=None, n_epochs=5)
    np.random.seed(0)
    fb = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    fb.fit_batch(V, n_iterations=5)
    # Cyclic_MU over one whole-batch slice IS full-batch MU (the identity
    # the reference pins at test_minibatch.py:19-20); the paths compile
    # separately, so equality is up to f32 roundoff
    np.testing.assert_allclose(mb.W, fb.W, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(mb.H, fb.H, rtol=2e-5, atol=1e-7)


def test_shuffled_accessors_deshuffle():
    """When the input is shuffled at init (the reference does this for its
    stochastic algorithms, ``TransformInvariantNMF.py:194-202``), the
    V/H properties must hand back the caller's order.  The batch drivers
    shuffle the *visit order* instead (an equivalent trajectory without
    data movement), so the de-shuffling accessors are driven directly."""
    V = _V(shape=(6, 1, 10, 10))
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=8)
    nmf._initialize_matrices(V, keep_W=False, shuffle_input=True)
    assert nmf._shuffle_idx is not None
    assert not np.allclose(nmf._V, V)  # internal order really is shuffled
    np.testing.assert_allclose(nmf.V, V, rtol=1e-7)  # de-shuffled view
    H = nmf.H  # the de-shuffled H accessor pairs rows with nmf.V rows
    assert H.shape[0] == V.shape[0]


def test_minibatch_callback_abort_stops_epochs():
    V = _V()
    calls = []

    def cb(nmf, epoch):
        calls.append(epoch)
        return epoch < 1  # abort after the second epoch

    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=0)
    nmf.fit_minibatches(V, algorithm=MiniBatchAlgorithm.ASG_MU,
                        batch_size=2, n_epochs=50, progress_callback=cb)
    assert calls == [0, 1]


def test_verbose_energy_logging_paths(caplog):
    V = _V()
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=0,
                                verbose=2)
    with caplog.at_level(logging.INFO, logger='TransformInvariantNMF'):
        nmf.fit_batch(V, n_iterations=3, record_energies=True)
    msgs = [r.message for r in caplog.records if 'Energy' in r.message]
    assert len(msgs) >= 3  # one INFO line per recorded iteration


def test_jax_array_input_accepted():
    V = jnp.asarray(_V())
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=0)
    nmf.fit_batch(V, n_iterations=2)
    assert np.isfinite(nmf._energy_function())
    # beta <= 0 strict-positivity precondition on a device array
    nmf_is = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=0,
                                   beta_loss=0.0)
    nmf_is.fit_batch(V + 0.1, n_iterations=2)
    assert np.isfinite(nmf_is._energy_function())


def test_multiscale_tags_and_nonvalid_load_restore(tmp_path):
    from tnmf_tpu import MultiScaleTNMF
    ms = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3, 3),), seed=2,
                        reconstruction_mode='circular')
    tags = ms.__sklearn_tags__()
    assert tags.estimator_type == 'transformer'
    V = _V(shape=(2, 1, 8, 8))
    ms.fit(V, n_iterations=3)
    p = str(tmp_path / 'ms_circ')
    ms.save(p, include_H=True)
    m2 = MultiScaleTNMF.load(p + '.npz')
    # circular mode: transform_shape == sample_shape; plans restore from it
    np.testing.assert_allclose(np.asarray(m2.R), np.asarray(ms.R),
                               rtol=1e-6)
