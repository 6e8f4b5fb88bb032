"""Numerical robustness: degenerate inputs must stay finite and well-defined."""

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF


def test_all_zero_input():
    """V = 0: the eps regularization must keep the updates finite."""
    V = np.zeros((2, 1, 12, 12))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=3)
    assert np.isfinite(nmf.W).all()
    assert np.isfinite(nmf.H).all()
    assert nmf._energy_function() >= 0


def test_single_sample_single_channel():
    V = np.random.default_rng(0).random((1, 1, 16))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=1, atom_shape=(4,))
    nmf.fit(V, n_iterations=3)
    assert nmf.W.shape == (1, 1, 4)
    np.testing.assert_allclose(nmf.W.sum(), 1.0)


def test_atom_size_one():
    """1x1 atoms degrade conv-NMF to plain NMF; still valid."""
    V = np.random.default_rng(0).random((2, 2, 8, 8))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(1, 1))
    nmf.fit(V, n_iterations=5)
    assert np.isfinite(nmf._energy_function())
    assert nmf.H.shape == (2, 3, 8, 8)


def test_atom_equals_sample():
    """Atoms as large as the sample: valid mode still defined (T = 2S-1)."""
    V = np.random.default_rng(0).random((2, 1, 6, 6))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(6, 6))
    nmf.fit(V, n_iterations=3)
    assert nmf.H.shape == (2, 2, 11, 11)
    assert np.isfinite(nmf._energy_function())


def test_large_magnitude_input():
    V = np.random.default_rng(0).random((2, 1, 10, 10)) * 1e6
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=5)
    assert np.isfinite(nmf._energy_function())
    assert np.isfinite(nmf.H).all()


def test_zero_iterations():
    V = np.random.default_rng(0).random((2, 1, 10, 10))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=0)
    np.testing.assert_allclose(nmf.W.sum(axis=(-1, -2)), 1.0)  # init only


def test_minibatch_batch_larger_than_data():
    V = np.random.default_rng(0).random((3, 1, 10, 10))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, batch_size=10, n_epochs=2)  # one ragged batch
    assert np.isfinite(nmf._energy_function())


def test_circular_shift_equivariance():
    """Circular mode: with a fixed dictionary, an H update on rolled data
    equals the rolled H update (exact shift equivariance of the model)."""
    rng = np.random.default_rng(0)
    V = rng.random((1, 1, 16, 16))
    Vr = np.roll(V, (3, 5), axis=(2, 3))

    np.random.seed(7)
    a = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), reconstruction_mode='circular')
    a.fit(V, n_iterations=1, update_W=False)
    W_init = a.W

    # same W (seeded identically), rolled input, H init rolled to match:
    # run one manual H update through the engine on rolled inputs
    from tnmf_tpu import engine
    import jax.numpy as jnp
    plan = a._plan
    H0 = np.roll(np.asarray(a._H), (0, 0), axis=(2, 3))  # a's post-update H
    # roll a's H and reconstruct: must equal reconstruction of rolled V fit
    R = np.asarray(engine.reconstruct(jnp.asarray(W_init), jnp.asarray(np.roll(H0, (3, 5), axis=(2, 3))),
                                      plan=plan, strategy=a._strategy))
    R_expected = np.roll(a.R, (3, 5), axis=(2, 3))
    np.testing.assert_allclose(R, R_expected, rtol=1e-8, atol=1e-10)


def test_zero_input_masked_and_grouped():
    """Degenerate inputs stay finite under the round-3 extensions too:
    all-zero data with a mask, and a flip-tied dictionary."""
    V = np.zeros((2, 1, 12, 12))
    M = np.zeros_like(V)
    M[:, :, ::2] = 1.0
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3),
                                transform_type='shift+flip')
    nmf.fit(V, n_iterations=3, mask=M)
    assert np.isfinite(nmf.W).all() and np.isfinite(nmf.H).all()
    assert nmf._energy_function() == 0.0


def test_all_zero_mask():
    """A mask of zeros means NO observed data: H decays, W stays finite
    (normalized zero atoms are kept at zero, not NaN)."""
    V = np.random.default_rng(0).random((2, 1, 10))
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3,))
    nmf.fit(V, n_iterations=3, mask=np.zeros_like(V))
    assert np.isfinite(nmf.W).all() and np.isfinite(nmf.H).all()
    assert nmf._energy_function() == 0.0


def test_multiscale_zero_input():
    from tnmf_tpu import MultiScaleTNMF
    m = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (5,)), seed=0)
    m.fit(np.zeros((2, 1, 12)), n_iterations=3)
    assert all(np.isfinite(w).all() for w in m.W)
    assert all(np.isfinite(h).all() for h in m.H)
