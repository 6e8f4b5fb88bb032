"""Matched-filter activation initialization (``h_init='correlate'``).

``H0 = c * (V star W)`` with the least-squares-optimal scale ``c`` —
deterministic, computed on device, no host draw or upload of an H-sized
array (engine.correlate_init_H).  The reference only draws H uniformly
(``_Backend.py:83-98``).  Pinned: cross-strategy parity on all four
modes, serving improvement at equal iterations, RNG-free determinism,
mesh parity and the guard rails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF, engine
from tnmf_tpu.ops import conv, fft, phased
from tnmf_tpu.ops.modes import ConvPlan


@pytest.mark.parametrize('mode', ['valid', 'full', 'circular', 'reflect'])
def test_correlate_init_cross_strategy_parity(mode):
    rng = np.random.default_rng(0)
    plan = ConvPlan.create(mode, (16, 12), (5, 3))
    V = jnp.asarray(rng.random((3, 1, 16, 12)))
    W = jnp.asarray(rng.random((4, 1, 5, 3)))
    outs = {}
    for strat, ops in (('conv', conv), ('fft', fft), ('phased', phased)):
        Vp = ops.prepare_data(V, plan)
        outs[strat] = engine.correlate_init_H(
            Vp, V, W, plan=plan, strategy=strat, n_atoms=4)
    np.testing.assert_allclose(outs['fft'], outs['conv'], rtol=1e-8)
    np.testing.assert_allclose(outs['phased'], outs['conv'], rtol=1e-8)
    assert (np.asarray(outs['conv']) > 0).all()  # floored: MU can move it


def _signal(n=4):
    from tnmf_tpu.utils.signals import generate_pulse_train
    np.random.seed(3)
    return np.stack([generate_pulse_train(pulse_length=16, n_pulses=4)[0]
                     for _ in range(n)])


def test_correlate_serving_beats_random_at_equal_iterations():
    V = _signal()
    base = TransformInvariantNMF(n_atoms=3, atom_shape=(16,), seed=1)
    base.fit(V, n_iterations=100)
    energies = {}
    for hi in ('random', 'correlate'):
        m = TransformInvariantNMF(n_atoms=3, atom_shape=(16,), seed=1,
                                  h_init=hi)
        m.set_dictionary(base.W)
        m.transform(V, n_iterations=10)
        energies[hi] = m._energy_function()
    assert energies['correlate'] < energies['random']


def test_correlate_is_rng_free_for_H():
    """With a fixed dictionary, serving is fully deterministic — no seed
    needed and no RNG state consumed for H."""
    V = _signal(2)
    W = TransformInvariantNMF(n_atoms=3, atom_shape=(16,), seed=1)
    W.fit(V, n_iterations=5)
    outs = []
    for _ in range(2):
        m = TransformInvariantNMF(n_atoms=3, atom_shape=(16,),
                                  h_init='correlate')  # NO seed
        m.set_dictionary(W.W)
        outs.append(m.transform(V, n_iterations=5))
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=0)


def test_correlate_composes_with_beta_mask_group_and_fit():
    rng = np.random.default_rng(0)
    V = rng.random((2, 1, 12, 12)) + 0.01
    for kw in (dict(beta_loss='kullback-leibler'),
               dict(transform_type='shift+flip'), dict()):
        m = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1,
                                  h_init='correlate', **kw)
        m.fit(V, n_iterations=3)
        assert np.isfinite(m.H).all() and (m.H >= 0).all()
    mask = (np.arange(V.size).reshape(V.shape) % 3 != 0).astype(float)
    m = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=1,
                              h_init='correlate')
    m.fit(V, n_iterations=3, mask=mask)
    assert np.isfinite(m.H).all()


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_correlate_under_mesh_matches_single_device():
    from tnmf_tpu.parallel import make_mesh
    rng = np.random.default_rng(7)
    V = rng.random((8, 1, 16, 16))

    def run(mesh):
        m = TransformInvariantNMF(n_atoms=4, atom_shape=(3, 3), seed=3,
                                  h_init='correlate', mesh=mesh)
        m.fit(V, n_iterations=4)
        return m

    single, sharded = run(None), run(make_mesh(8))
    np.testing.assert_allclose(sharded.W, single.W, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sharded.H, single.H, rtol=1e-8, atol=1e-10)


def test_h_init_guard_rails():
    with pytest.raises(ValueError, match='h_init must be'):
        TransformInvariantNMF(n_atoms=2, atom_shape=(3,), h_init='zeros')
    with pytest.raises(ValueError, match='nndsvd'):
        TransformInvariantNMF(n_atoms=2, atom_shape=(3,), w_init='nndsvd',
                              h_init='correlate', reconstruction_mode='full')
