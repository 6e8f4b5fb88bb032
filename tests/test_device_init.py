"""Device-side initialization (init='device'): correct distribution,
reproducibility, mesh compatibility, and warm restarts."""

import jax
import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF
from tnmf_tpu.parallel import make_mesh


def _V(n=4):
    return np.random.default_rng(0).random((n, 2, 16, 16))


def test_device_init_fit():
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=5, init='device')
    nmf.fit(_V(), n_iterations=5)
    assert np.isfinite(nmf._energy_function())
    np.testing.assert_allclose(nmf.W.sum(axis=(-1, -2)), 1.0, rtol=1e-6)
    assert (nmf.H >= 0).all() and (nmf.W >= 0).all()


def test_device_init_reproducible():
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=5, init='device')
    a.fit(_V(), n_iterations=3)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=5, init='device')
    b.fit(_V(), n_iterations=3)
    np.testing.assert_array_equal(a.W, b.W)
    c = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=6, init='device')
    c.fit(_V(), n_iterations=3)
    assert not np.allclose(a.W, c.W)


def test_device_init_keep_W():
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=5, init='device')
    nmf.fit(_V(), n_iterations=3)
    W0 = nmf.W
    nmf.fit(_V(), n_iterations=2, keep_W=True, update_W=False)
    np.testing.assert_array_equal(nmf.W, W0)


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 (virtual) devices')
def test_device_init_with_mesh():
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(3, 3), seed=5,
                                init='device', mesh=make_mesh(8))
    nmf.fit(_V(8), n_iterations=3)
    assert np.isfinite(nmf._energy_function())
    assert len(nmf._H.devices()) == 8


def test_bad_init_rejected():
    with pytest.raises(ValueError, match="init"):
        TransformInvariantNMF(n_atoms=2, atom_shape=(3,), init='gpu')
