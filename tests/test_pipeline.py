"""Host→device prefetch pipeline (tnmf_tpu.utils.pipeline).

Pinned: order/value preservation, device placement + sharded layouts,
dtype casting, exception propagation, and end-to-end parity of a
partial_fit stream fed from the prefetcher vs plain host arrays (the
model keeps device-resident inputs on device — no host round trip).
"""

import jax
import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF
from tnmf_tpu.utils.pipeline import prefetch_to_device


def _batches(k=5, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.random((2, 1, 8, 8)).astype(np.float32) for _ in range(k)]


def test_order_values_and_placement():
    src = _batches()
    out = list(prefetch_to_device(iter(src), buffer_size=3))
    assert len(out) == len(src)
    for got, want in zip(out, src):
        assert isinstance(got, jax.Array)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_dtype_cast():
    out = list(prefetch_to_device(iter(_batches(1)), dtype='bfloat16'))
    assert str(out[0].dtype) == 'bfloat16'


def test_exception_propagates():
    def bad():
        yield _batches(1)[0]
        raise RuntimeError('source broke')

    it = prefetch_to_device(bad())
    next(it)
    with pytest.raises(RuntimeError, match='source broke'):
        next(it)


def test_buffer_size_validated():
    with pytest.raises(ValueError, match='buffer_size'):
        list(prefetch_to_device(iter([]), buffer_size=0))


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_sharded_prefetch_layout():
    from tnmf_tpu.parallel import make_mesh
    from tnmf_tpu.parallel.sharding import data_sharding
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    src = [rng.random((8, 1, 8, 8)).astype(np.float32) for _ in range(2)]
    out = list(prefetch_to_device(iter(src),
                                  sharding=data_sharding(mesh, 4)))
    assert len(out[0].devices()) == 8
    np.testing.assert_array_equal(np.asarray(out[0]), src[0])


def test_partial_fit_from_prefetched_stream_matches_host_feed():
    src = _batches(4, seed=7)

    def run(feed):
        m = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3), seed=2)
        for b in feed:
            m.partial_fit(b)
        return m

    host = run(iter(src))
    dev = run(prefetch_to_device(iter(src)))
    np.testing.assert_allclose(dev.W, host.W, rtol=1e-6)
    np.testing.assert_allclose(dev.H, host.H, rtol=1e-6)
    # the device-resident batch stayed on device; V materializes lazily
    assert isinstance(dev._V, jax.Array)
    np.testing.assert_array_equal(dev.V, src[-1])
