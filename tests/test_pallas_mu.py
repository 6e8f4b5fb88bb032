"""Pallas MU kernels vs the XLA reference path (interpreter mode on CPU;
compiled execution is exercised on TPU by benchmarks/pallas_fusion.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tnmf_tpu.experimental import pallas_mu
from tnmf_tpu.ops.inhibition import inhibition_kernels, inhibition_positive_term


@pytest.mark.parametrize('shape', [(7,), (3, 5, 11), (2, 4, 30, 31)])
def test_mu_ratio(shape):
    rng = np.random.default_rng(0)
    a, n, p = (jnp.asarray(rng.random(shape)) for _ in range(3))
    got = pallas_mu.mu_ratio(a, n, p, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(a * n / (p + 0.1)),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize('dims,ranges', [
    ((2, 4, 20, 24), (3, 2)),
    ((3, 5, 17, 13), (6, 6)),
    ((1, 3, 300, 40), (4, 3)),   # x > chunk size: multi-chunk tiling + halos
    ((3, 4, 40), (5,)),
])
@pytest.mark.parametrize('use_same,use_cross', [(True, False), (False, True), (True, True)])
def test_inhibited_mu_h(dims, ranges, use_same, use_cross):
    rng = np.random.default_rng(1)
    H, neg, pos = (jnp.asarray(rng.random(dims)) for _ in range(3))
    ks = tuple(jnp.asarray(k) for k in inhibition_kernels(ranges))
    n_shift = len(ranges)

    got = pallas_mu.inhibited_mu_h(H, neg, pos, ks, 0.3, 0.2, 1e-9 + 0.1,
                                   use_same=use_same, use_cross=use_cross,
                                   interpret=True)
    term = inhibition_positive_term(H, ks, n_shift, 0.3, 0.2, dims[1],
                                    use_same, use_cross)
    want = H * neg / (pos + term + 1e-9 + 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('dims,ranges', [((2, 4, 20, 24), (3, 2)), ((3, 4, 40), (5,))])
def test_inhibited_mu_h_bf16_storage(dims, ranges):
    """bf16 H with f32 gradient pairs (the engine's bf16-storage layout):
    the kernel must compute in f32 and store bf16 without a dtype error."""
    rng = np.random.default_rng(3)
    H = jnp.asarray(rng.random(dims), jnp.bfloat16)
    neg, pos = (jnp.asarray(rng.random(dims), jnp.float32) for _ in range(2))
    ks = tuple(jnp.asarray(k, jnp.float32) for k in inhibition_kernels(ranges))

    got = pallas_mu.inhibited_mu_h(H, neg, pos, ks, 0.3, 0.2, 1e-9 + 0.1,
                                   use_same=True, use_cross=True, interpret=True)
    assert got.dtype == jnp.bfloat16
    term = inhibition_positive_term(H.astype(jnp.float32), ks, len(ranges),
                                    0.3, 0.2, dims[1], True, True)
    want = (H.astype(jnp.float32) * neg / (pos + term + 1e-9 + 0.1)).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want, np.float32),
                               rtol=2e-2, atol=1e-3)


def test_mu_ratio_bf16_storage():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.random((3, 5, 11)), jnp.bfloat16)
    n, p = (jnp.asarray(rng.random((3, 5, 11)), jnp.float32) for _ in range(2))
    got = pallas_mu.mu_ratio(a, n, p, 0.1, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = (a.astype(jnp.float32) * n / (p + np.float32(0.1))).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want, np.float32),
                               rtol=2e-2, atol=1e-3)


def test_supported_gate():
    # CPU backend: the compiled kernel must report unsupported so the engine
    # falls back to the XLA path
    assert not pallas_mu.inhibited_mu_h_supported((2, 4, 20, 20), 2, (5, 5), jnp.float32)
    # rank-3 always unsupported
    assert not pallas_mu.inhibited_mu_h_supported((2, 4, 8, 8, 8), 3, (3, 3, 3), jnp.float32)


def test_engine_flag_falls_back_on_cpu():
    """use_pallas=True on a CPU backend must silently use the XLA path and
    produce identical results."""
    from tnmf_tpu import TransformInvariantNMF
    V = np.random.default_rng(2).random((2, 1, 12, 12))

    np.random.seed(0)
    a = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4))
    a.fit(V, n_iterations=3, inhibition_strength=0.2)
    np.random.seed(0)
    b = TransformInvariantNMF(n_atoms=3, atom_shape=(4, 4), use_pallas=True)
    b.fit(V, n_iterations=3, inhibition_strength=0.2)
    np.testing.assert_array_equal(a.W, b.W)
