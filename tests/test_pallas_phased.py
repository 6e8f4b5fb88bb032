"""Parity of the fused Pallas phased mu_H kernel vs the XLA phased path
(interpreter mode on CPU; the kernel is a documented negative result —
see tnmf_tpu/experimental/pallas_phased.py — but its numerics must stay
correct while it remains available for experimentation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tnmf_tpu.experimental import pallas_phased
from tnmf_tpu.ops import phased
from tnmf_tpu.ops.modes import ConvPlan

MODES = ['valid', 'full', 'circular', 'reflect']


def _problem(mode, S=(40, 44), A=(9, 9), N=3, C=2, M=5, seed=0,
             dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    plan = ConvPlan.create(mode, S, A)
    V = jnp.asarray(rng.random((N, C) + S), dtype)
    W = jnp.asarray(rng.random((M, C) + A), dtype)
    Hc = jnp.asarray(rng.random((N, M) + plan.transform_shape), dtype)
    H = phased.encode_h(Hc, plan)
    Vs = phased.prepare_data(V, plan)
    R = phased.reconstruct(W, H, plan)
    return plan, Vs, R, W, H


def _xla_ref(Vs, R, W, H, plan, eps, pos_extra=None):
    neg, pos = phased.grad_H_pair(Vs, R, W, plan)
    if pos_extra is not None:
        pos = pos + pos_extra
    return H * neg / (pos + eps)


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('with_extra', [False, True])
def test_matches_xla_phased(mode, with_extra):
    plan, Vs, R, W, H = _problem(mode)
    rng = np.random.default_rng(1)
    pe = jnp.asarray(rng.random(H.shape), H.dtype) if with_extra else None
    ref = _xla_ref(Vs, R, W, H, plan, 1e-9, pe)
    got = pallas_phased.mu_h(Vs, R, W, H, plan, 1e-9, pe, interpret=True)
    assert got.shape == H.shape and got.dtype == H.dtype
    # the kernel accumulates in f32 (f64 inputs here exercise the cast
    # boundaries); tolerance is f32 roundoff on O(100) gradient sums
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=1e-7)


@pytest.mark.parametrize('S,A,N,C,M', [
    ((23, 61), (5, 5), 2, 3, 4),    # absorbing padding on both axes
    ((64, 64), (9, 9), 1, 1, 1),    # minimal channels/atoms
    ((40, 30), (13, 9), 2, 1, 3),   # mixed tap counts per axis
])
def test_geometry_sweep(S, A, N, C, M):
    plan, Vs, R, W, H = _problem('valid', S=S, A=A, N=N, C=C, M=M)
    ref = _xla_ref(Vs, R, W, H, plan, 1e-9)
    got = pallas_phased.mu_h(Vs, R, W, H, plan, 1e-9, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=1e-7)


def test_ragged_row_blocks_pad():
    # a transform extent whose phased row count is prime forces the ragged
    # tail-block path (the data tensors are padded so dynamic row slices
    # never clamp-shift)
    plan, Vs, R, W, H = _problem('valid', S=(61, 40), A=(10, 9), N=1, C=1,
                                 M=2)
    assert phased.geometry(plan) is not None
    ref = _xla_ref(Vs, R, W, H, plan, 1e-9)
    got = pallas_phased.mu_h(Vs, R, W, H, plan, 1e-9, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=1e-7)


def test_supported_gate():
    plan2 = ConvPlan.create('valid', (40, 44), (9, 9))
    assert pallas_phased.geometry_ok(plan2, jnp.float32)
    assert pallas_phased.geometry_ok(plan2, jnp.bfloat16)
    assert not pallas_phased.geometry_ok(plan2, jnp.float64)
    plan1 = ConvPlan.create('valid', (300,), (9,))
    assert not pallas_phased.geometry_ok(plan1, jnp.float32)  # 1-D geometry
    plan_even = ConvPlan.create('valid', (40, 44), (8, 8))
    # even atoms: no phase structure, geometry() is None
    assert not pallas_phased.geometry_ok(plan_even, jnp.float32)
    # the compiled gate additionally requires a TPU backend (CPU here)
    assert not pallas_phased.supported(plan2, jnp.float32)
