"""Parity of the Pallas blocked-GEMM grad_W kernel vs the conv strategy
(interpreter mode on CPU; compiled execution + timings are exercised on TPU
by benchmarks/pallas_fusion.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tnmf_tpu.experimental import pallas_gw
from tnmf_tpu.ops import conv
from tnmf_tpu.ops.modes import ConvPlan

MODES = ['valid', 'full', 'circular', 'reflect']


def _problem(mode, S, A, N, C, M, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    plan = ConvPlan.create(mode, S, A)
    V = jnp.asarray(rng.random((N, C) + S), dtype)
    W = jnp.asarray(rng.random((M, C) + A), dtype)
    H = jnp.asarray(rng.random((N, M) + plan.transform_shape), dtype)
    Vp = conv.prepare_data(V, plan)
    R = conv.reconstruct(W, H, plan)
    X2 = jnp.concatenate([Vp, conv.extend_data(R, plan)], axis=1)
    return plan, Vp, R, H, X2


@pytest.mark.parametrize('mode', MODES)
def test_matches_conv_all_modes(mode):
    plan, Vp, R, H, X2 = _problem(mode, (20, 17), (5, 4), N=3, C=2, M=4)
    neg0, pos0 = conv.grad_W_pair(Vp, R, H, plan)
    neg1, pos1 = pallas_gw.grad_w_gemm(X2, H, plan=plan, interpret=True)
    np.testing.assert_allclose(np.asarray(neg1), np.asarray(neg0), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pos1), np.asarray(pos0), rtol=2e-5)


@pytest.mark.parametrize('S,A,N,C,M', [
    ((33, 129), (7, 7), 2, 3, 16),   # Ty+Ay-1 lands exactly on a lane tile
    ((11, 9), (3, 2), 1, 1, 1),      # minimal everything
    ((40, 30), (8, 5), 5, 2, 10),    # even atom extents, M not sublane-aligned
])
def test_matches_conv_geometries(S, A, N, C, M):
    plan, Vp, R, H, X2 = _problem('valid', S, A, N=N, C=C, M=M, seed=1)
    neg0, pos0 = conv.grad_W_pair(Vp, R, H, plan)
    neg1, pos1 = pallas_gw.grad_w_gemm(X2, H, plan=plan, interpret=True)
    np.testing.assert_allclose(np.asarray(neg1), np.asarray(neg0), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pos1), np.asarray(pos0), rtol=2e-5)


def test_bf16_storage():
    """bf16 inputs accumulate in f32 (preferred_element_type) and return f32
    statistics like the conv path under bf16 storage."""
    plan, Vp, R, H, X2 = _problem('valid', (24, 20), (5, 5), N=2, C=2, M=4,
                                  dtype=jnp.bfloat16)
    neg1, pos1 = pallas_gw.grad_w_gemm(X2, H, plan=plan, interpret=True)
    assert neg1.dtype == jnp.float32
    neg0, pos0 = conv.grad_W_pair(Vp, R, H, plan)
    np.testing.assert_allclose(np.asarray(neg1), np.asarray(neg0, np.float32),
                               rtol=3e-2)
    np.testing.assert_allclose(np.asarray(pos1), np.asarray(pos0, np.float32),
                               rtol=3e-2)


def test_supported_gate():
    plan = ConvPlan.create('valid', (64, 64), (7, 7))
    # CPU backend: the compiled kernel must report unsupported so the engine
    # falls back to the XLA conv path
    assert not pallas_gw.supported(plan, 16, 6, jnp.float32)
    # geometry itself is feasible for the flagship shape ...
    _, uc, _, _ = pallas_gw._geometry(plan, 16, 6, 4)
    assert uc >= 1
    # ... but not for atom counts whose lhs exceeds the VMEM budget at a
    # large transform pitch
    plan_big = ConvPlan.create('valid', (256, 256), (7, 7))
    _, uc64, _, _ = pallas_gw._geometry(plan_big, 64, 6, 4)
    assert uc64 == 0
    # rank-1 unsupported
    plan1 = ConvPlan.create('valid', (64,), (7,))
    assert not pallas_gw.supported(plan1, 16, 6, jnp.float32)
