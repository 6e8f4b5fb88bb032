"""Randomized parity fuzz: seeded random geometries through full MU
iterations, every strategy against the NumPy oracle.

The systematic parity suites (tests/test_ops_parity.py, test_phased.py)
cover a hand-picked grid of shapes; this file sweeps *random* geometry
corners — mixed odd/even atom extents, non-square samples, rank 1-3,
channel/atom counts, sparsity, random masks and a non-Euclidean beta —
so off-by-one crop/pad regressions anywhere in the mode arithmetic
surface as fuzz failures rather than user bug reports.  All draws are
seeded: a failure reproduces exactly from the case index.
"""

import numpy as np
import pytest

from tnmf_tpu import engine
from tnmf_tpu.ops import oracle
from tnmf_tpu.ops.modes import ConvPlan

import jax.numpy as jnp

N_CASES = 24
MODES = ['valid', 'full', 'circular', 'reflect']


def _draw_case(i):
    rng = np.random.default_rng(1000 + i)
    ndim = int(rng.integers(1, 4))
    mode = MODES[int(rng.integers(0, 4))]
    atom = tuple(int(rng.integers(1, 5)) for _ in range(ndim))
    # sample extents: at least atom (valid/full) / atom-friendly for the
    # periodic and reflect extensions
    sample = tuple(int(a + rng.integers(a if mode != 'valid' else 0, 9))
                   for a in atom)
    n, c, m = (int(rng.integers(1, 4)) for _ in range(3))
    sparsity = float(rng.choice([0.0, 0.3]))
    beta = float(rng.choice([2.0, 1.5]))
    masked = bool(rng.integers(0, 2)) and beta == 2.0
    return dict(i=i, ndim=ndim, mode=mode, atom=atom, sample=sample,
                n=n, c=c, m=m, sparsity=sparsity, beta=beta, masked=masked,
                rng=rng)


def _oracle_mu(V, W, H, case, n_iter=2):
    """Reference MU trajectory in float64 NumPy (masked/beta via the same
    (neg, pos) factor construction the engine uses; for beta=2 this is the
    plain oracle gradient pair)."""
    eps = 1e-9
    mode, beta = case['mode'], case['beta']
    mask = case.get('mask')
    Vm = V if mask is None else V * mask
    for _ in range(n_iter):
        R = oracle.reconstruct(W, H, mode)
        if beta == 2.0:
            Rm = R if mask is None else R * mask
            neg = oracle.corr_H(Vm, W, mode)
            pos = oracle.corr_H(Rm, W, mode)
        else:
            A = Vm * np.maximum(R, 1e-9) ** (beta - 2.0)
            B = np.maximum(R, 1e-9) ** (beta - 1.0)
            neg = oracle.corr_H(A, W, mode)
            pos = oracle.corr_H(B, W, mode)
        H = H * neg / (pos + eps + case['sparsity'])
        R = oracle.reconstruct(W, H, mode)
        if beta == 2.0:
            Rm = R if mask is None else R * mask
            neg = oracle.corr_W(Vm, H, mode, case['atom'])
            pos = oracle.corr_W(Rm, H, mode, case['atom'])
        else:
            A = Vm * np.maximum(R, 1e-9) ** (beta - 2.0)
            B = np.maximum(R, 1e-9) ** (beta - 1.0)
            neg = oracle.corr_W(A, H, mode, case['atom'])
            pos = oracle.corr_W(B, H, mode, case['atom'])
        W = W * (neg / (pos + eps))
        s = W.sum(axis=tuple(range(-case['ndim'], 0)), keepdims=True)
        W = W / np.where(s == 0, 1, s)
    return W, H


@pytest.mark.parametrize('i', range(N_CASES))
def test_fuzz_mu_parity(i):
    case = _draw_case(i)
    rng = case['rng']
    plan = ConvPlan.create(case['mode'], case['sample'], case['atom'])
    V = rng.random((case['n'], case['c']) + case['sample'])
    W = rng.random((case['m'], case['c']) + case['atom'])
    W /= W.sum(axis=tuple(range(-case['ndim'], 0)), keepdims=True)
    H = rng.random((case['n'], case['m']) + plan.transform_shape)
    if case['masked']:
        case['mask'] = (rng.random(V.shape) > 0.3).astype(V.dtype)
    if case['beta'] != 2.0:
        V = V + 0.1  # positivity domain

    W_ref, H_ref = _oracle_mu(V, W, H, case)

    strategies = ['conv', 'fft']
    from tnmf_tpu.ops import phased
    if phased.applicable(plan, case['c'], case['m']):
        strategies.append('phased')
    for strategy in strategies:
        Vd = jnp.asarray(V)
        mask_d = jnp.asarray(case['mask']) if case.get('mask') is not None else None
        if case['beta'] != 2.0:
            # prepared-factor strategies (conv/phased/dot) take prepare(V)
            # even for beta != 2; fft takes the canonical tensor
            # (engine._beta_factors docstring)
            Vp = (engine.prepare_data(Vd, plan=plan, strategy=strategy)
                  if engine.beta_prepares_data(strategy) else Vd)
        elif mask_d is not None:
            Vp = engine.prepare_data(Vd * mask_d, plan=plan, strategy=strategy)
        else:
            Vp = engine.prepare_data(Vd, plan=plan, strategy=strategy)
        zero = jnp.float64(0.0)
        Wd, Hd = engine.fit_loop(
            Vp, jnp.asarray(W), jnp.asarray(H), 2,
            jnp.float64(case['sparsity']), zero, zero, (), mask=mask_d,
            plan=plan, strategy=strategy, update_H=True, update_W=True,
            use_inhibition=False, use_cross=False, beta=case['beta'])
        np.testing.assert_allclose(
            np.asarray(Wd), W_ref, rtol=1e-8, atol=1e-10,
            err_msg=f'case {i} ({case["mode"]}, rank {case["ndim"]}, '
                    f'{strategy}, beta {case["beta"]}, '
                    f'masked {case["masked"]}): W diverged')
        np.testing.assert_allclose(
            np.asarray(Hd), H_ref, rtol=1e-8, atol=1e-10,
            err_msg=f'case {i}: H diverged under {strategy}')
