"""Shift-invariant HALS (exact phase-blocked coordinate descent for the
conv-NMF geometry, :mod:`tnmf_tpu.engine_hals_conv`) — round-5: the
`solver='hals'` extension beyond the degenerate plain-NMF corner.

Pinned: the jitted phase sweep against a scalar-loop float64 oracle (the
exact per-entry minimizer), monotone objective decrease of the hybrid
iteration (exact H block CD + multiplicative W step), convergence
behavior vs MU from identical starts, the tol/trace/callback loop
dispatch through the model, and geometry gating.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tnmf_tpu import TransformInvariantNMF, engine_hals_conv as ehc
from tnmf_tpu.ops import oracle
from tnmf_tpu.ops.modes import ConvPlan


def _problem(n=2, c=2, sample=(13,), atom=(4,), m=3, seed=0):
    rng = np.random.default_rng(seed)
    V = rng.random((n, c) + sample)
    W = rng.random((m, c) + atom)
    plan = ConvPlan.create('full', sample, atom, precision='highest')
    H = rng.random((n, m) + plan.transform_shape)
    return V, W, H, plan


@pytest.mark.parametrize('geom', [
    ((13,), (4,)),      # 1-D, T=10 not divisible by A
    ((12,), (4,)),      # 1-D, divisible
    ((9, 8), (3, 4)),   # 2-D, mixed divisibility
    ((7, 7), (3, 3)),   # 2-D small
])
@pytest.mark.parametrize('inner', [1, 2])
def test_phase_sweep_matches_oracle(geom, inner):
    """The vectorized fori_loop phase sweep reproduces the scalar-loop
    exact-CD oracle exactly (float64)."""
    sample, atom = geom
    V, W, H, plan = _problem(sample=sample, atom=atom, seed=3)
    want = ehc.np_conv_hals_h_sweep(V, W, H, l1=0.0, l2=0.0, inner=inner)

    E_pad, H_r = ehc._encode(jnp.asarray(V), jnp.asarray(W),
                             jnp.asarray(H), plan)
    G = ehc.gram_W(jnp.asarray(W), plan.lax_precision)
    z = jnp.float64(0.0)
    E_pad, H_r = ehc.h_phase_sweep(E_pad, H_r, jnp.asarray(W), G, z, z,
                                   plan=plan, inner=inner)
    got = np.asarray(ehc._decode_h(H_r, plan))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # the maintained residual stays consistent with the returned H
    R = oracle.reconstruct(W, got, 'full')
    S = plan.sample_shape
    E = np.asarray(E_pad)[(Ellipsis,) + tuple(slice(0, s) for s in S)]
    np.testing.assert_allclose(E, V - R, rtol=1e-9, atol=1e-11)


def test_phase_sweep_regularized_matches_oracle():
    V, W, H, plan = _problem(sample=(11,), atom=(3,), seed=5)
    l1, l2 = 0.05, 0.2
    want = ehc.np_conv_hals_h_sweep(V, W, H, l1=l1, l2=l2, inner=1)
    E_pad, H_r = ehc._encode(jnp.asarray(V), jnp.asarray(W),
                             jnp.asarray(H), plan)
    G = ehc.gram_W(jnp.asarray(W), plan.lax_precision)
    E_pad, H_r = ehc.h_phase_sweep(E_pad, H_r, jnp.asarray(W), G,
                                   jnp.float64(l1), jnp.float64(l2),
                                   plan=plan, inner=1)
    np.testing.assert_allclose(np.asarray(ehc._decode_h(H_r, plan)), want,
                               rtol=1e-10, atol=1e-12)


def test_sweep_is_exact_blockwise():
    """Each per-position update is the exact minimizer: re-sweeping the
    same phase structure with frozen W can only decrease the objective,
    and a converged H is a fixed point of the sweep."""
    V, W, H, plan = _problem(sample=(16,), atom=(4,), seed=7)
    z = jnp.float64(0.0)
    Wd = jnp.asarray(W)
    G = ehc.gram_W(Wd, plan.lax_precision)
    E_pad, H_r = ehc._encode(jnp.asarray(V), Wd, jnp.asarray(H), plan)
    es = [float(ehc._energy_from_residual(E_pad))]
    for _ in range(200):
        E_pad, H_r = ehc.h_phase_sweep(E_pad, H_r, Wd, G, z, z,
                                       plan=plan, inner=1)
        es.append(float(ehc._energy_from_residual(E_pad)))
    assert all(b <= a + 1e-12 for a, b in zip(es, es[1:]))
    # converged to a fixed point of the sweep operator: one more sweep
    # changes H negligibly (CD across overlapping phases zig-zags, so the
    # contraction is linear, not one-shot — 200 sweeps suffice here)
    H1 = np.asarray(ehc._decode_h(H_r, plan))
    E_pad, H_r = ehc.h_phase_sweep(E_pad, H_r, Wd, G, z, z,
                                   plan=plan, inner=1)
    H2 = np.asarray(ehc._decode_h(H_r, plan))
    assert np.max(np.abs(H2 - H1)) < 1e-6 * max(1.0, np.max(H1))


def test_fit_loop_monotone_and_matches_update_step():
    V, W, H, plan = _problem(sample=(10, 9), atom=(3, 3), seed=9)
    z = jnp.float64(0.0)
    kw = dict(inner=1, update_H=True, update_W=True, plan=plan)
    Wn, Hn, es = ehc.fit_loop_energies(jnp.asarray(V), jnp.asarray(W),
                                       jnp.asarray(H), z, z,
                                       n_iterations=8, **kw)
    es = np.asarray(es)
    assert np.all(np.diff(es) <= 1e-12 * es[0])
    # stepwise path lands on the same trajectory
    Ws, Hs = jnp.asarray(W), jnp.asarray(H)
    for _ in range(8):
        Ws, Hs = ehc.update_step(jnp.asarray(V), Ws, Hs, z, z, **kw)
    np.testing.assert_allclose(np.asarray(Wn), np.asarray(Ws), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(Hn), np.asarray(Hs), rtol=1e-9)


def test_beats_mu_h_subproblem():
    """With W frozen, a few exact sweeps reach a lower objective than many
    MU H steps from the SAME start (the solver's raison d'etre)."""
    from tnmf_tpu import engine
    V, W, H, plan = _problem(n=3, c=1, sample=(40,), atom=(5,), m=4,
                             seed=11)
    z = jnp.float64(0.0)
    kw = dict(inner=2, update_H=True, update_W=False, plan=plan)
    _, Hcd, es = ehc.fit_loop_energies(jnp.asarray(V), jnp.asarray(W),
                                       jnp.asarray(H), z, z,
                                       n_iterations=10, **kw)
    cd = np.asarray(es)

    statics = dict(plan=plan, strategy='conv', update_H=True,
                   update_W=False, use_inhibition=False, use_cross=False)
    Vp = engine.prepare_data(jnp.asarray(V), plan=plan, strategy='conv')
    from tnmf_tpu.ops import oracle

    def mu_energy(k):
        _, Hmu = engine.fit_loop(Vp, jnp.asarray(W), jnp.asarray(H), k,
                                 z, z, z, (), **statics)
        R = oracle.reconstruct(W, np.asarray(Hmu), 'full')
        return 0.5 * float(np.sum((V - R) ** 2))

    # exact sweeps dominate MU at matched iteration counts (k=1 excluded:
    # from a far-off random init MU's first global multiplicative rescale
    # out-jumps one Gauss-Seidel pass; CD leads from the second sweep on)
    for k in (3, 10):
        assert cd[k - 1] < mu_energy(k)
    # ...and 10 sweeps rival ~100 MU iterations (measured ~10x per-iter
    # convergence advantage on this problem; benchmarks/hals_conv.py
    # prices the wall-clock side)
    assert cd[9] < mu_energy(50)


def test_model_routes_conv_hals():
    """solver='hals' on the non-degenerate 'full' geometry routes to the
    shift-invariant CD engine: fused loop, trace, tol, callback paths."""
    rng = np.random.default_rng(0)
    V = rng.random((2, 1, 20))
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(4,),
                              reconstruction_mode='full', verbose=0,
                              precision='highest')
    np.random.seed(1)
    m.fit(V, solver='hals', n_iterations=10, record_energies=True)
    assert m.energies_.shape == (10,)
    assert np.all(np.diff(m.energies_) <= 1e-12 * m.energies_[0])
    # fused loop == recorded loop
    np.random.seed(1)
    m2 = TransformInvariantNMF(n_atoms=3, atom_shape=(4,),
                               reconstruction_mode='full', verbose=0,
                               precision='highest')
    m2.fit(V, solver='hals', n_iterations=10)
    np.testing.assert_allclose(m2.W, m.W, rtol=1e-10)
    np.testing.assert_allclose(m2.H, m.H, rtol=1e-10)
    # tol + trace composition
    np.random.seed(1)
    m3 = TransformInvariantNMF(n_atoms=3, atom_shape=(4,),
                               reconstruction_mode='full', verbose=0,
                               precision='highest')
    m3.fit(V, solver='hals', n_iterations=2000, tol=1e-7,
           tol_check_every=5, record_energies=True)
    assert 0 < m3.n_iterations_ < 2000
    assert m3.energies_.shape == (m3.n_iterations_,)
    # callback path
    seen = []
    np.random.seed(1)
    m4 = TransformInvariantNMF(n_atoms=3, atom_shape=(4,),
                               reconstruction_mode='full', verbose=0,
                               precision='highest')
    m4.fit(V, solver='hals', n_iterations=10,
           progress_callback=lambda nmf, i: seen.append(i) or True)
    assert seen == list(range(10))
    np.testing.assert_allclose(m4.W, m.W, rtol=1e-10)


def test_model_geometry_gating():
    rng = np.random.default_rng(0)
    V = rng.random((2, 1, 20))
    # 'valid' (default) stays rejected: boundary footprints are clipped
    m = TransformInvariantNMF(n_atoms=3, atom_shape=(4,), verbose=0)
    with pytest.raises(ValueError, match="'full'"):
        m.fit(V, solver='hals', n_iterations=2)
    # degenerate 'full' still routes to the plain-NMF HALS engine
    np.random.seed(2)
    md = TransformInvariantNMF(n_atoms=3, atom_shape=(20,),
                               reconstruction_mode='full', verbose=0)
    md.fit(V, solver='hals', n_iterations=3)
    assert md.W.shape == (3, 1, 20)


def test_conv_hals_regularizer_and_flags():
    rng = np.random.default_rng(4)
    V = rng.random((2, 1, 18))
    np.random.seed(3)
    m = TransformInvariantNMF(n_atoms=2, atom_shape=(3,),
                              reconstruction_mode='full', verbose=0,
                              precision='highest')
    m.fit(V, solver='hals', n_iterations=6, sparsity_H=0.5,
          record_energies=True)
    np.random.seed(3)
    m0 = TransformInvariantNMF(n_atoms=2, atom_shape=(3,),
                               reconstruction_mode='full', verbose=0,
                               precision='highest')
    m0.fit(V, solver='hals', n_iterations=6)
    assert np.sum(m.H) < np.sum(m0.H)  # L1 pressure bites
    # W-side penalties are a plain-NMF-HALS feature (the conv W step is
    # multiplicative)
    with pytest.raises(ValueError, match='sparsity_W'):
        m.fit(V, solver='hals', n_iterations=2, sparsity_W=0.1)
    # frozen-W encode
    np.random.seed(3)
    mf = TransformInvariantNMF(n_atoms=2, atom_shape=(3,),
                               reconstruction_mode='full', verbose=0)
    mf.fit(V, solver='hals', n_iterations=3)
    W0 = mf.W.copy()
    mf.fit(V, solver='hals', n_iterations=3, keep_W=True, update_W=False)
    np.testing.assert_array_equal(mf.W, W0)


def test_conv_hals_sharded_matches_single():
    """Sample-sharded shift-invariant HALS equals single-device: the
    phase sweep is sample-parallel (rows of every phase's NNLS block are
    per-sample), the Gram is W-only, and the MU W step's sample reduction
    becomes a GSPMD all-reduce."""
    import jax
    from tnmf_tpu.parallel import make_mesh
    if jax.device_count() < 8:
        pytest.skip('needs 8 (virtual) devices')
    rng = np.random.default_rng(0)
    V = rng.random((16, 1, 20))
    kw = dict(n_atoms=3, atom_shape=(4,), reconstruction_mode='full',
              verbose=0, precision='highest')
    np.random.seed(42)
    single = TransformInvariantNMF(**kw)
    single.fit(V, solver='hals', n_iterations=6, sparsity_H=0.01)
    np.random.seed(42)
    sharded = TransformInvariantNMF(mesh=make_mesh(8), **kw)
    sharded.fit(V, solver='hals', n_iterations=6, sparsity_H=0.01)
    np.testing.assert_allclose(sharded.W, single.W, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(sharded.H, single.H, rtol=1e-9, atol=1e-12)
