"""Multi-scale dictionaries (per-scale atom banks; models/multiscale.py).

No reference counterpart: the reference fixes one ``atom_shape`` per model
(``TransformInvariantNMF.py:110``).  Pinned here:

* full-fit trajectories against an independent NumPy oracle multi-scale MU
  driver (strategies, modes, beta in {2, 1}, masks),
* the degenerate case: a single-scale MultiScaleTNMF reproduces
  TransformInvariantNMF exactly (same RNG stream, same updates),
* monotone energy descent and scale-additivity of the reconstruction,
* the capability: two-scale data fits far better with a two-scale
  dictionary than with either single scale at matched parameter count,
* save/load, serving, error paths.
"""

import numpy as np
import pytest

from tnmf_tpu.models.multiscale import MultiScaleTNMF
from tnmf_tpu.models.tnmf import MiniBatchAlgorithm, TransformInvariantNMF
from tnmf_tpu.ops import beta as beta_ops
from tnmf_tpu.ops import oracle

EPS = 1e-9


def _oracle_ms_fit(V, n_atoms, shapes, mode, beta, n_iterations, seed,
                   sparsities, M=None):
    rng = np.random.default_rng(seed)
    Hs = [1 - rng.random((V.shape[0], m) + oracle.transform_shape(mode, V.shape[2:], a))
          for m, a in zip(n_atoms, shapes)]
    Ws = []
    for m, a in zip(n_atoms, shapes):
        Wk = 1 - rng.random((m, V.shape[1]) + a)
        Wk /= Wk.sum(axis=tuple(range(-len(a), 0)), keepdims=True)
        Ws.append(Wk)
    Mb = None if M is None else np.broadcast_to(M, V.shape)

    def total_R():
        return sum(oracle.reconstruct(Wk, Hk, mode) for Wk, Hk in zip(Ws, Hs))

    def factors():
        A, B = beta_ops.np_factors(V, total_R(), beta)
        if Mb is not None:
            A, B = A * Mb, B * Mb
        return A, B

    for _ in range(n_iterations):
        A, B = factors()
        for k, (Wk, a, sp) in enumerate(zip(Ws, shapes, sparsities)):
            Hs[k] = Hs[k] * oracle.corr_H(A, Wk, mode) / (
                oracle.corr_H(B, Wk, mode) + EPS + sp)
        A, B = factors()
        for k, (Hk, a) in enumerate(zip(Hs, shapes)):
            Wk = Ws[k] * oracle.corr_W(A, Hk, mode, a) / (
                oracle.corr_W(B, Hk, mode, a) + EPS)
            s = Wk.sum(axis=tuple(range(-len(a), 0)), keepdims=True)
            Ws[k] = Wk / np.where(s == 0, 1, s)
    return Ws, Hs


def _data(seed=0, n=3, c=2, sample=(15,)):
    rng = np.random.default_rng(seed)
    return rng.random((n, c) + sample) + 0.05


@pytest.mark.parametrize('backend', ['jax_conv', 'jax_fft'])
@pytest.mark.parametrize('mode', ['valid', 'full', 'circular'])
def test_fit_matches_oracle(backend, mode):
    V = _data(seed=5)
    m = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3,), (6,)), seed=7,
                       backend=backend, reconstruction_mode=mode,
                       precision='highest')
    m.fit(V, n_iterations=5, sparsity_H=(0.02, 0.05))
    Ws, Hs = _oracle_ms_fit(V, (2, 2), ((3,), (6,)), mode, 2.0, 5, 7,
                            (0.02, 0.05))
    for k in range(2):
        np.testing.assert_allclose(m.W[k], Ws[k], rtol=1e-7)
        np.testing.assert_allclose(m.H[k], Hs[k], rtol=1e-7)


@pytest.mark.parametrize('beta', [1.0, 0.5])
def test_beta_and_mask_match_oracle(beta):
    V = _data(seed=6, c=1)
    M = (np.random.default_rng(8).random(V.shape) > 0.3).astype(np.float64)
    m = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (7,)), seed=9,
                       backend='jax_conv', beta_loss=beta, precision='highest')
    m.fit(V, n_iterations=4, mask=M)
    Ws, Hs = _oracle_ms_fit(V, (2, 1), ((3,), (7,)), 'valid', beta, 4, 9,
                            (0.0, 0.0), M=M)
    for k in range(2):
        np.testing.assert_allclose(m.W[k], Ws[k], rtol=1e-6)
        np.testing.assert_allclose(m.H[k], Hs[k], rtol=1e-6)


def test_single_scale_equals_reference_model():
    """K = 1 must reproduce TransformInvariantNMF bit-for-bit: identical
    RNG stream (H then W) and identical updates."""
    V = _data(seed=11)
    ms = MultiScaleTNMF(n_atoms=(3,), atom_shapes=((4,),), seed=4,
                        backend='jax_conv')
    ms.fit(V, n_iterations=6, sparsity_H=0.1)
    single = TransformInvariantNMF(n_atoms=3, atom_shape=(4,), seed=4,
                                   backend='jax_conv')
    single.fit_batch(V, n_iterations=6, sparsity_H=0.1)
    np.testing.assert_array_equal(ms.W[0], single.W)
    np.testing.assert_array_equal(ms.H[0], single.H)


def test_energy_decreases_and_scales_add():
    V = _data(seed=12, sample=(12, 12), c=1)
    m = MultiScaleTNMF(n_atoms=(3, 2), atom_shapes=((3, 3), (6, 6)), seed=5)
    m.fit(V, n_iterations=15, record_energies=True)
    e = np.asarray(m.energies_)
    assert e.shape == (15,)
    assert np.all(np.diff(e) <= 1e-6 * e[0])  # monotone descent
    np.testing.assert_allclose(m.R_scale(0) + m.R_scale(1), m.R, rtol=1e-6)


def test_recovers_planted_atoms_at_native_scales():
    """Signals = narrow spikes + broad bumps, one atom per scale.  The fit
    must recover each planted pulse in the bank of its native scale
    (shift-aligned cosine similarity).  Note a single wide-atom dictionary
    is representationally complete for this data (and a narrow bank can
    tile the bump), so raw energy cannot discriminate — native-scale
    recovery and dictionary compactness are the capability."""
    rng = np.random.default_rng(0)
    narrow = np.array([0.2, 1.0, 0.2])
    broad = np.exp(-0.5 * ((np.arange(15) - 7) / 3.0) ** 2)
    V = np.zeros((6, 1, 60))
    for i in range(6):
        for at in rng.integers(0, 57, size=3):
            V[i, 0, at:at + 3] += narrow
        for at in rng.integers(0, 45, size=2):
            V[i, 0, at:at + 15] += broad
    ms = MultiScaleTNMF(n_atoms=(1, 1), atom_shapes=((3,), (15,)), seed=1)
    # stronger sparsity pressure on the narrow bank discourages it from
    # tiling the broad bump (scale identifiability is regularization-driven)
    ms.fit(V, n_iterations=400, sparsity_H=(0.3, 0.05))

    def aligned_cos(w, truth):
        w, truth = w.ravel(), truth.ravel()
        padded = np.concatenate([np.zeros(len(truth)), w, np.zeros(len(truth))])
        c = np.correlate(padded, truth)
        return float(c.max() / (np.linalg.norm(w) * np.linalg.norm(truth)))

    assert aligned_cos(ms.W[0][0, 0], narrow) > 0.9
    assert aligned_cos(ms.W[1][0, 0], broad) > 0.55


def test_save_load_and_serving(tmp_path):
    V = _data(seed=13, c=1)
    m = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3,), (6,)), seed=6)
    m.fit(V, n_iterations=5)
    p = str(tmp_path / 'ms')
    m.save(p, include_H=True)
    m2 = MultiScaleTNMF.load(p + '.npz')
    for k in range(2):
        np.testing.assert_allclose(m2.W[k], m.W[k])
    # include_H restores activations AND plans: R / R_scale / the full
    # reconstruction work immediately after load, matching the fit state
    np.testing.assert_allclose(np.asarray(m2.R), np.asarray(m.R),
                               rtol=1e-6)
    for k in range(2):
        np.testing.assert_allclose(m2.H[k], m.H[k], rtol=1e-7)
    np.testing.assert_allclose(m2.inverse_transform(), m.R, rtol=1e-6)
    H = m2.transform(V, n_iterations=4)
    assert len(H) == 2 and H[0].shape[0] == V.shape[0]
    # the dictionary stayed frozen during serving
    for k in range(2):
        np.testing.assert_allclose(m2.W[k], m.W[k], rtol=1e-12)


def test_tol_early_stopping():
    """fit(tol=) mirrors the single-scale semantics: a loose tol stops at a
    block boundary and the result equals a plain fit truncated there; tol=0
    never triggers and reproduces the fixed-iteration fit exactly."""
    V = _data(seed=21, sample=(12, 12), c=1)
    kw = dict(n_atoms=(2, 2), atom_shapes=((3, 3), (5, 5)), seed=3)

    loose = MultiScaleTNMF(**kw)
    loose.fit(V, n_iterations=60, tol=5e-3, tol_check_every=5)
    n_done = loose.n_iterations_
    assert 5 <= n_done < 60 and n_done % 5 == 0
    plain = MultiScaleTNMF(**kw)
    plain.fit(V, n_iterations=n_done)
    for k in range(2):
        np.testing.assert_allclose(loose.W[k], plain.W[k], rtol=1e-6)
        np.testing.assert_allclose(loose.H[k], plain.H[k], rtol=1e-6)

    z = MultiScaleTNMF(**kw)
    z.fit(V, n_iterations=8, tol=0.0)
    full = MultiScaleTNMF(**kw)
    full.fit(V, n_iterations=8)
    assert z.n_iterations_ == 8
    for k in range(2):
        np.testing.assert_allclose(z.W[k], full.W[k], rtol=1e-7)

    # tol + record_energies: the trace comes out of the same on-device
    # loop, trimmed to the iterations actually run, with an unchanged
    # trajectory
    r = MultiScaleTNMF(**kw)
    r.fit(V, n_iterations=8, tol=0.0, record_energies=True)
    assert r.energies_.shape == (8,)
    assert np.isfinite(r.energies_).all()
    for k in range(2):
        np.testing.assert_allclose(r.W[k], full.W[k], rtol=1e-7)

    with pytest.raises(ValueError, match='cannot combine'):
        MultiScaleTNMF(**kw).fit(V, tol=1e-3,
                                 progress_callback=lambda m, i: True)


def test_callback_path_matches_fused_loop():
    """The per-step Python path (progress_callback) must produce the same
    trajectory as the fused on-device loop, and honor early abort."""
    V = _data(seed=14, c=1)
    m1 = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (6,)), seed=7)
    m1.fit(V, n_iterations=5, sparsity_H=0.05)
    seen = []
    m2 = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (6,)), seed=7)
    m2.fit(V, n_iterations=5, sparsity_H=0.05, record_energies=True,
           progress_callback=lambda model, it: seen.append(it) or True)
    assert seen == list(range(5)) and len(m2.energies_) == 5
    for k in range(2):
        np.testing.assert_allclose(m1.W[k], m2.W[k], rtol=1e-10)
        np.testing.assert_allclose(m1.H[k], m2.H[k], rtol=1e-10)
    np.testing.assert_allclose(m2.energies_[-1], m2._energy_function(),
                               rtol=1e-6)
    # abort after 2 iterations
    m3 = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (6,)), seed=7)
    m3.fit(V, n_iterations=5, progress_callback=lambda model, it: it < 1)
    m4 = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (6,)), seed=7)
    m4.fit(V, n_iterations=2)
    for k in range(2):
        np.testing.assert_allclose(m3.W[k], m4.W[k], rtol=1e-10)


def test_dtype_and_backend_aliases(tmp_path):
    V = _data(seed=15, c=1).astype(np.float32)
    m = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((4,),), seed=8,
                       dtype='bfloat16', backend='jax')
    m.fit(V, n_iterations=3)
    import jax.numpy as jnp
    assert m._Ws[0].dtype == jnp.bfloat16
    p = str(tmp_path / 'bf16')
    m.save(p, include_H=True)  # bf16 widened to f32 in the npz
    m2 = MultiScaleTNMF.load(p + '.npz')
    assert np.isfinite(m2.W[0]).all()
    # reference backend names map onto strategies
    m3 = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((4,),), seed=8,
                        backend='numpy_fft')
    m3.fit(V, n_iterations=2)
    assert m3._strategies == ('fft',)
    with pytest.raises(KeyError):
        MultiScaleTNMF(n_atoms=(2,), atom_shapes=((4,),),
                       backend='nope').fit(V, n_iterations=1)


def test_minibatch_cyclic_equals_full_batch():
    """Cyclic_MU over sequential slices IS full-batch MU (per-batch H
    updates have no cross-sample term, and the W statistics are summed
    over all batches) — the identity the reference pins at
    test_minibatch.py:19-20, here for the joint multi-scale updates."""
    V = _data(seed=4, n=4)
    ms_mb = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3,), (6,)), seed=3)
    ms_mb.fit_minibatches(V, algorithm=MiniBatchAlgorithm.Cyclic_MU,
                          batch_size=2, n_epochs=4)
    ms_fb = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3,), (6,)), seed=3)
    ms_fb.fit(V, n_iterations=4)
    for a, b in zip(ms_mb.W, ms_fb.W):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7)
    for a, b in zip(ms_mb.H, ms_fb.H):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7)


def test_minibatch_k1_equals_single_scale_model():
    """One scale + the same seed must reproduce the single-scale model's
    minibatch trajectory (same init stream, same shuffle consumption)."""
    V = _data(seed=9, n=6, c=1)
    ms = MultiScaleTNMF(n_atoms=(3,), atom_shapes=((4,),), seed=11)
    ms.fit_minibatches(V, algorithm=MiniBatchAlgorithm.ASG_MU,
                       batch_size=2, n_epochs=3)
    single = TransformInvariantNMF(n_atoms=3, atom_shape=(4,), seed=11)
    single.fit_minibatches(V, algorithm=MiniBatchAlgorithm.ASG_MU,
                           batch_size=2, n_epochs=3)
    np.testing.assert_allclose(ms.W[0], single.W, rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(ms.H[0], single.H, rtol=2e-5, atol=1e-8)


@pytest.mark.parametrize('algorithm', list(MiniBatchAlgorithm))
def test_minibatch_algorithms_decrease_energy(algorithm):
    V = _data(seed=6, n=4)
    ms = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (7,)), seed=1)
    ms.fit_minibatches(V, algorithm=algorithm, batch_size=3, n_epochs=4,
                       sparsity_H=(0.05, 0.0), record_energies=True)
    e = np.asarray(ms.energies_)
    assert e.shape == (4,) and np.all(np.isfinite(e))
    assert e[-1] < e[0]  # multiplicative updates make progress
    for Wk, a in zip(ms.W, ms.atom_shapes):
        shape_axes = tuple(range(-len(a), 0))
        np.testing.assert_allclose(Wk.sum(axis=shape_axes), 1.0, rtol=1e-5)


def test_minibatch_callback_and_mask():
    V = _data(seed=2, n=4)
    M = np.ones_like(V)
    M[:, :, :4] = 0.0
    Vg = V.copy()
    Vg[:, :, :4] = 50.0  # masked-out garbage must not matter
    seen = []

    def cb(model, epoch):
        seen.append(epoch)
        return epoch < 1

    a = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),), seed=5)
    a.fit_minibatches(V, batch_size=2, n_epochs=50, mask=M,
                      progress_callback=cb)
    assert seen == [0, 1]
    b = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),), seed=5)
    b.fit_minibatches(Vg, batch_size=2, n_epochs=2, mask=M)
    c = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),), seed=5)
    c.fit_minibatches(V, batch_size=2, n_epochs=2, mask=M)
    for x, y in zip(b.W, c.W):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-9)


def test_stream_carries_dictionary_and_mesh_minibatch_guard():
    V = _data(seed=8, n=9, c=1)
    ms = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),), seed=4)
    ms.fit_stream(iter(V), subsample_size=3, n_iterations=3)
    W_after = ms.W[0].copy()
    # keep_W carried the bank across subsamples; a fresh single-chunk fit
    # from the same seed differs (it saw only the first chunk's init)
    assert np.all(np.isfinite(W_after))
    ms.fit_stream(iter(V), subsample_size=4, max_subsamples=1,
                  n_iterations=2)
    assert ms.H[0].shape[0] == 4  # last chunk's activations

    import jax
    if jax.device_count() >= 2:
        from tnmf_tpu.parallel import make_mesh
        msm = MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),), seed=4,
                             mesh=make_mesh(2))
        # minibatch under a mesh is allowed for any batch size
        # (correctness via GSPMD resharding; parity test below)
        msm.fit_minibatches(_data(seed=8, n=4, c=1), batch_size=3,
                            n_epochs=1)
        assert all(np.isfinite(w).all() for w in msm.W)


def test_mesh_minibatch_parity():
    """Sample-sharded multi-scale minibatch fits equal single-device
    (round 5: the mesh guard became a shard-alignment requirement)."""
    import jax
    if jax.device_count() < 8:
        pytest.skip('needs 8 (virtual) devices')
    from tnmf_tpu.parallel import make_mesh
    V = _data(seed=21, n=16, c=1)
    kw = dict(n_atoms=(2, 1), atom_shapes=((3,), (6,)), seed=9)
    # batch_size=6 does NOT divide the mesh size: parity must hold
    # through GSPMD's per-batch resharding too
    fit_kw = dict(algorithm=MiniBatchAlgorithm.ASG_MU, batch_size=6,
                  n_epochs=2, sparsity_H=0.05)
    m1 = MultiScaleTNMF(**kw)
    m1.fit_minibatches(V, **fit_kw)
    m2 = MultiScaleTNMF(mesh=make_mesh(8), **kw)
    m2.fit_minibatches(V, **fit_kw)
    for k in range(2):
        np.testing.assert_allclose(m1.W[k], m2.W[k], rtol=1e-7)
        np.testing.assert_allclose(m1.H[k], m2.H[k], rtol=1e-7)
    # partial_fit (online) under the mesh matches too
    p1 = MultiScaleTNMF(**kw)
    p2 = MultiScaleTNMF(mesh=make_mesh(8), **kw)
    for m in (p1, p2):
        m.partial_fit(V[:8])
        m.partial_fit(V[8:])
    for k in range(2):
        np.testing.assert_allclose(p1.W[k], p2.W[k], rtol=1e-7)


def test_mesh_parity():
    """Data-parallel multi-scale fit matches single-device execution."""
    from tnmf_tpu.parallel import make_mesh
    V = _data(seed=16, n=8, c=1)
    M = (np.random.default_rng(17).random(V.shape) > 0.3).astype(np.float64)
    m1 = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (6,)), seed=9)
    m1.fit(V, n_iterations=5, mask=M)
    m2 = MultiScaleTNMF(n_atoms=(2, 1), atom_shapes=((3,), (6,)), seed=9,
                        mesh=make_mesh())
    m2.fit(V, n_iterations=5, mask=M)
    for k in range(2):
        np.testing.assert_allclose(m1.W[k], m2.W[k], rtol=1e-7)
        np.testing.assert_allclose(m1.H[k], m2.H[k], rtol=1e-7)
    with pytest.raises(ValueError, match='divisible'):
        MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),),
                       mesh=make_mesh()).fit(_data(seed=1, n=3, c=1),
                                             n_iterations=1)


def test_error_paths():
    with pytest.raises(ValueError, match='equal-length'):
        MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,), (5,)))
    with pytest.raises(ValueError, match='share one rank'):
        MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3,), (5, 5)))
    m = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3,), (5,)))
    with pytest.raises(ValueError, match='nonnegative'):
        m.fit(_data(seed=1), n_iterations=1, mask=-np.ones((3, 2, 15)))
    with pytest.raises(RuntimeError, match='fitted model'):
        MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),)).transform(_data())


def test_multiscale_sharded_checkpoint_roundtrip(tmp_path):
    """save_sharded/load_sharded: per-scale banks with shardings preserved,
    incl. the async (block=False) mode and mesh restore."""
    import jax
    from tnmf_tpu.parallel.sharding import DATA_AXIS, make_mesh

    V = np.random.default_rng(0).random((8, 1, 12, 12))
    m = MultiScaleTNMF(n_atoms=(2, 2), atom_shapes=((3, 3), (5, 5)), seed=0)
    m.fit(V, n_iterations=2)
    Ws0 = [w.copy() for w in m.W]
    Hs0 = [np.asarray(h).copy() for h in m._Hs]

    p = str(tmp_path / 'ms_ckpt')
    m.save_sharded(p, block=False)
    m.fit(V, n_iterations=2, keep_W=True)  # mutate while writing
    m.wait_for_checkpoints()

    local = MultiScaleTNMF.load_sharded(p)
    for k in range(2):
        np.testing.assert_array_equal(np.asarray(local._Ws[k]), Ws0[k])
        np.testing.assert_array_equal(np.asarray(local._Hs[k]), Hs0[k])
    assert local.R.shape == V.shape  # plans restored

    if jax.device_count() >= 8:
        mesh = make_mesh(8)
        sharded = MultiScaleTNMF.load_sharded(p, mesh=mesh)
        assert sharded._Hs[0].sharding.spec[0] == DATA_AXIS
        np.testing.assert_array_equal(np.asarray(sharded._Ws[0]), Ws0[0])
        # warm restart on the mesh from the restored banks
        sharded.fit(V, n_iterations=1, keep_W=True)
        assert np.isfinite(sharded._energy_function())

    with pytest.raises(ValueError, match='has not been fit'):
        MultiScaleTNMF(n_atoms=(2,), atom_shapes=((3,),)).save_sharded(
            str(tmp_path / 'nope'))


# ---------------------------------------------------------------------------
# phased lowering (round 5: strategies resolve per scale like single-scale)
# ---------------------------------------------------------------------------

@pytest.fixture
def force_phased(monkeypatch):
    """Force the TPU-only platform gate on (the compiled program is the
    same one TPU runs; CPU float64 pins the numerics)."""
    from tnmf_tpu import engine
    monkeypatch.setattr(engine, '_phased_platform_ok', lambda: True)


def _phased_pair(force=True, **fit_kw):
    """Same seeded problem fit under 'auto' (-> phased when forced) and
    under the explicit conv strategy."""
    V = _data(seed=3, n=2, c=1, sample=(24, 24))
    kw = dict(n_atoms=(3, 2), atom_shapes=((9, 9), (5, 5)), seed=7,
              precision='highest')
    ph = MultiScaleTNMF(backend='auto', **kw)
    ph.fit(V, n_iterations=5, sparsity_H=(0.02, 0.01), **fit_kw)
    cv = MultiScaleTNMF(backend='jax_conv', **kw)
    cv.fit(V, n_iterations=5, sparsity_H=(0.02, 0.01), **fit_kw)
    return V, ph, cv


def test_multiscale_phased_resolves_and_matches_conv(force_phased):
    V, ph, cv = _phased_pair()
    assert 'phased' in ph._strategies, ph._strategies
    for k in range(2):
        np.testing.assert_allclose(ph.W[k], cv.W[k], rtol=1e-9)
        np.testing.assert_allclose(ph.H[k], cv.H[k], rtol=1e-9)
    np.testing.assert_allclose(ph.R, cv.R, rtol=1e-9)
    np.testing.assert_allclose(ph.R_scale(0), cv.R_scale(0), rtol=1e-9)


def test_multiscale_phased_tol_trace_matches_conv(force_phased):
    V, ph, cv = _phased_pair(record_energies=True, tol=0.0,
                             tol_check_every=2)
    assert 'phased' in ph._strategies
    assert ph.energies_.shape == (5,)
    np.testing.assert_allclose(ph.energies_, cv.energies_, rtol=1e-9)


def test_multiscale_phased_energy_trace(force_phased):
    V, ph, cv = _phased_pair(record_energies=True)
    assert 'phased' in ph._strategies
    np.testing.assert_allclose(ph.energies_, cv.energies_, rtol=1e-9)


def test_multiscale_phased_minibatch_and_partial_fit(force_phased):
    V = _data(seed=4, n=6, c=1, sample=(24, 24))
    kw = dict(n_atoms=(2, 2), atom_shapes=((9, 9), (5, 5)), seed=5,
              precision='highest')
    ph = MultiScaleTNMF(backend='auto', **kw)
    ph.fit_minibatches(V, algorithm=MiniBatchAlgorithm.Cyclic_MU,
                       batch_size=3, n_epochs=2)
    assert 'phased' in ph._strategies
    cv = MultiScaleTNMF(backend='jax_conv', **kw)
    cv.fit_minibatches(V, algorithm=MiniBatchAlgorithm.Cyclic_MU,
                       batch_size=3, n_epochs=2)
    for k in range(2):
        np.testing.assert_allclose(ph.W[k], cv.W[k], rtol=1e-8)
        np.testing.assert_allclose(ph.H[k], cv.H[k], rtol=1e-8)

    ph2 = MultiScaleTNMF(backend='auto', **kw)
    cv2 = MultiScaleTNMF(backend='jax_conv', **kw)
    for m in (ph2, cv2):
        m.partial_fit(V[:3])
        m.partial_fit(V[3:])
    assert 'phased' in ph2._strategies
    for k in range(2):
        np.testing.assert_allclose(ph2.W[k], cv2.W[k], rtol=1e-8)


def test_multiscale_phased_mesh_parity(force_phased):
    """Sample-sharded phased multiscale matches single-device (the encode
    happens inside jit; GSPMD shards the phase-blocked carry's sample
    axis)."""
    from tnmf_tpu.parallel import make_mesh
    V = _data(seed=16, n=8, c=1, sample=(24, 24))
    kw = dict(n_atoms=(2, 2), atom_shapes=((9, 9), (5, 5)), seed=9,
              precision='highest')
    m1 = MultiScaleTNMF(**kw)
    m1.fit(V, n_iterations=4)
    assert 'phased' in m1._strategies
    m2 = MultiScaleTNMF(mesh=make_mesh(), **kw)
    m2.fit(V, n_iterations=4)
    for k in range(2):
        np.testing.assert_allclose(m1.W[k], m2.W[k], rtol=1e-7)
        np.testing.assert_allclose(m1.H[k], m2.H[k], rtol=1e-7)


def test_multiscale_phased_serving_roundtrip(force_phased, tmp_path):
    """Artifacts exported from a phased-strategy model serve the same
    encodings as the conv-strategy export."""
    from tnmf_tpu.serving import load_serving
    V, ph, cv = _phased_pair()
    assert 'phased' in ph._strategies
    pa = tmp_path / 'ph.tnmfsrv'
    ca = tmp_path / 'cv.tnmfsrv'
    ph.export_serving(str(pa), n_iterations=3, include_decoder=True)
    cv.export_serving(str(ca), n_iterations=3, include_decoder=True)
    sp, sc = load_serving(str(pa)), load_serving(str(ca))
    Hp, Hc = sp.transform(V), sc.transform(V)
    for k in range(2):
        np.testing.assert_allclose(np.asarray(Hp[k]), np.asarray(Hc[k]),
                                   rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sp.inverse_transform(Hp)),
                               np.asarray(sc.inverse_transform(Hc)),
                               rtol=1e-9)
