"""Coverage of the utility layer: data loading (reference API surface) and
profiling hooks."""

import glob
import os

import numpy as np
import pytest

from tnmf_tpu import TransformInvariantNMF
from tnmf_tpu.utils.data_loading import racoon_image, synthetic_face
from tnmf_tpu.utils.profiling import IterationTimer, trace


def test_racoon_image_shapes_and_range():
    gray = racoon_image(gray=True)
    assert gray.ndim == 2
    assert 0.0 <= gray.min() and gray.max() <= 1.0
    rgb = racoon_image(gray=False)
    assert rgb.ndim == 3 and rgb.shape[2] == 3


def test_racoon_image_scale():
    full = racoon_image(gray=True)
    small = racoon_image(gray=True, scale=0.1)
    assert small.shape[0] <= full.shape[0] // 9
    assert 0.0 <= small.min() and small.max() <= 1.0


def test_synthetic_face_deterministic():
    a = synthetic_face(gray=False)
    b = synthetic_face(gray=False)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (768, 1024, 3)


def test_iteration_timer_records_and_aborts():
    V = np.random.default_rng(0).random((2, 1, 12, 12))

    inner_calls = []

    def inner(nmf, it):
        inner_calls.append(it)
        return it < 3  # abort after iteration 3

    timer = IterationTimer(inner=inner, record_energy=True)
    np.random.seed(0)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
    nmf.fit(V, n_iterations=50, progress_callback=timer)

    assert inner_calls == [0, 1, 2, 3]      # abort honored through the wrapper
    assert len(timer.times) == 4
    assert len(timer.energies) == 4
    assert timer.energies[-1] <= timer.energies[0]
    assert np.isfinite(timer.iterations_per_second)


def test_iteration_timer_single_sample_nan_rate():
    t = IterationTimer()
    assert np.isnan(t.iterations_per_second)


def test_trace_context_writes_profile(tmp_path):
    try:
        with trace(str(tmp_path)):
            np.random.seed(0)
            nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
            nmf.fit(np.random.default_rng(1).random((1, 1, 10, 10)), n_iterations=2)
    except Exception as e:  # pragma: no cover - profiler availability varies
        pytest.skip(f'jax.profiler unavailable here: {e!r}')
    produced = glob.glob(os.path.join(str(tmp_path), '**', '*'), recursive=True)
    assert produced, 'profiler produced no trace files'


def test_racoon_image_scale_without_pil(monkeypatch):
    """With PIL unavailable the loader falls back to stride subsampling."""
    import builtins
    real_import = builtins.__import__

    def no_pil(name, *a, **k):
        if name == 'PIL' or name.startswith('PIL.'):
            raise ImportError('PIL disabled for test')
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, '__import__', no_pil)
    img = racoon_image(gray=True, scale=0.5)
    full = racoon_image(gray=True, scale=1.0)
    assert img.shape[0] == -(-full.shape[0] // 2)
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_colored_patches_and_block_image_defaults():
    from tnmf_tpu.utils.signals import generate_block_image, generate_patch
    p = generate_patch('x', size=8, color='r')
    assert p.shape == (3, 8, 8)
    assert p[0].sum() > 0 and p[1].sum() == 0 and p[2].sum() == 0
    img, W = generate_block_image(symbol_size=6, n_symbols=3)
    assert img.shape == (3, 18, 18)
    assert W.shape[1:] == (3, 6, 6)
    assert np.all(img >= 0)
