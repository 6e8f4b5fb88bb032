"""Package import smoke test (reference pattern: tnmf/tests/test_init.py)."""


def test_import():
    import tnmf_tpu
    assert hasattr(tnmf_tpu, 'TransformInvariantNMF')
    assert hasattr(tnmf_tpu, 'MiniBatchAlgorithm')
    assert len(tnmf_tpu.MiniBatchAlgorithm) == 5


def test_submodules():
    from tnmf_tpu import engine, parallel  # noqa: F401
    from tnmf_tpu.ops import conv, fft, inhibition, modes, oracle  # noqa: F401
    from tnmf_tpu.utils import data_loading, signals  # noqa: F401
