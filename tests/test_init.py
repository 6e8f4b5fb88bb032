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


def test_reference_import_path_mirror():
    """`from tnmf.X import Y` maps to `from tnmf_tpu.X import Y`."""
    from tnmf_tpu.TransformInvariantNMF import (MiniBatchAlgorithm,  # noqa: F401
                                                TransformInvariantNMF)
    from tnmf_tpu.utils.data_loading import racoon_image  # noqa: F401
    from tnmf_tpu.utils.signals import generate_pulse_train  # noqa: F401
    assert TransformInvariantNMF is not None
