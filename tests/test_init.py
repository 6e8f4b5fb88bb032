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


def test_utils_import_path_mirror():
    """`from tnmf.utils.X import Y` maps to `from tnmf_tpu.utils.X import Y`."""
    from tnmf_tpu.utils.data_loading import racoon_image  # noqa: F401
    from tnmf_tpu.utils.signals import generate_pulse_train  # noqa: F401
    # NOTE: a `tnmf_tpu.TransformInvariantNMF` module mirror is deliberately
    # NOT provided: a submodule of that name would shadow the class attribute
    # on the package (Python binds submodules onto the parent after import),
    # silently breaking `from tnmf_tpu import TransformInvariantNMF`.
    import tnmf_tpu
    assert isinstance(tnmf_tpu.TransformInvariantNMF, type)
