"""Drop-in import-path mirror of the reference package.

The reference exposes its model as ``tnmf.TransformInvariantNMF`` (module)
containing ``TransformInvariantNMF`` (class) and ``MiniBatchAlgorithm``;
this module mirrors that path so migrating code only swaps the package
name:

    from tnmf_tpu.TransformInvariantNMF import TransformInvariantNMF, MiniBatchAlgorithm
"""

from .models.tnmf import MiniBatchAlgorithm, TransformInvariantNMF, sliceNone

__all__ = ['TransformInvariantNMF', 'MiniBatchAlgorithm', 'sliceNone']
