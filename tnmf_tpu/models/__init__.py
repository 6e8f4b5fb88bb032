from .tnmf import MiniBatchAlgorithm, TransformInvariantNMF

__all__ = ['TransformInvariantNMF', 'MiniBatchAlgorithm']
