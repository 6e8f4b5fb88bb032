from .multiscale import MultiScaleTNMF
from .sweep import SweepResult, sweep_fit
from .tnmf import MiniBatchAlgorithm, TransformInvariantNMF

__all__ = ['TransformInvariantNMF', 'MiniBatchAlgorithm', 'MultiScaleTNMF',
           'SweepResult', 'sweep_fit']
