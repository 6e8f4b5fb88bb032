from .multiscale import MultiScaleTNMF
from .sweep import SweepResult, sweep_fit
from .tnmf import (MiniBatchAlgorithm, MiniBatchTransformInvariantNMF,
                   TransformInvariantNMF)

__all__ = ['TransformInvariantNMF', 'MiniBatchTransformInvariantNMF',
           'MiniBatchAlgorithm', 'MultiScaleTNMF',
           'SweepResult', 'sweep_fit']
