from . import conv, fft, inhibition, modes, oracle, transforms

__all__ = ['conv', 'fft', 'inhibition', 'modes', 'oracle', 'transforms']
