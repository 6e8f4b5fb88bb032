from . import conv, fft, inhibition, modes, oracle

__all__ = ['conv', 'fft', 'inhibition', 'modes', 'oracle']
