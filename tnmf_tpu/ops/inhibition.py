"""Lateral-inhibition regularizer support.

The inhibition gradient is a separable multi-1D convolution of the activation
tensor H with small symmetric kernels ``1 - (i/(r+1))**2`` along each shift
axis, zero-padded at the boundary.  Mirrors the semantics of the reference's
``convolve_multi_1d`` (``/root/reference/tnmf/backends/_NumPyBackend.py:56-64``,
kernel construction at ``TransformInvariantNMF.py:163``), implemented here as
1-D ``lax.conv_general_dilated`` sweeps that XLA fuses into the surrounding
update step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp
from jax import lax


def inhibition_kernels(inhibition_range: Tuple[int, ...], dtype=np.float64) -> Tuple[np.ndarray, ...]:
    """Per-axis 1-D kernels ``1 - (i/(r+1))**2`` for i in [-r, r].

    A range of 0 yields the single-tap kernel [1.], matching the reference.
    """
    return tuple(
        (1.0 - (np.arange(-r, r + 1, dtype=dtype) / (r + 1)) ** 2)
        for r in inhibition_range
    )


def resolve_inhibition_range(
    inhibition_range: Optional[Union[int, Tuple[int, ...]]],
    atom_shape: Tuple[int, ...],
) -> Tuple[int, ...]:
    """Default: minimal range covering the atom size (reference
    ``TransformInvariantNMF.py:154-160``)."""
    if inhibition_range is None:
        return tuple(a - 1 for a in atom_shape)
    if isinstance(inhibition_range, int):
        return (inhibition_range,) * len(atom_shape)
    rng = tuple(int(r) for r in inhibition_range)
    if len(rng) != len(atom_shape):
        raise ValueError('inhibition_range must have one entry per atom axis')
    return rng


def convolve_multi_1d(
    arr: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    axes: Sequence[int],
) -> jnp.ndarray:
    """Sequential zero-padded 1-D convolutions along ``axes``.

    The kernels here are symmetric so convolution equals correlation; we use
    XLA's conv primitive (a correlation) directly.
    """
    assert len(kernels) == len(axes)
    out = arr
    for axis, kernel in zip(axes, kernels):
        axis = axis % out.ndim
        k = jnp.asarray(kernel, dtype=out.dtype)
        r = (k.shape[0] - 1) // 2
        moved = jnp.moveaxis(out, axis, -1)
        lead_shape = moved.shape[:-1]
        flat = moved.reshape((-1, 1, moved.shape[-1]))
        res = lax.conv_general_dilated(
            flat, k.reshape((1, 1, -1)),
            window_strides=(1,),
            padding=[(r, r)],
            dimension_numbers=('NCH', 'OIH', 'NCH'),
            preferred_element_type=out.dtype,
        )
        out = jnp.moveaxis(res.reshape(lead_shape + (res.shape[-1],)), -1, axis)
    return out


def inhibition_positive_term(
    H: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    n_shift_axes: int,
    inhibition: jnp.ndarray,
    cross_inhibition: jnp.ndarray,
    n_atoms: int,
    with_same_atom: bool,
    with_cross_atom: bool,
) -> jnp.ndarray:
    """Additional positive-gradient term for the H update.

    Mirrors ``TransformInvariantNMF.py:252-269``: the same-atom term subtracts
    H itself (an atom must not suppress its own activation), the cross-atom
    term broadcasts the atom-summed inhibition minus the own-atom
    contribution, scaled by 1/(n_atoms-1).
    """
    axes = tuple(range(-n_shift_axes, 0))
    g = convolve_multi_1d(H, kernels, axes)
    term = jnp.zeros_like(H)
    if with_same_atom:
        term = term + inhibition * (g - H)
    if with_cross_atom:
        cross = g.sum(axis=1, keepdims=True) - g
        term = term + (cross_inhibition / (n_atoms - 1)) * cross
    return term
