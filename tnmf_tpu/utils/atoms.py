"""Dictionary-health utilities: detecting and reviving dead atoms.

Multiplicative updates have an absorbing state: once an atom's activation
map collapses to ~0 (common under strong sparsity — the MU numerator is
proportional to H itself), neither H nor the atom can ever grow back, and
the model silently runs with a smaller dictionary than requested.  The
reference library inherits this failure mode with no remedy
(``tnmf/TransformInvariantNMF.py:217-238``); here a revival pass between
fits re-draws the dead atoms and resets their activation maps, and
``fit(keep_W=True, keep_H=True)`` continues the trajectory with the full
dictionary live again::

    nmf.fit(V, n_iterations=200, sparsity_H=2.0)
    while revive_dead_atoms(nmf).size:
        nmf.fit(V, n_iterations=200, sparsity_H=2.0,
                keep_W=True, keep_H=True)

Detection is relative (an atom is dead when its total activation mass is
below ``rel_threshold`` times the mean atom mass), so it is scale-free in
both V magnitude and sample count.
"""

from typing import Optional

import numpy as np

__all__ = ['find_dead_atoms', 'revive_dead_atoms']


def _atom_mass(model) -> np.ndarray:
    """Total activation mass per canonical atom, summing over samples,
    shifts and (under a transform group) the atom's tied transform maps."""
    H = np.asarray(model._H_flat())
    g = model.n_transforms
    mass = H.sum(axis=(0,) + tuple(range(2, H.ndim)))  # (n_atoms * g,)
    return mass.reshape(model.n_atoms, g).sum(axis=1)


def find_dead_atoms(model, rel_threshold: float = 1e-4) -> np.ndarray:
    """Indices of atoms whose activation mass is below ``rel_threshold``
    times the mean atom mass of the last fit."""
    if model._H is None:
        raise RuntimeError('find_dead_atoms requires a fitted model')
    mass = _atom_mass(model)
    return np.flatnonzero(mass < rel_threshold * max(mass.mean(), 1e-30))


def revive_dead_atoms(model, rel_threshold: float = 1e-4,
                      rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Re-draw the dead atoms' dictionary entries and reset their
    activation maps; returns the revived atom indices.

    The replacement entries follow the model's init distribution
    (``1 - U[0, 1)``, sum-normalized — reference ``_Backend.py:83-98``) and
    are drawn from ``rng`` (default: the model's own RNG, so seeded models
    stay reproducible).  Alive atoms and their activations are untouched;
    refit with ``keep_W=True, keep_H=True`` to continue.
    """
    dead = find_dead_atoms(model, rel_threshold)
    if dead.size == 0:
        return dead
    draw = rng if rng is not None else model._rng
    W = np.asarray(model._W).copy()
    H = np.asarray(model._H).copy()
    atom_axes = tuple(range(-len(model.atom_shape), 0))
    g = model.n_transforms
    for m in dead:
        Wm = 1 - draw.random(W.shape[1:])
        W[m] = Wm / Wm.sum(axis=atom_axes, keepdims=True)
        H[:, m * g:(m + 1) * g] = 1 - draw.random(
            (H.shape[0], g) + H.shape[2:])
    import jax.numpy as jnp
    model._W = jnp.asarray(W, dtype=model._W.dtype)
    model._H = jnp.asarray(H, dtype=model._H.dtype)
    return dead
