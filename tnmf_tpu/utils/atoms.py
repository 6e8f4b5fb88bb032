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

__all__ = ['find_dead_atoms', 'revive_dead_atoms', 'atom_similarity',
           'match_dictionaries']


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

    Mesh-sharded models are supported as long as the factors are fully
    addressable (single-process meshes): the revival round-trips through
    host and re-places W/H with their original shardings, so the next fit
    chunk reuses the compiled sharded program.  Multi-process global
    arrays are rejected (the host round-trip would need a cross-process
    gather; revive between fits from gathered copies instead).
    """
    import jax

    for arr in (model._W, model._H):
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            raise RuntimeError(
                'revive_dead_atoms needs fully addressable factors; '
                'multi-process global W/H cannot be revived in place')
    dead = find_dead_atoms(model, rel_threshold)
    if dead.size == 0:
        return dead
    draw = rng if rng is not None else model._rng
    w_sharding = (model._W.sharding
                  if isinstance(model._W, jax.Array) else None)
    h_sharding = (model._H.sharding
                  if isinstance(model._H, jax.Array) else None)
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
    Wd = jnp.asarray(W, dtype=model._W.dtype)
    Hd = jnp.asarray(H, dtype=model._H.dtype)
    # restore the original placements so a following fit chunk hits the
    # same compiled sharded program (device_put with the captured sharding
    # is a no-op for plain single-device arrays)
    model._W = jax.device_put(Wd, w_sharding) if w_sharding else Wd
    model._H = jax.device_put(Hd, h_sharding) if h_sharding else Hd
    return dead


# ---------------------------------------------------------------------------
# dictionary comparison / recovery scoring
# ---------------------------------------------------------------------------

def _transform_variants(w: np.ndarray, transform_type: str):
    """All transformed copies of one atom ``w (C, *A)`` under the invariance
    group of ``transform_type`` (numpy mirror of ``ops.transforms.apply``)."""
    from ..ops.transforms import make_group
    group = make_group(transform_type, w.shape[1:])
    if group is None:
        return [w]
    out = []
    for k, flips in group.elements:
        x = w
        if k % 4:
            x = np.rot90(x, k, axes=(w.ndim - 2, w.ndim - 1))
        if flips:
            x = np.flip(x, axis=tuple(1 + a for a in flips))
        out.append(np.ascontiguousarray(x))
    return out


def atom_similarity(a: np.ndarray, b: np.ndarray,
                    transform_type: str = 'shift') -> float:
    """Transform-invariant similarity of two atoms in ``[0, 1]``.

    The maximum over all relative shifts (and, per ``transform_type``,
    flips/rotations) of the normalized cross-correlation
    ``<a, T(b)> / (||a|| ||b||)`` — 1.0 exactly when ``b`` is a scaled,
    shifted (and transformed) copy of ``a``; scale- and
    transform-invariant, channel-aware.  Atoms may have different shapes.
    """
    from scipy.signal import correlate

    a = np.asarray(a, np.float64)
    na = np.linalg.norm(a)
    best = 0.0
    for bt in _transform_variants(np.asarray(b, np.float64), transform_type):
        nb = np.linalg.norm(bt)
        if na == 0 or nb == 0:
            continue
        # full correlation over the spatial axes, channels aligned (summed)
        c = sum(correlate(a[ch], bt[ch], mode='full') for ch in range(a.shape[0]))
        best = max(best, float(np.max(c)) / (na * nb))
    return min(best, 1.0)


def match_dictionaries(W_a, W_b, transform_type: str = 'shift'):
    """Optimal one-to-one matching between two dictionaries.

    Builds the pairwise :func:`atom_similarity` matrix and solves the
    assignment problem (Hungarian algorithm), so the score is invariant to
    atom permutation, per-atom scale, shifts and — per ``transform_type``
    — flips/rotations: exactly the gauge freedoms of (transform-invariant)
    NMF.  The classic use is scoring ground-truth dictionary *recovery* on
    synthetic data (``utils.signals`` generators), or comparing two fits.

    Returns a dict with ``assignment`` (for each atom of ``W_a``, the
    matched index into ``W_b``; -1 when ``W_b`` has fewer atoms),
    ``scores`` (per matched pair) and ``score`` (their mean).  The
    reference offers no quantitative dictionary comparison at all (its
    examples eyeball atom plots).
    """
    from scipy.optimize import linear_sum_assignment

    W_a = [np.asarray(w) for w in W_a]
    W_b = [np.asarray(w) for w in W_b]
    S = np.zeros((len(W_a), len(W_b)))
    for i, wa in enumerate(W_a):
        for j, wb in enumerate(W_b):
            S[i, j] = atom_similarity(wa, wb, transform_type)
    rows, cols = linear_sum_assignment(-S)
    assignment = np.full(len(W_a), -1, dtype=int)
    assignment[rows] = cols
    scores = S[rows, cols]
    return {'assignment': assignment, 'scores': scores,
            'score': float(scores.mean()) if scores.size else 0.0,
            'similarity': S}
