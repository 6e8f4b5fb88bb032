"""Transform invariances beyond shift: flip- and rotation-tied dictionaries.

The reference library supports shift invariance only and explicitly defers
"other transform types" to future work
(``/root/reference/tnmf/TransformInvariantNMF.py:65-69``).  This framework
implements them (``transform_type=`` on the model): each canonical atom is
tied across a finite set of mirror flips and/or quarter-turn rotations, with
one shift-activation map per (atom, transform) pair — see
:mod:`tnmf_tpu.ops.transforms`.

The demonstration plants ONE asymmetric L-shaped patch into 2-D samples in
all 8 of its dihedral (D4) orientations and compares:

* a shift-only model with a single atom — it can explain one orientation
  and mis-fits the other seven;
* a shift-only model with 8 atoms — it works, but has to learn 8 separate
  copies of the same shape (8x the dictionary, no parameter sharing);
* a ``shift+rot90+flip`` model with a single atom — one canonical patch,
  tied across its 8 transformed copies, matches the 8-atom fit with 1/8th
  of the dictionary.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib  # noqa: E402

if os.environ.get('DISPLAY', '') == '' and os.environ.get('MPLBACKEND', '') == '':
    matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

from tnmf_tpu import TransformInvariantNMF  # noqa: E402

# enough sparsity pressure that a degenerate single-pixel atom (which can
# re-draw anything through a dense H) is more expensive than learning the
# actual patch shape — that is what makes the comparison meaningful
SPARSITY = 0.2
N_ITERATIONS = 150 if os.environ.get('TNMF_TPU_SMOKE') else 500


def make_data(n_samples=16, size=32, seed=0):
    """Samples containing an asymmetric L-shaped patch in all 8 dihedral
    orientations at random positions."""
    rng = np.random.default_rng(seed)
    patch = np.zeros((5, 5))
    patch[:, 0] = 1.0   # vertical bar
    patch[-1, :3] = 0.6  # short foot: breaks every mirror/rotation symmetry
    patch[0, 1] = 0.3
    V = np.zeros((n_samples, 1, size, size))
    for i in range(n_samples):
        p = np.rot90(patch, k=i % 4)
        if (i // 4) % 2:
            p = np.flip(p, axis=-1)
        for _ in range(3):
            y, x = rng.integers(0, size - 5, size=2)
            V[i, 0, y:y + 5, x:x + 5] += p
    return V


def fit(V, n_atoms, transform_type):
    model = TransformInvariantNMF(
        n_atoms=n_atoms, atom_shape=(5, 5), transform_type=transform_type,
        seed=7, reconstruction_mode='valid')
    model.fit(V, n_iterations=N_ITERATIONS, sparsity_H=SPARSITY)
    return model


def main():
    V = make_data()
    runs = [
        ('shift, 1 atom', fit(V, 1, 'shift')),
        ('shift, 8 atoms', fit(V, 8, 'shift')),
        ('shift+rot90+flip, 1 atom', fit(V, 1, 'shift+rot90+flip')),
    ]
    for label, model in runs:
        n_params = model.W.size
        print(f'{label:28s} energy {model._energy_function():10.3f}   '
              f'dictionary parameters {n_params:4d}   H maps '
              f'{model.n_atoms * model.n_transforms}')

    tied = runs[2][1]
    fig, axes = plt.subplots(2, 8, figsize=(14, 4))
    W = tied.W[0, 0]
    from tnmf_tpu.ops import transforms as tr
    group = tr.make_group('shift+rot90+flip', (5, 5))
    for g, (elem, ax) in enumerate(zip(group.elements, axes[0])):
        copy = np.asarray(tr.apply(W[None, None], elem, 2, 2))[0, 0]
        ax.imshow(copy, cmap='viridis')
        ax.set_title(f'T{g}(atom)', fontsize=8)
        ax.axis('off')
    for g, ax in enumerate(axes[1]):
        ax.imshow(tied.H[0, 0, g], cmap='magma')
        ax.set_title(f'H[0, 0, {g}]', fontsize=8)
        ax.axis('off')
    fig.suptitle('One canonical atom, tied across the 8 dihedral transforms')
    fig.tight_layout()
    plt.show()


if __name__ == '__main__':
    main()
