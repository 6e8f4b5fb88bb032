"""Multi-scale dictionaries: atoms of different sizes in one model.

The reference library fixes a single ``atom_shape`` per model — data whose
structure lives at several scales (sharp spikes riding on broad waves)
forces a compromise atom size.  :class:`tnmf_tpu.MultiScaleTNMF` learns a
*tuple* of atom banks with independent shapes jointly, each with its own
activation tensor, optimized by exact block multiplicative updates against
the shared total reconstruction.

This example plants narrow spikes and broad Gaussian bumps in 1-D signals
and decomposes them with a (3-tap, 15-tap) dictionary pair: each planted
pulse is recovered in the bank of its native scale, and the per-scale
reconstructions separate the signal into its spike and wave components —
a decomposition no single-scale model expresses.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib  # noqa: E402

if os.environ.get('DISPLAY', '') == '' and os.environ.get('MPLBACKEND', '') == '':
    matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

from tnmf_tpu import MultiScaleTNMF  # noqa: E402

N_ITERATIONS = 200 if os.environ.get('TNMF_TPU_SMOKE') else 600


def main():
    rng = np.random.default_rng(0)
    narrow = np.array([0.2, 1.0, 0.2])
    broad = np.exp(-0.5 * ((np.arange(15) - 7) / 3.0) ** 2)
    V = np.zeros((6, 1, 80))
    for i in range(6):
        for at in rng.integers(0, 77, size=4):
            V[i, 0, at:at + 3] += narrow
        for at in rng.integers(0, 65, size=2):
            V[i, 0, at:at + 15] += broad

    model = MultiScaleTNMF(n_atoms=(1, 1), atom_shapes=((3,), (15,)), seed=1)
    # more sparsity pressure on the narrow bank: scale separation in conv
    # models is regularization-driven (narrow atoms could tile the bumps)
    model.fit(V, n_iterations=N_ITERATIONS, sparsity_H=(0.3, 0.05),
              record_energies=True)

    print(f'final energy: {model.energies_[-1]:.4f} '
          f'(from {model.energies_[0]:.4f})')
    for k, name in enumerate(('narrow', 'broad')):
        print(f'scale {k} ({name}): atoms {model.W[k].shape}, '
              f'activations {model.H[k].shape}')

    fig, axes = plt.subplots(3, 1, figsize=(10, 6), sharex=True)
    axes[0].plot(V[0, 0], 'k', lw=1)
    axes[0].set_title('signal (spikes + waves)')
    for k, (ax, name) in enumerate(zip(axes[1:], ('narrow-scale part',
                                                  'broad-scale part'))):
        ax.plot(model.R_scale(k)[0, 0], lw=1)
        ax.set_title(name)
    fig.tight_layout()

    fig2, ax2 = plt.subplots(1, 2, figsize=(8, 2.5))
    for k, (ax, truth, name) in enumerate(zip(
            ax2, (narrow, broad), ('3-tap atom', '15-tap atom'))):
        ax.plot(model.W[k][0, 0], label='learned')
        ax.plot(truth / truth.sum(), '--', label='planted (normalized)')
        ax.set_title(name)
        ax.legend(fontsize=7)
    fig2.tight_layout()
    plt.show()


if __name__ == '__main__':
    main()
