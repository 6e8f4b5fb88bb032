"""Shift-invariant conv-NMF: racing MU, extrapolated MU and exact CD.

Under ``reconstruction_mode='full'`` (atoms strictly inside the sample —
the classic conv-NMF / sparse-coding formulation) two solvers cover the
full shift-invariant geometry:

* ``solver='mu'`` (default): Lee–Seung multiplicative updates — the
  reference's algorithm (``TransformInvariantNMF.py:136-179``) —
  optionally accelerated with ``extrapolate=True`` (multiplicative
  momentum with safeguard restarts);
* ``solver='hals'``: exact phase-blocked coordinate descent
  (:mod:`tnmf_tpu.engine_hals_conv`, round 5) — activations spaced one
  atom apart have disjoint footprints, so each of the
  ``prod(atom_shape)`` phases is an exact shared-Gram HALS block; W
  steps stay multiplicative and the iteration is monotone by
  construction.

This script plants sparse pulse activations, fits the same seeded
problem with all three solvers under ``record_energies=True``, plots the
energy trajectories (iteration- and wall-clock-indexed), and prints the
measured solver guidance: exact CD makes ~4x the per-iteration progress
of plain MU but costs more per sweep, so ``extrapolate=True`` is the
wall-clock recommendation and ``solver='hals'`` the exactness /
guaranteed-monotonicity option.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib  # noqa: E402

if os.environ.get('DISPLAY', '') == '' and os.environ.get('MPLBACKEND', '') == '':
    matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

from tnmf_tpu import TransformInvariantNMF  # noqa: E402

N_ITERATIONS = 15 if os.environ.get('TNMF_TPU_SMOKE') else 120
N_SAMPLES, SAMPLE_LEN, ATOM_LEN, N_ATOMS = 8, 120, 8, 6


def make_data(seed=0):
    """Sparse planted pulses: a ground-truth dictionary of random atoms
    placed at ~5%-dense shift positions, plus a little noise."""
    rng = np.random.default_rng(seed)
    W = rng.random((N_ATOMS, 1, ATOM_LEN))
    T = SAMPLE_LEN - ATOM_LEN + 1
    H = np.where(rng.random((N_SAMPLES, N_ATOMS, T)) > 0.95,
                 rng.random((N_SAMPLES, N_ATOMS, T)), 0.0)
    V = np.zeros((N_SAMPLES, 1, SAMPLE_LEN))
    for t in range(T):
        V[:, :, t:t + ATOM_LEN] += np.einsum('nm,mca->nca', H[:, :, t], W)
    return (V + 0.01 * rng.random(V.shape)).astype(np.float32)


def fit(V, label, **kw):
    np.random.seed(42)
    nmf = TransformInvariantNMF(n_atoms=N_ATOMS, atom_shape=(ATOM_LEN,),
                                reconstruction_mode='full')
    t0 = time.perf_counter()
    nmf.fit(V, n_iterations=N_ITERATIONS, record_energies=True, **kw)
    dt = time.perf_counter() - t0
    print(f'{label:16s} E: {nmf.energies_[0]:10.3f} -> '
          f'{nmf.energies_[-1]:8.3f}  ({dt:.2f} s)')
    return nmf.energies_, dt


def main():
    V = make_data()
    runs = {
        'MU': fit(V, 'MU'),
        'MU+extrapolate': fit(V, 'MU+extrapolate', extrapolate=True),
        "exact CD (hals)": fit(V, 'exact CD (hals)', solver='hals'),
    }

    # the exact solver is monotone by construction
    es_cd = runs['exact CD (hals)'][0]
    assert np.all(np.diff(es_cd) <= 1e-4 * es_cd[0]), 'CD must be monotone'

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4), sharey=True)
    for label, (es, dt) in runs.items():
        ax1.semilogy(es, label=label)
        ax2.semilogy(np.linspace(0, dt, len(es)), es, label=label)
    ax1.set_xlabel('iteration')
    ax2.set_xlabel('seconds (whole fit)')
    ax1.set_ylabel('energy')
    ax1.legend()
    fig.suptitle('Shift-invariant solvers: per-iteration vs wall-clock')
    fig.tight_layout()
    plt.show()


if __name__ == '__main__':
    main()
