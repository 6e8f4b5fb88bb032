"""End-to-end learning quality: on synthetic data generated from a known
dictionary, the fit must recover the generating atoms (up to permutation
and shift) and reconstruct the input well. Golden-value tests pin numbers;
these pin *meaning*.

MU converges to local optima, so the recovery thresholds are deliberately
conservative; the seeds/configurations below were checked to be stable.
"""

import numpy as np

from tnmf_tpu import TransformInvariantNMF
from tnmf_tpu.utils.signals import generate_block_image, generate_pulse_train


def _best_cosine(learned, truth):
    """Max cosine similarity of a learned atom against any circular shift of
    any true atom (the model is shift-invariant, so recovery is defined up
    to translation)."""
    l = learned / (np.linalg.norm(learned) + 1e-12)
    best = -1.0
    for t in truth:
        t = t / (np.linalg.norm(t) + 1e-12)
        axes = tuple(range(l.ndim))
        corr = np.fft.ifftn(np.fft.fftn(l, axes=axes).conj()
                            * np.fft.fftn(t, axes=axes), axes=axes).real
        best = max(best, float(corr.max()))
    return best


def test_2d_patch_recovery():
    np.random.seed(42)
    image, W_true = generate_block_image(symbols=['+', 'x', 's'], symbol_size=8,
                                         n_symbols=6)
    V = image[np.newaxis]
    np.random.seed(7)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(8, 8),
                                reconstruction_mode='circular')
    nmf.fit(V, n_iterations=500, sparsity_H=0.1, inhibition_strength=0.1)
    truths = [w[0] for w in W_true]
    scores = [_best_cosine(nmf.W[i, 0], truths) for i in range(3)]
    assert min(scores) > 0.7, scores
    assert max(scores) > 0.95, scores


def test_2d_reconstruction_quality():
    np.random.seed(42)
    image, _ = generate_block_image(symbols=['+', 'x', 's'], symbol_size=8,
                                    n_symbols=4)
    V = image[np.newaxis]
    np.random.seed(42)
    nmf = TransformInvariantNMF(n_atoms=3, atom_shape=(8, 8),
                                reconstruction_mode='circular')
    nmf.fit(V, n_iterations=300, sparsity_H=0.05)
    rel = np.linalg.norm(nmf.V - nmf.R) / np.linalg.norm(nmf.V)
    assert rel < 0.15, rel


def test_1d_pulse_recovery():
    np.random.seed(42)
    signals = [generate_pulse_train(symbols=['nnn', 'vvv'], pulse_length=16,
                                    n_pulses=8)[0] for _ in range(4)]
    W_true = generate_pulse_train(symbols=['nnn', 'vvv'], pulse_length=16,
                                  n_pulses=1)[1]
    V = np.stack(signals)
    np.random.seed(7)
    nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(16,))
    nmf.fit(V, n_iterations=300, sparsity_H=0.05, inhibition_strength=0.05)

    scores = []
    for i in range(2):
        learned = nmf.W[i]
        best = -1.0
        for t in W_true:
            tn = t / np.linalg.norm(t)
            ln = learned / (np.linalg.norm(learned) + 1e-12)
            corr = np.fft.ifft(np.fft.fft(ln, axis=-1).conj()
                               * np.fft.fft(tn, axis=-1), axis=-1).real.sum(axis=0)
            best = max(best, float(corr.max()))
        scores.append(best)
    assert min(scores) > 0.9, scores
