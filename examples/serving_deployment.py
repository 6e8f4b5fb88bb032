"""Deploying a trained model: memory planning, checkpoints, and a
self-contained serving artifact.

The full production hand-off, end to end:

1. **Plan** the fit's device-memory footprint before allocating anything
   (``utils.memory.estimate_fit_memory`` — exact per-tensor sizes from
   ``jax.eval_shape`` on the engine's own operators) and pick a batch
   size for a budget (``suggest_batch_size``).
2. **Train** and **checkpoint** (``save``).
3. **Export** the frozen-dictionary encoding step as ONE portable
   StableHLO artifact (``export_serving`` / ``jax.export``): the
   dictionary, geometry and regularizer strengths bake in, the batch
   dimension stays symbolic, the iteration count stays a runtime knob,
   and ``include_decoder=True`` ships the reconstruction too — a
   complete codec in one file.
4. **Serve** it with ``load_serving`` — no model classes, no Python
   state, no RNG (the matched-filter H init is deterministic), any
   request batch size.

The reference can only pickle its Python objects together with the
library (SURVEY.md §5: no file checkpointing at all).
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tnmf_tpu import TransformInvariantNMF, load_serving  # noqa: E402
from tnmf_tpu.utils.memory import (estimate_fit_memory,  # noqa: E402
                                   suggest_batch_size)
from tnmf_tpu.utils.signals import generate_pulse_train  # noqa: E402

SMOKE = bool(os.environ.get('TNMF_TPU_SMOKE'))


def make_batch(n, seed):
    np.random.seed(seed)
    return np.stack([generate_pulse_train(pulse_length=16, n_pulses=4)[0]
                     for _ in range(n)])


def main():
    model = TransformInvariantNMF(n_atoms=4, atom_shape=(16,), seed=0,
                                  h_init='correlate')

    # -- 1. plan the memory before touching the device ------------------
    V = make_batch(24, seed=0)
    est = estimate_fit_memory(model, V.shape)
    print('predicted fit footprint:')
    print(est)
    budget = 2 * est.peak_bytes  # pretend budget: twice this fit
    n_max = suggest_batch_size(model, V.shape[2:], n_channels=V.shape[1],
                               budget_bytes=budget, safety=1.0)
    print(f'\nlargest batch within {budget / 2**20:.1f} MiB: {n_max} samples')

    # -- 2. train + checkpoint ------------------------------------------
    model.fit(V, n_iterations=50 if SMOKE else 500, sparsity_H=0.1)
    tmp = tempfile.mkdtemp()
    ckpt = os.path.join(tmp, 'model.npz')
    model.save(ckpt)
    print(f'\ncheckpoint: {ckpt} ({os.path.getsize(ckpt)} bytes)')

    # -- 3. export the serving artifact (encode + decode) ---------------
    artifact = os.path.join(tmp, 'encoder.tnmfsrv')
    model.export_serving(path=artifact, n_iterations=30 if SMOKE else 100,
                         sparsity_H=0.1, include_decoder=True)
    print(f'artifact:   {artifact} ({os.path.getsize(artifact)} bytes)')

    # -- 4. serve: no model classes needed from here on -----------------
    encoder = load_serving(artifact)
    print(f'artifact platforms: {encoder.platforms}')
    for n_req in (3, 7):  # symbolic batch: any request size, one program
        V_new = make_batch(n_req, seed=n_req)
        H = encoder.transform(V_new)
        R = encoder.inverse_transform(H)
        rel = float(((V_new - R) ** 2).sum() / (V_new ** 2).sum())
        print(f'request batch {n_req}: H {H.shape}, '
              f'relative reconstruction error {rel:.4f}')
        assert rel < 0.5
    # latency/quality knob without re-exporting
    H_fast = encoder.transform(make_batch(2, seed=9), n_iterations=5)
    print(f'fast path (5 iterations): H {H_fast.shape}')


if __name__ == '__main__':
    main()
