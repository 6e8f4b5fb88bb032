"""Online (out-of-core) dictionary learning with ``partial_fit``.

A ground-truth pulse dictionary generates an endless stream of signal
batches; the model never sees more than one batch at a time (the sklearn
``MiniBatchNMF`` protocol — no reference counterpart: the reference's
closest facility, ``fit_stream``, requires handing over an iterator up
front, whereas ``partial_fit`` is caller-driven).  After the stream, the
learned dictionary is evaluated by encoding HELD-OUT data with the
dictionary frozen (``transform``) — the online-learned atoms should
explain unseen signals nearly as well as a full-batch fit that was
allowed to hold all the data in memory at once.

Also shown: chunked serving — ``transform(batch_size=...)`` encodes a
dataset in exact independent chunks, for activation tensors too large
for device memory.
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
from tnmf_tpu.utils.signals import generate_pulse_train  # noqa: E402

SMOKE = bool(os.environ.get('TNMF_TPU_SMOKE'))
N_BATCHES = 10 if SMOKE else 60
BATCH_SIZE = 4
PULSE_LENGTH = 20


def make_batch(n):
    """One batch of multi-channel pulse-train signals from the shared
    ground-truth pulse shapes (the stream source)."""
    signals = [generate_pulse_train(pulse_length=PULSE_LENGTH, n_pulses=4)[0]
               for _ in range(n)]
    return np.stack(signals)


def heldout_error(model, V):
    model.transform(V, n_iterations=100 if SMOKE else 300)
    R = model.inverse_transform()
    return float(np.square(V - R).sum() / np.square(V).sum())


def main():
    np.random.seed(42)
    V_heldout = make_batch(8)

    # --- online learning: one batch at a time, nothing retained ---------
    online = TransformInvariantNMF(n_atoms=3, atom_shape=(PULSE_LENGTH,),
                                   seed=0)
    errs = []
    for step in range(N_BATCHES):
        online.partial_fit(make_batch(BATCH_SIZE), sag_lambda=0.2,
                           sparsity_H=0.05)
        if step % 5 == 0 or step == N_BATCHES - 1:
            errs.append((step + 1, heldout_error(online, V_heldout)))
            print(f'step {step + 1:3d}: held-out relative error '
                  f'{errs[-1][1]:.4f}')

    # --- the in-memory ceiling: a full-batch fit on ALL the data --------
    V_all = make_batch(N_BATCHES * BATCH_SIZE)
    full = TransformInvariantNMF(n_atoms=3, atom_shape=(PULSE_LENGTH,),
                                 seed=0)
    full.fit(V_all, n_iterations=100 if SMOKE else 500, sparsity_H=0.05)
    e_full = heldout_error(full, V_heldout)
    e_online = errs[-1][1]
    print(f'held-out error — online: {e_online:.4f}, full batch: {e_full:.4f}')

    # --- chunked serving: encode a large set in exact independent chunks
    H = online.transform(V_heldout, n_iterations=50, batch_size=2)
    print(f'chunked transform: H {H.shape} from chunks of 2')

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    steps, errors = zip(*errs)
    axes[0].plot(steps, errors, 'o-', label='online (partial_fit)')
    axes[0].axhline(e_full, color='k', ls='--', label='full-batch fit')
    axes[0].set_xlabel('batches seen')
    axes[0].set_ylabel('held-out relative error')
    axes[0].legend()
    for i, w in enumerate(online.W):
        axes[1].plot(w[0] / w[0].max() + i, label=f'atom {i}')
    axes[1].set_title('online-learned atoms')
    fig.tight_layout()
    plt.show()


if __name__ == '__main__':
    main()
