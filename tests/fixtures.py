"""Shared deterministic fixtures for the golden-value regression tests.

All fixtures are synthesized (no data downloads) and seeded through the
global NumPy RNG, mirroring the reference's fixture style
(tnmf/tests/test_1d.py, test_backends.py, test_minibatch.py).  The golden
values in ``golden_values.json`` were generated from these fixtures by
``python tests/generate_goldens.py`` (float64, CPU) and are derived
regression anchors, not external truths: they pin today's verified-correct
behavior (which itself is cross-checked against the reference library in
``test_reference_parity.py``).
"""

import json
import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), 'golden_values.json')


def load_goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def signal_1d():
    """3-channel pulse-train signal as a single sample: (1, 3, 100)."""
    from tnmf_tpu.utils.signals import generate_pulse_train
    np.random.seed(42)
    signal, _ = generate_pulse_train(pulse_length=20, n_pulses=5)
    return signal[np.newaxis]


def image_2d():
    """Two copies of the synthetic color test image at scale 0.1: (2, 3, 76, 102)."""
    from tnmf_tpu.utils.data_loading import synthetic_face
    img = synthetic_face(gray=False)[::10, ::10]
    return np.repeat(img.transpose((2, 0, 1))[np.newaxis], 2, axis=0)


def patches_2d(n=64, size=32):
    """n grayscale 32x32 patches cut from the synthetic test image: (n, 1, 32, 32)."""
    from tnmf_tpu.utils.data_loading import synthetic_face
    img = synthetic_face(gray=True)
    rows = img.shape[0] // size
    cols = img.shape[1] // size
    blocks = (img[:rows * size, :cols * size]
              .reshape(rows, size, cols, size)
              .transpose(0, 2, 1, 3)
              .reshape(-1, 1, size, size))
    return np.ascontiguousarray(blocks[:n])
