"""Regenerate tests/golden_values.json (float64, CPU).

Run as:  python tests/generate_goldens.py

The values are *derived* regression anchors: they pin the behavior that
test_reference_parity.py verifies against the original library on small
configs.  Regenerate only after an intentional numerical change, and say so
in the commit message.
"""

import json
import os
import sys

os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    from tests import fixtures
    from tests.test_1d import MODES as MODES_1D
    from tests.test_1d import fit_nmf as fit_1d
    from tests.test_2d_backends import MODES as MODES_2D
    from tests.test_2d_backends import fit_nmf as fit_2d
    from tests.test_minibatch import ALGORITHMS, fit_nmf as fit_mb
    from tests.test_sparsity_inhibition import SETTINGS, _key, fit_nmf as fit_si
    from tests import test_stream

    goldens = {}

    goldens['1d'] = {m: fit_1d('jax_fft', m)._energy_function() for m in MODES_1D}
    print('1d:', goldens['1d'])

    goldens['2d'] = {m: fit_2d('jax_fft', m)._energy_function() for m in MODES_2D}
    print('2d:', goldens['2d'])

    goldens['minibatch'] = {a: fit_mb('jax_fft', a)._energy_function() for a in ALGORITHMS}
    print('minibatch:', goldens['minibatch'])

    stream = {}
    stream['ASAG_MU'] = test_stream._fit(test_stream.V)._energy_function()
    np.random.seed(seed=42)
    from tnmf_tpu import MiniBatchAlgorithm, TransformInvariantNMF
    nmf = TransformInvariantNMF(n_atoms=10, atom_shape=(7, 7), backend='jax_fft')
    nmf.fit(test_stream.V, sparsity_H=0.1, algorithm=MiniBatchAlgorithm.Cyclic_MU,
            subsample_size=16, max_subsamples=1, batch_size=3, n_epochs=3, sag_lambda=0.8)
    stream['limited'] = nmf._energy_function()
    goldens['stream'] = stream
    print('stream:', stream)

    si = {}
    for params in SETTINGS:
        nmf = fit_si(**params)
        H = nmf.H
        si[_key(params)] = dict(
            energy=nmf._energy_function(),
            l1=float(np.abs(H).sum()),
            l0=int((H > 1e-4).sum()),
        )
        print('sparsity_inhibition', _key(params), si[_key(params)])
    goldens['sparsity_inhibition'] = si

    with open(fixtures.GOLDEN_PATH, 'w') as f:
        json.dump(goldens, f, indent=2)
    print('wrote', fixtures.GOLDEN_PATH)


if __name__ == '__main__':
    main()
