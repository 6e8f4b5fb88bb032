"""Input validation must survive ``python -O`` (which strips ``assert``).

The reference guards fit() inputs with bare asserts
(``TransformInvariantNMF.py:326-330``) and silently loses them under -O;
this build raises ``ValueError`` from real code paths instead
(:mod:`tnmf_tpu.utils.validation`).  Verified in a ``-O`` subprocess.
"""

import os
import subprocess
import sys

_SNIPPET = """
import numpy as np
from tnmf_tpu import TransformInvariantNMF

V = np.random.default_rng(0).random((3, 2, 10, 10))
V.flat[0] = -1.0
nmf = TransformInvariantNMF(n_atoms=2, atom_shape=(3, 3))
for call in (
    lambda: nmf.fit(V, n_iterations=1),
    lambda: nmf.fit(abs(V), n_iterations=1, sparsity_H=-0.5),
    lambda: nmf.fit(abs(V), n_iterations=1, tol=-1.0),
):
    try:
        call()
    except ValueError:
        pass
    else:
        raise SystemExit('expected ValueError was not raised')
print('OK')
"""


def test_validation_survives_dash_O():
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env['PYTHONPATH'] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, '-O', '-c', _SNIPPET], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert 'OK' in proc.stdout
