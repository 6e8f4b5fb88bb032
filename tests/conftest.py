"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled.

Golden regression values are generated in float64 on CPU (like the
reference's seeded fixtures); TPU execution is exercised separately via
``__graft_entry__.py`` and ``bench.py``.  The environment may force a TPU
platform via a sitecustomize hook, so the platform override happens here,
before any JAX computation runs.
"""

import os
import sys

# 8 virtual CPU devices for the sharding tests
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# hermetic line coverage (CI uses real coverage.py; see tools/cov_lite.py)
_COV_OUT = os.environ.get('TNMF_TPU_COVLITE')
if _COV_OUT:
    import atexit
    import json
    from tools import cov_lite
    _pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tnmf_tpu')
    cov_lite.start(_pkg)
    atexit.register(lambda: print(json.dumps(
        {'coverage_pct': cov_lite.report(_COV_OUT)['total_pct']})))

REFERENCE_PATH = '/root/reference'


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, 'tnmf'))
