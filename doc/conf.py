# Sphinx configuration (optional: build with `pip install sphinx myst-parser`
# then `sphinx-build doc doc/_build`). The markdown docs in this directory
# are readable standalone; this config exists for hosted API docs.

import os
import sys

sys.path.insert(0, os.path.abspath('..'))

project = 'tnmf-tpu'
copyright = '2026, tnmf-tpu contributors'
release = '0.2.0'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
    'sphinx.ext.mathjax',
]
try:
    import myst_parser  # noqa: F401
    extensions.append('myst_parser')
    source_suffix = {'.rst': 'restructuredtext', '.md': 'markdown'}
except ImportError:
    source_suffix = {'.rst': 'restructuredtext'}

autodoc_member_order = 'bysource'
html_theme = 'alabaster'
exclude_patterns = ['_build']
