#!/usr/bin/env python
"""Rewrite the published performance-claim spans from benchmarks/CLAIMS.json.

Every measured performance range quoted in the documentation lives between
``<!-- CLAIM:metric -->`` ... ``<!-- /CLAIM -->`` markers and is generated
from the claims record (see :mod:`benchmarks.claims` for the why).  Run
after ``python bench.py [--all]`` whenever the record widened:

    python tools/update_claims.py        # rewrite docs in place
    python tools/update_claims.py --check  # exit 1 if any doc is stale

``tests/test_docs.py`` runs the --check logic in the suite.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DOCS = ('BASELINE.md', 'README.md', 'COMPONENTS.md')
PATTERN = re.compile(r'(<!-- CLAIM:([\w]+) -->)(.*?)(<!-- /CLAIM -->)',
                     re.DOTALL)


def rewrite(check_only: bool = False) -> bool:
    from benchmarks import claims
    spans = claims.doc_spans()
    stale = []
    for name in DOCS:
        path = os.path.join(ROOT, name)
        with open(path) as f:
            text = f.read()

        def sub(m):
            key = m.group(2)
            if key not in spans:
                raise SystemExit(f'{name}: unknown claim key {key!r} '
                                 f'(known: {sorted(spans)})')
            return m.group(1) + spans[key] + m.group(4)

        new = PATTERN.sub(sub, text)
        if new != text:
            stale.append(name)
            if not check_only:
                with open(path, 'w') as f:
                    f.write(new)
    if stale:
        verb = 'stale' if check_only else 'updated'
        print(f'{verb}: {", ".join(stale)}')
    else:
        print('docs match CLAIMS.json')
    return not stale


if __name__ == '__main__':
    ok = rewrite(check_only='--check' in sys.argv)
    sys.exit(0 if ok or '--check' not in sys.argv else 1)
