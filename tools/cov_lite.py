"""Hermetic line-coverage collector (sys.monitoring, PEP 669).

CI enforces the real >=95% gate with coverage.py (tests.yml); this tool
exists for environments without it.  Activate by exporting
``TNMF_TPU_COVLITE=/path/report.json`` and running pytest — the conftest
starts collection, and an atexit hook writes per-file and total coverage
for ``tnmf_tpu/``.

Caveat vs coverage.py: only in-process execution is observed, so modules
exercised exclusively through subprocess smoke tests (demos/examples/CLI
drivers) are reported separately rather than counted as misses.
"""

from __future__ import annotations

import json
import os
import sys

_TOOL_ID = 3  # sys.monitoring tool slot (coverage slot is taken by coverage.py)
_executed: set = set()
_prefix = ''

# modules whose tests run them in subprocesses only (see test_demos.py,
# test_examples.py, test_distributed.py) - invisible to in-process tracing
SUBPROCESS_ONLY = ('utils/demo.py', 'utils/_st_shim.py', 'cli.py',
                   'parallel/distributed.py')


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(_prefix):
        _executed.add((fn, line))
    else:
        return sys.monitoring.DISABLE
    return None


def start(package_dir: str) -> None:
    global _prefix
    _prefix = os.path.abspath(package_dir) + os.sep
    mon = sys.monitoring
    mon.use_tool_id(_TOOL_ID, 'cov_lite')
    mon.register_callback(_TOOL_ID, mon.events.LINE, _on_line)
    mon.set_events(_TOOL_ID, mon.events.LINE)


def _excluded_lines(src: str) -> set:
    """Lines excluded from the metric, mirroring the coverage.py policy in
    pyproject.toml: precondition raises, import fallbacks, pragmas."""
    import ast
    excluded = set()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Raise):
            exc = node.exc
            name = ''
            if isinstance(exc, ast.Call) and isinstance(exc.func, ast.Name):
                name = exc.func.id
            elif isinstance(exc, ast.Name):
                name = exc.id
            if name in ('NotImplementedError', 'AssertionError', 'ValueError'):
                excluded.update(range(node.lineno, (node.end_lineno or node.lineno) + 1))
        elif isinstance(node, ast.ExceptHandler) and node.type is not None:
            names = [n.id for n in ast.walk(node.type) if isinstance(n, ast.Name)]
            if 'ImportError' in names:
                excluded.update(range(node.lineno, (node.end_lineno or node.lineno) + 1))
    for i, line in enumerate(src.splitlines(), 1):
        if 'pragma: no cover' in line:
            excluded.add(i)
    return excluded


def _executable_lines(path: str) -> set:
    """All line numbers carrying code, from the compiled code objects,
    minus the policy exclusions."""
    with open(path) as f:
        src = f.read()
    lines = set()
    stack = [compile(src, path, 'exec')]
    while stack:
        code = stack.pop()
        for _, _, line in code.co_lines():
            if line is not None and line > 0:
                lines.add(line)
        for const in code.co_consts:
            if hasattr(const, 'co_lines'):
                stack.append(const)
    return lines - _excluded_lines(src)


def report(out_path: str) -> dict:
    hit_by_file: dict = {}
    for fn, line in _executed:
        hit_by_file.setdefault(fn, set()).add(line)

    files = {}
    tot_exec = tot_hit = 0
    for root, _, names in os.walk(_prefix):
        for name in sorted(names):
            if not name.endswith('.py'):
                continue
            path = os.path.join(root, name)
            rel = os.path.relpath(path, _prefix)
            executable = _executable_lines(path)
            hit = hit_by_file.get(path, set()) & executable
            entry = {'executable': len(executable), 'hit': len(hit),
                     'pct': round(100 * len(hit) / max(len(executable), 1), 1),
                     'missing': sorted(executable - hit)}
            if any(rel.endswith(s) for s in SUBPROCESS_ONLY):
                entry['note'] = 'exercised via subprocess tests (not traced in-process)'
            else:
                tot_exec += len(executable)
                tot_hit += len(hit)
            files[rel] = entry

    result = {'total_pct': round(100 * tot_hit / max(tot_exec, 1), 1),
              'total_hit': tot_hit, 'total_executable': tot_exec,
              'files': files}
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1, sort_keys=True)
    return result
