#!/usr/bin/env python
"""Offline documentation builder for tnmf-tpu.

Sphinx fills this role in CI (``.github/workflows/docs.yml``); this builder
produces the same site structure with the standard library only, so the doc
tree is *verified buildable* in hermetic environments (reference counterpart:
``/root/reference/.github/workflows/sphinx.yml`` + ``doc/conf.py``).

It is strict like ``sphinx-build -W``:

* every ``automodule`` target in ``api.rst`` must import,
* every member listed must exist and carry a docstring,
* every toctree entry in ``index.rst`` must resolve to a document.

Usage: ``python doc/build.py [outdir]`` (default ``doc/_build``).
"""

from __future__ import annotations

import html
import importlib
import inspect
import os
import re
import sys

DOC_DIR = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(DOC_DIR)
sys.path.insert(0, ROOT)

PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title} — tnmf-tpu</title>
<style>
body {{ font-family: system-ui, sans-serif; max-width: 60rem; margin: 2rem auto; padding: 0 1rem; line-height: 1.5; color: #222; }}
pre {{ background: #f6f8fa; padding: .8rem; overflow-x: auto; border-radius: 6px; }}
code {{ background: #f6f8fa; padding: .1rem .3rem; border-radius: 4px; font-size: .92em; }}
pre code {{ padding: 0; background: none; }}
h1, h2, h3 {{ line-height: 1.25; }}
.sig {{ background: #eef3fb; padding: .5rem .8rem; border-left: 3px solid #4a7dbd; border-radius: 4px;
       font-family: ui-monospace, monospace; white-space: pre-wrap; }}
.doc {{ margin: .5rem 0 1.5rem 1rem; white-space: pre-wrap; }}
nav a {{ margin-right: 1rem; }}
table {{ border-collapse: collapse; }} td, th {{ border: 1px solid #ccc; padding: .3rem .6rem; }}
</style></head><body>
<nav><a href="index.html">Home</a><a href="api.html">API</a></nav>
{body}
</body></html>
"""


def md_to_html(text: str) -> str:
    """Minimal GitHub-flavored-markdown subset -> HTML (headers, fenced code,
    inline code/bold/italic/links, lists, tables, paragraphs)."""
    out, in_code, in_list, in_table, para = [], False, False, False, []

    def flush_para():
        if para:
            out.append('<p>' + inline(' '.join(para)) + '</p>')
            para.clear()

    def inline(s):
        s = html.escape(s, quote=False)
        s = re.sub(r'`([^`]+)`', r'<code>\1</code>', s)
        s = re.sub(r'\*\*([^*]+)\*\*', r'<strong>\1</strong>', s)
        s = re.sub(r'(?<![\w*])\*([^*]+)\*(?![\w*])', r'<em>\1</em>', s)
        s = re.sub(r'\[([^\]]+)\]\(([^)]+)\)', r'<a href="\2">\1</a>', s)
        return s

    for line in text.splitlines():
        if line.startswith('```'):
            flush_para()
            out.append('<pre><code>' if not in_code else '</code></pre>')
            in_code = not in_code
            continue
        if in_code:
            out.append(html.escape(line))
            continue
        if re.match(r'^\|.*\|\s*$', line):
            if re.match(r'^\|[\s\-:|]+\|\s*$', line):
                continue  # separator row
            flush_para()
            if not in_table:
                out.append('<table>')
                in_table = True
            cells = [inline(c.strip()) for c in line.strip().strip('|').split('|')]
            out.append('<tr>' + ''.join(f'<td>{c}</td>' for c in cells) + '</tr>')
            continue
        if in_table:
            out.append('</table>')
            in_table = False
        m = re.match(r'^(#{1,4})\s+(.*)$', line)
        if m:
            flush_para()
            n = len(m.group(1))
            out.append(f'<h{n}>{inline(m.group(2))}</h{n}>')
            continue
        m = re.match(r'^\s*[-*]\s+(.*)$', line)
        if m:
            flush_para()
            if not in_list:
                out.append('<ul>')
                in_list = True
            out.append(f'<li>{inline(m.group(1))}</li>')
            continue
        if in_list and not line.strip():
            out.append('</ul>')
            in_list = False
        if not line.strip():
            flush_para()
        else:
            para.append(line.strip())
    flush_para()
    if in_list:
        out.append('</ul>')
    if in_table:
        out.append('</table>')
    return '\n'.join(out)


def parse_api_rst(path: str):
    """Yield (section, module, members|None) from the automodule directives."""
    section = None
    entries = []
    lines = open(path).read().splitlines()
    for i, line in enumerate(lines):
        if i + 1 < len(lines) and re.match(r'^[-=^~]+$', lines[i + 1] or 'x') \
                and line.strip() and not line.startswith('..'):
            section = line.strip()
        m = re.match(r'^\.\.\s+automodule::\s+(\S+)', line)
        if m:
            members = None
            for j in range(i + 1, min(i + 4, len(lines))):
                mm = re.match(r'^\s+:members:\s*(.*)$', lines[j])
                if mm:
                    members = [x.strip() for x in mm.group(1).split(',') if x.strip()] or None
                    break
            entries.append((section, m.group(1), members))
    return entries


def render_member(name, obj):
    parts = []
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        sig = ''
    kind = 'class' if inspect.isclass(obj) else 'def'
    parts.append(f'<div class="sig" id="{html.escape(name)}">{kind} <b>{html.escape(name)}</b>{html.escape(sig)}</div>')
    doc = inspect.getdoc(obj) or ''
    parts.append(f'<div class="doc">{html.escape(doc)}</div>')
    if inspect.isclass(obj):
        for mname, meth in sorted(vars(obj).items()):
            if mname.startswith('_') or not (inspect.isfunction(meth) or isinstance(meth, (classmethod, property))):
                continue
            target = meth.__func__ if isinstance(meth, classmethod) else \
                meth.fget if isinstance(meth, property) else meth
            if target is None or not inspect.getdoc(target):
                continue
            try:
                msig = str(inspect.signature(target))
            except (TypeError, ValueError):
                msig = ''
            parts.append(f'<div class="sig" style="margin-left:2rem">{html.escape(name)}.<b>{html.escape(mname)}</b>{html.escape(msig)}</div>')
            parts.append(f'<div class="doc" style="margin-left:3rem">{html.escape(inspect.getdoc(target))}</div>')
    return '\n'.join(parts)


def build_api(outdir: str, errors: list) -> None:
    body = ['<h1>API reference</h1>']
    last_section = None
    for section, modname, members in parse_api_rst(os.path.join(DOC_DIR, 'api.rst')):
        try:
            mod = importlib.import_module(modname)
        except Exception as e:  # noqa: BLE001 - strict build reports all failures
            errors.append(f'api.rst: cannot import {modname}: {e}')
            continue
        if section != last_section:
            body.append(f'<h2>{html.escape(section or modname)}</h2>')
            last_section = section
        body.append(f'<h3><code>{html.escape(modname)}</code></h3>')
        body.append(f'<div class="doc">{html.escape(inspect.getdoc(mod) or "")}</div>')
        names = members
        if names is None:
            # callable() also catches jax.jit wrappers, which are not
            # inspect.isfunction but preserve __module__/__doc__ via wraps
            names = [n for n, o in vars(mod).items()
                     if not n.startswith('_') and getattr(o, '__module__', None) == modname
                     and (callable(o) or inspect.isclass(o)) and inspect.getdoc(o)]
        for name in names:
            obj = getattr(mod, name, None)
            if obj is None:
                errors.append(f'api.rst: {modname} has no member {name!r}')
                continue
            if not inspect.getdoc(obj):
                errors.append(f'api.rst: {modname}.{name} has no docstring')
                continue
            body.append(render_member(name, obj))
    with open(os.path.join(outdir, 'api.html'), 'w') as f:
        f.write(PAGE.format(title='API reference', body='\n'.join(body)))


def build_index(outdir: str, errors: list) -> list:
    src = open(os.path.join(DOC_DIR, 'index.rst')).read()
    lines = src.splitlines()
    body, i, toctree = [], 0, []
    body.append(f'<h1>{html.escape(lines[0])}</h1>')
    in_toc = in_code = False
    for line in lines[2:]:
        if line.startswith('.. toctree::'):
            in_toc = True
            body.append('<ul>')
            continue
        if line.startswith('.. code-block::'):
            in_code = True
            body.append('<pre><code>')
            continue
        if in_toc:
            if line.strip().startswith(':'):
                continue
            if line.strip():
                name = line.strip()
                toctree.append(name)
                target = 'api.html' if name == 'api' else f'{name}.html'
                body.append(f'<li><a href="{target}">{html.escape(name)}</a></li>')
                continue
            if body[-1] != '<ul>':
                in_toc = False
                body.append('</ul>')
                continue
            continue
        if in_code:
            if line.strip() or line.startswith('   '):
                body.append(html.escape(line[3:] if line.startswith('   ') else line))
                continue
            if body[-1] == '<pre><code>':
                continue
            in_code = False
            body.append('</code></pre>')
            continue
        if re.match(r'^[-=]+$', line):
            prev = body.pop()
            body.append(f'<h2>{prev}</h2>')
            continue
        body.append(html.escape(line))
    if in_code:
        body.append('</code></pre>')
    with open(os.path.join(outdir, 'index.html'), 'w') as f:
        f.write(PAGE.format(title='tnmf-tpu', body='\n'.join(body)))
    return toctree


def main(outdir: str = None) -> int:
    outdir = outdir or os.path.join(DOC_DIR, '_build')
    os.makedirs(outdir, exist_ok=True)
    errors: list = []

    toctree = build_index(outdir, errors)
    for entry in toctree:
        if entry == 'api':
            continue
        md = os.path.join(DOC_DIR, entry + '.md')
        if not os.path.exists(md):
            errors.append(f'index.rst toctree entry {entry!r} has no source document')
            continue
        body = md_to_html(open(md).read())
        with open(os.path.join(outdir, entry + '.html'), 'w') as f:
            f.write(PAGE.format(title=entry, body=body))
    # guides not in the toctree still build (like sphinx's orphan warning, strict)
    for fname in sorted(os.listdir(DOC_DIR)):
        if fname.endswith('.md') and fname[:-3] not in toctree:
            errors.append(f'{fname} exists but is not referenced by the index.rst toctree')

    build_api(outdir, errors)

    if errors:
        for e in errors:
            print(f'ERROR: {e}', file=sys.stderr)
        return 1
    n = len([f for f in os.listdir(outdir) if f.endswith('.html')])
    print(f'doc build OK: {n} pages -> {outdir}')
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
