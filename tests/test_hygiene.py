"""Repo hygiene guard: no shadowed duplicate top-level definitions.

Round-3 VERDICT (weak #2) found a duplicated test function in
tests/test_dist.py whose first definition was silently shadowed (pyflakes
F811 class). No linter ships in this environment, so this test IS the
lint: it AST-walks every Python file in the repo and fails on any module
that defines the same top-level function/class name twice (the second
definition silently wins and the first never runs).
"""
import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN_DIRS = ("tpurt", "tests", "tools")
SCAN_FILES = ("bench.py", "conftest.py", "__graft_entry__.py")


def _py_files():
    for d in SCAN_DIRS:
        for root, _dirs, files in os.walk(os.path.join(REPO, d)):
            for f in files:
                if f.endswith(".py"):
                    yield os.path.join(root, f)
    for f in SCAN_FILES:
        p = os.path.join(REPO, f)
        if os.path.exists(p):
            yield p


def _duplicate_defs(path):
    """Top-level names defined more than once by def/class statements.

    `if/try` alternatives (fallback definitions) are legitimate — only
    straight-line duplicates at module scope are flagged, which is exactly
    the F811 shadowing class that bit test_dist.py.
    """
    with open(path, "r") as fh:
        tree = ast.parse(fh.read(), filename=path)
    seen = {}
    dups = []
    for node in tree.body:  # module scope only, straight-line only
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                dups.append((node.name, seen[node.name], node.lineno))
            seen[node.name] = node.lineno
    return dups


def test_no_shadowed_toplevel_definitions():
    offenders = {}
    n = 0
    for path in _py_files():
        n += 1
        dups = _duplicate_defs(path)
        if dups:
            offenders[os.path.relpath(path, REPO)] = dups
    assert n > 50, f"hygiene scan only found {n} files — scan roots moved?"
    assert not offenders, (
        "shadowed duplicate top-level definitions (F811 class): "
        f"{offenders}")
