"""Parse-health guard for every script under tools/ (they import the TPU
backend at run time, so this only asserts they stay syntactically valid
and keep their module docstrings)."""
import ast
import os
import pathlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_tools_parse():
    scripts = sorted(pathlib.Path(REPO, "tools").glob("*.py"))
    assert len(scripts) >= 10
    for p in scripts:
        tree = ast.parse(p.read_text())
        assert ast.get_docstring(tree), f"{p.name} lacks a module docstring"
