"""OPERATORS.md must stay in sync with the registry."""

import sys

sys.path.insert(0, "/root/repo")


def test_operators_md_in_sync():
    from tools.gen_operators_md import render

    assert open("/root/repo/OPERATORS.md").read() == render(), (
        "OPERATORS.md stale — run python tools/gen_operators_md.py"
    )
