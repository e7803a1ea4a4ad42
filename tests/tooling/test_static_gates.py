"""Static-analysis gate (reference parity: /root/reference/setup.cfg:1-4).

The reference CI runs flake8 (line length, cognitive complexity) and mypy;
neither is installed in this image, so tools/lint.py implements equivalent
checks with the stdlib and this test makes them a hard gate.
"""

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "tools"))


def test_source_tree_is_lint_clean():
    import lint
    errors = lint.run([REPO / "placement_tpu", REPO / "tools",
                       REPO / "experiments", REPO / "bench.py",
                       REPO / "__graft_entry__.py"])
    assert errors == []
