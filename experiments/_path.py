"""Make the repo root importable when running experiment scripts directly
(mirrors the reference's installed ``environment`` package,
environment/setup.py:1-12, without requiring ``pip install -e .``)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
