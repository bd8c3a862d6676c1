"""Add the repository root to sys.path so examples run in-place
(reference examples/*/context.py pattern)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
