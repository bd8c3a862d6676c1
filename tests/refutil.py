"""Helper to import the peps-torch reference for cross-validation tests.

The reference checkout (read-only) is used as an *oracle*: tests compare
tpeps results against it bit-for-bit on random states.  All tests using
it must skip gracefully when the reference is absent.
"""

from __future__ import annotations

import os
import sys
import types

REF_PATH = os.environ.get("TPEPS_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REF_PATH) and os.path.exists(os.path.join(REF_PATH, "config.py"))


def import_reference():
    """Put the reference on sys.path (with a pkg_resources shim its old
    ``config._torch_version_check`` needs) and return its root module path."""
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            import packaging.version

            pk = types.ModuleType("pkg_resources")
            pk.parse_version = packaging.version.parse
            sys.modules["pkg_resources"] = pk
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    return REF_PATH
