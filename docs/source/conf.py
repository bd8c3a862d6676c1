"""Sphinx configuration for the tpeps documentation
(counterpart of reference docs/source/conf.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "tpeps"
author = "tpeps developers"
release = "0.3"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_member_order = "bysource"
autodoc_mock_imports = []

templates_path = []
exclude_patterns = []
html_theme = "alabaster"
