"""Sphinx configuration (mirrors the reference's doc/conf.py role)."""

project = "boxtree_tpu"
copyright = "2026, boxtree_tpu contributors"
author = "boxtree_tpu contributors"
release = "2026.1"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.intersphinx",
    "sphinx.ext.viewcode",
]

intersphinx_mapping = {
    "python": ("https://docs.python.org/3/", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

autodoc_member_order = "bysource"
html_theme = "alabaster"
