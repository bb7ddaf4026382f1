# Sphinx configuration for the scldm-tpu documentation site.
#
# Parity surface: the reference ships a Sphinx/myst site (reference
# docs/conf.py) built from its installed package metadata; this config does
# the same for scldm-tpu so `sphinx-build docs docs/_build` produces the
# site from the markdown sources + executed notebooks already in docs/.
# Sphinx/myst are NOT runtime dependencies — building the docs needs the
# `docs` extra (pyproject [project.optional-dependencies]).

import sys
from datetime import datetime
from pathlib import Path

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent))

project = "scldm-tpu"
author = "scldm-tpu developers"
copyright = f"{datetime.now():%Y}, {author}"

try:  # installed: take the single source of truth from package metadata
    from importlib.metadata import metadata

    _info = metadata("scldm-tpu")
    release = version = _info["Version"]
except Exception:  # building docs from a source checkout without install
    import re

    _pyproject = (HERE.parent / "pyproject.toml").read_text()
    release = version = re.search(
        r'^version\s*=\s*"([^"]+)"', _pyproject, re.M
    ).group(1)

extensions = [
    "myst_nb",            # markdown pages + executed .ipynb notebooks
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.intersphinx",
    "sphinx.ext.viewcode",
    "sphinxcontrib.bibtex",
]

bibtex_bibfiles = ["references.bib"]
templates_path = []
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]
source_suffix = {".md": "myst-nb", ".ipynb": "myst-nb", ".rst": "restructuredtext"}

# notebooks are committed pre-executed (they need an accelerator and the
# synthetic-data fixtures); never re-run them during a docs build
nb_execution_mode = "off"

myst_enable_extensions = ["dollarmath", "colon_fence", "linkify"]
myst_heading_anchors = 3

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
    "flax": ("https://flax.readthedocs.io/en/latest/", None),
}

html_theme = "sphinx_book_theme"
html_title = f"{project} {release}"
html_theme_options = {
    "repository_url": "https://github.com/scldm-tpu/scldm-tpu",
    "use_repository_button": True,
    "navigation_with_keys": False,
}
