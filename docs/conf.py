# Sphinx configuration (reference analog: /root/reference/docs/conf.py).
#
# The docs are plain Markdown (this directory); this config makes them
# buildable as HTML with stock Sphinx + myst-parser:
#
#     pip install sphinx myst-parser
#     sphinx-build -b html docs docs/_build/html
#
# Neither package ships in this development image (no-install policy),
# so the build is exercised only on machines that have them; the
# Markdown sources remain the canonical docs either way.

project = "cryo_ralib_tpu"
author = "cryo_ralib_tpu contributors"
copyright = "2026, cryo_ralib_tpu contributors"

extensions = ["myst_parser"]
source_suffix = {".md": "markdown"}
master_doc = "index"

exclude_patterns = ["_build"]
html_theme = "alabaster"
myst_enable_extensions = ["colon_fence"]
