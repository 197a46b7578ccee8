# Dev fallback; overwritten by setuptools_scm at build time (pyproject.toml
# [tool.setuptools_scm] version_file).
__version__ = "0.2.0"
