"""Load a script from the repo's tools/ directory by name.

tools/ is deliberately not a package (each script is a standalone CLI),
but bench.py, the CLI and several tools reuse each other's functions —
this is the one shared load-by-path helper so the importlib incantation
is not re-copied at every consumer.
"""

from __future__ import annotations

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def load_tool(name: str):
    """Import tools/<name>.py and return the module object."""
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
