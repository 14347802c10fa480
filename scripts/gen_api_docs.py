"""Regenerate ``docs/api.md``: public classes/functions by module.

Dependency-free replacement for a Sphinx autoapi build (sphinx is not
available in this image): walks every module under ``gnn_tracking_tpu``,
lists public top-level classes and functions defined there, and emits the
first docstring line of each. Run from the repo root:

    python scripts/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).parent.parent))

import gnn_tracking_tpu  # noqa: E402


def first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    return doc.splitlines()[0].strip() if doc else ""


def main() -> None:
    lines = [
        "# API index",
        "",
        "Public classes and functions by module (first docstring line).",
        "Regenerate with `python scripts/gen_api_docs.py`.",
    ]
    mods = sorted(
        m.name
        for m in pkgutil.walk_packages(
            gnn_tracking_tpu.__path__, prefix="gnn_tracking_tpu."
        )
        if not m.ispkg
    )
    for name in mods:
        try:
            mod = importlib.import_module(name)
        except Exception as e:  # pragma: no cover - import-time env issues
            lines += ["", f"## `{name}`", "", f"- import failed: {e}"]
            continue
        entries = []
        for attr, obj in sorted(vars(mod).items()):
            if attr.startswith("_"):
                continue
            if getattr(obj, "__module__", None) != name:
                continue
            if inspect.isclass(obj):
                entries.append(f"- `class {attr}` — {first_line(obj)}")
            elif inspect.isfunction(obj):
                entries.append(f"- `def {attr}` — {first_line(obj)}")
        if entries:
            lines += ["", f"## `{name}`", ""] + entries
    out = Path(__file__).parent.parent / "docs" / "api.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(mods)} modules)")


if __name__ == "__main__":
    main()
