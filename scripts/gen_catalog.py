#!/usr/bin/env python
"""Generate CATALOG.md: one row per registered operator-query, straight
from engine.registry (name, module, check tier, first docstring line).
Run after adding operators; CI-style guard: tests/test_properties.py
asserts the committed file is current.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import engine  # noqa: E402


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    return doc.splitlines()[0].rstrip(".") if doc else ""


def render() -> str:
    rows = []
    for name in sorted(engine.QUERIES):
        fn = engine.QUERIES[name]
        mod = fn.__module__.replace("engine.ops.", "")
        tier = "value-hash" if name in engine.ORACLES else "rows-only"
        rows.append(f"| `{name}` | {mod} | {tier} | {first_line(fn)} |")
    n, no = len(engine.QUERIES), len(engine.ORACLES)
    head = (
        "# CATALOG — registered operator-queries\n\n"
        "**Auto-generated from `engine.registry` by `scripts/gen_catalog.py` — do not edit.**\n"
        f"\n{n} queries; {no} with full DuckDB value-hash oracles, "
        f"{n - no} rows-only (property-tested in `tests/`).\n\n"
        "| id | module | check | summary |\n|---|---|---|---|\n"
    )
    return head + "\n".join(rows) + "\n"


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")
