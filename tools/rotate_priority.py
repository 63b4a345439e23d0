#!/usr/bin/env python
"""Generate the driver-rotation priority list from CORRECTNESS history.

The driver's correctness gate checks a bounded prefix (~50 entries) of
``all_queries()`` iteration order, so which queries get a fresh driver
row each round is decided by ``_DRIVER_PRIORITY`` in
plans/registry.py.  Hand-curating that list went stale three rounds
running; this tool derives it instead:

- read every ``CORRECTNESS_r*.json`` at the repo root,
- compute each query's most recent hash-green round (never-checked
  counts as round 0),
- emit the full-oracle registry entries STALEST-FIRST (ties broken by
  registry order, so rotation is deterministic), with the rows-only
  ``_DRIVER_DEFER`` entries left to the registry's trailing position —
  EXCEPT defer entries that have never appeared in ANY driver round
  (no row, green or rows-only): those are fronted once so the driver
  records at least a rows-only entry for every registered gate, then
  drop back to the trailing position once a row exists.

Run it after adding/renaming queries or after a driver round lands::

    python tools/rotate_priority.py            # print the tuple
    python tools/rotate_priority.py --write    # rewrite registry.py

``--write`` replaces the ``_DRIVER_PRIORITY = (...)`` tuple in
plans/registry.py in place; never-checked (new) queries sort first,
so a freshly added gate always lands inside the driver window.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REGISTRY = (
    REPO
    / "database_activity_monitoring_dam_system_spark"
    / "plans"
    / "registry.py"
)


def last_green_rounds() -> tuple[dict[str, int], set[str]]:
    """(query -> most recent hash-green round, queries with ANY row).

    The second element counts rows-only / errored driver rows too —
    it decides whether a ``_DRIVER_DEFER`` entry still needs its
    one-time pass through the driver window.
    """
    greens: dict[str, int] = {}
    seen: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.loads(path.read_text()).items():
            seen.add(name)
            if row.get("hash_match"):
                greens[name] = max(greens.get(name, 0), rnd)
    return greens, seen


def generate() -> tuple[list[str], dict[str, int]]:
    sys.path.insert(0, str(REPO))
    from database_activity_monitoring_dam_system_spark.plans.registry import (
        _DRIVER_DEFER,
        _SOURCE_MODULES,
    )

    merged: dict = {}
    for mod in _SOURCE_MODULES:
        merged.update(mod.QUERIES)
    greens, seen = last_green_rounds()
    full_oracle = [
        name
        for name in merged
        if name not in _DRIVER_DEFER and merged[name].oracle is not None
    ]
    # stable sort: staleness ascending (last-green round), registry
    # order as tiebreak (sort is stable over the insertion order)
    ordered = sorted(full_oracle, key=lambda n: greens.get(n, 0))
    # defer entries never recorded by the driver get one fronted pass
    # (rows-only row); once any CORRECTNESS row exists they fall back
    # to the registry's trailing _DRIVER_DEFER position
    never_seen_defer = [name for name in _DRIVER_DEFER if name not in seen]
    return never_seen_defer + ordered, greens


def main() -> None:
    ordered, greens = generate()
    lines = [
        f'    "{name}",  # last green: '
        + (f"r{greens[name]:02d}" if name in greens else "never")
        for name in ordered
    ]
    block = "_DRIVER_PRIORITY: tuple[str, ...] = (\n" + "\n".join(lines) + "\n)"
    if "--write" in sys.argv:
        src = REGISTRY.read_text()
        pattern = re.compile(
            r"_DRIVER_PRIORITY: tuple\[str, \.\.\.\] = \(\n.*?\n\)",
            re.DOTALL,
        )
        if not pattern.search(src):
            raise SystemExit("registry.py: _DRIVER_PRIORITY block not found")
        REGISTRY.write_text(pattern.sub(block, src, count=1))
        print(f"wrote {len(ordered)} entries to {REGISTRY}")
    else:
        print(block)


if __name__ == "__main__":
    main()
