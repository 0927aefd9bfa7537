#!/usr/bin/env python
"""Round-start housekeeping, in the required order.

Run FIRST thing each round, before touching any code:

1. ``record_hashes.py`` — absorb the newest driver CORRECTNESS sweep
   into ``QUERY_HASHES.json`` (valid only while the working tree is
   unchanged since the sweep, which is exactly the round-start state).
2. ``catalog.py --write CATALOG.md`` — refresh the per-query green
   column from the new sweep.
3. Fronting census (r14 verdict #1): count queries whose current
   implementation hash differs from the at-last-green record — these
   front for the next driver sweep. When the count exceeds what one
   sweep can re-vouch (``SWEEP_CAP``), REFUSE unless a fresh
   full-catalog ``PARITY.json`` bridge covers the same tree
   (``check_parity.py`` writes it on every unfiltered run): a
   mass-fronting event (the r14 table-cache hash move fronted all
   171) must be consciously bridged, not silently carried.

Usage::

    python scripts/round_start.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# the driver sweep re-vouches ~50 queries per round; more fronting
# than this cannot clear in one sweep and needs a parity bridge
SWEEP_CAP = 50


def _git(*args: str) -> str | None:
    try:
        proc = subprocess.run(
            ["git", *args], cwd=ROOT, capture_output=True,
            text=True, timeout=30,
        )
    except Exception:
        return None
    return proc.stdout.strip() if proc.returncode == 0 else None


def _parity_bridges(n_registered: int) -> list[str]:
    """sf_dirs of PARITY.json entries that vouch the CURRENT tree:
    zero failures, full catalog, clean query files at write time, and
    no query-implementation commits between the log's HEAD and now
    (with the current tree also clean)."""
    try:
        with open(os.path.join(ROOT, "PARITY.json")) as f:
            entries = json.load(f)
    except (OSError, ValueError):
        return []
    if _git("status", "--porcelain", "--",
            "lightsaber_spark", "__spark_entry__.py"):
        return []  # current tree dirty — nothing can vouch it
    out = []
    for sf_dir, e in entries.items():
        if not isinstance(e, dict):
            continue
        if e.get("failed") or e.get("dirty_query_files"):
            continue
        if e.get("total") != n_registered:
            continue
        head = e.get("git_head")
        if not head:
            continue
        later = _git("log", "--oneline", f"{head}..HEAD", "--",
                     "lightsaber_spark", "__spark_entry__.py")
        if later is None or later:
            continue  # unresolvable ref or post-log query commits
        out.append(sf_dir)
    return out


def _fronting_census() -> int:
    sys.path.insert(0, ROOT)
    from lightsaber_spark.staleness import (
        current_hashes,
        is_vouched,
        recorded_hashes,
    )

    cur = current_hashes()
    rec = recorded_hashes()
    fronted = sorted(n for n in cur if not is_vouched(n, cur, rec))
    print(
        f"fronting census: {len(fronted)}/{len(cur)} queries front "
        f"for the next sweep (cap {SWEEP_CAP}/round)"
    )
    if len(fronted) <= SWEEP_CAP:
        return 0
    bridges = _parity_bridges(len(cur))
    if bridges:
        print(
            f"MASS-FRONTING: {len(fronted)} > cap, bridged by "
            f"full-catalog PARITY.json run(s) at {sorted(bridges)} "
            "on this tree — OK, rotation clears over coming sweeps."
        )
        return 0
    print(
        f"MASS-FRONTING REFUSAL: {len(fronted)} queries front "
        f"(> {SWEEP_CAP}/sweep) and no fresh full-catalog parity "
        "bridge covers this tree. Run `python scripts/check_parity.py "
        "/root/testdata/sf0.001` (and sf0.01) BEFORE any code change "
        "— a green unfiltered run writes PARITY.json and this check "
        "passes. First 10 fronted: " + ", ".join(fronted[:10])
    )
    return 2


def main() -> int:
    for cmd in (
        [sys.executable, os.path.join(HERE, "record_hashes.py")],
        [sys.executable, os.path.join(HERE, "catalog.py"), "--write", "CATALOG.md"],
    ):
        print("+", " ".join(cmd))
        rc = subprocess.call(cmd, cwd=ROOT)
        if rc != 0:
            return rc
    return _fronting_census()


if __name__ == "__main__":
    sys.exit(main())
