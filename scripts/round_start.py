#!/usr/bin/env python
"""Round-start housekeeping, in the required order.

Run FIRST thing each round, before touching any code:

1. ``record_hashes.py`` — absorb the newest driver CORRECTNESS sweep
   into ``QUERY_HASHES.json`` (valid only while the working tree is
   unchanged since the sweep, which is exactly the round-start state).
2. ``catalog.py --write CATALOG.md`` — refresh the per-query green
   column from the new sweep.

Usage::

    python scripts/round_start.py
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    for cmd in (
        [sys.executable, os.path.join(HERE, "record_hashes.py")],
        [sys.executable, os.path.join(HERE, "catalog.py"), "--write", "CATALOG.md"],
    ):
        print("+", " ".join(cmd))
        rc = subprocess.call(cmd, cwd=os.path.dirname(HERE))
        if rc != 0:
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
