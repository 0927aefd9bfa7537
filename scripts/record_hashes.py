#!/usr/bin/env python
"""Snapshot implementation hashes for driver-verified queries.

Run at ROUND START, right after a driver correctness sweep lands and
BEFORE any code changes: for every query with a green row in the
newest ``CORRECTNESS_r*.json``, records the current ``impl_hash`` into
``QUERY_HASHES.json`` as "the implementation the driver verified".
That equivalence only holds while the working tree is unchanged since
the sweep — hence round start, never mid-round.

``__spark_entry__`` then treats a query as stale (fronted for the next
sweep) whenever its current hash differs from the recorded one — the
mechanized replacement for round-3's hand-maintained
``_FORCE_RECHECK`` list.

Usage::

    python scripts/record_hashes.py            # merge newest round's greens
    python scripts/record_hashes.py --round 3  # merge a specific round
    python scripts/record_hashes.py --prune    # also drop unregistered names
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lightsaber_spark.staleness import (  # noqa: E402
    HASHES_FILENAME,
    current_hashes,
    recorded_hashes,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_in_round(rnd: int) -> set[str]:
    path = os.path.join(ROOT, f"CORRECTNESS_r{rnd:02d}.json")
    if not os.path.exists(path):
        path = os.path.join(ROOT, f"CORRECTNESS_r{rnd}.json")
    with open(path) as f:
        rows = json.load(f)
    out = set()
    for name, row in rows.items():
        if not isinstance(row, dict):
            continue
        if bool(row.get("hash_match")) or (
            row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        ):
            out.add(name)
    return out


def _newest_round() -> int:
    rounds = []
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if m:
            rounds.append(int(m.group(1)))
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json found")
    return max(rounds)


def _check_tree_clean(rnd: int) -> None:
    """Refuse to vouch hashes the driver never verified. Two traps:

    - dirty tree (ADVICE r4): uncommitted query-implementation edits
      mean current hashes describe rewritten code, not the swept code;
    - COMMITTED post-sweep edits (hit in round 11's continuation): the
      sweep file lands in a driver commit, a later session rewrites
      queries and commits, and a re-run of this script — on a clean
      tree — would vouch the NEW hashes with the OLD green rows. Guard:
      if any commit after the one that last touched
      ``CORRECTNESS_r{rnd}.json`` touched ``lightsaber_spark/`` or
      ``__spark_entry__.py``, the sweep predates the code — refuse.

    ``--force`` overrides both (with a warning) for the rare
    legitimate case (e.g. docs-only changes)."""
    import subprocess

    def _git(*args: str) -> str | None:
        """stdout of a git command; None only when git is genuinely
        absent (binary missing). A git that EXISTS but FAILS (corrupt
        repo, bad object) refuses loudly — returning None there would
        silently skip the very precondition this function guards
        (review finding: rc was ignored, so empty-stdout-on-error
        passed as 'sweep uncommitted')."""
        try:
            proc = subprocess.run(
                ["git", *args], cwd=ROOT, capture_output=True,
                text=True, timeout=30,
            )
        except FileNotFoundError:
            return None  # no git — nothing to check
        except Exception as exc:
            raise SystemExit(
                f"record_hashes.py: REFUSING — git {' '.join(args)} "
                f"failed ({exc}); cannot establish the swept-tree "
                "precondition. Fix git or pass --force."
            )
        if proc.returncode != 0:
            raise SystemExit(
                f"record_hashes.py: REFUSING — git {' '.join(args)} "
                f"exited {proc.returncode}: {proc.stderr.strip()}\n"
                "Cannot establish the swept-tree precondition. Fix git "
                "or pass --force."
            )
        return proc.stdout.strip()

    out = _git("status", "--porcelain", "--",
               "lightsaber_spark", "__spark_entry__.py")
    if out is None:
        return  # no git — nothing to check
    if out:
        raise SystemExit(
            "record_hashes.py: REFUSING — query-implementation files "
            "changed since the last commit:\n" + out + "\n"
            "Hashes recorded now would vouch code the driver never "
            "verified. Run at round start on the swept tree, or pass "
            "--force if the changes provably don't affect any query."
        )
    sweep = f"CORRECTNESS_r{rnd:02d}.json"
    if not os.path.exists(os.path.join(ROOT, sweep)):
        sweep = f"CORRECTNESS_r{rnd}.json"
    # Anchor on the newest commit where the sweep's CONTENT semantically
    # changed (r11 ADVICE + r12 review): the newest touch alone lets a
    # pure reformat/merge-fixup commit mask query edits made after the
    # real sweep, while the ADD commit alone falsely refuses after a
    # driver RE-SWEEP that overwrites the same round's file (the r11
    # continuation pattern) — so walk touches newest-first and stop at
    # the first whose parsed JSON differs from its parent's.
    # (no --follow: rename detection would chase the path into an OLDER
    # round's sweep file)
    touches = (_git("log", "--format=%H", "--", sweep) or "").splitlines()
    if not touches:
        return  # sweep file uncommitted/untracked — history can't date it

    def _json_at(rev: str):
        out = _git("show", f"{rev}:{sweep}")
        if out is None:
            return None
        try:
            return json.loads(out)
        except Exception:
            return out  # unparseable — compare raw text

    sweep_commit = touches[-1]  # oldest touch = the add, as a fallback
    for c in touches:
        try:
            parent = _json_at(f"{c}^")
        except SystemExit:
            parent = None  # root commit / parent lacks the file
        try:
            at_c = _json_at(c)
        except SystemExit:
            at_c = None  # commit DELETED the sweep file (r12 ADVICE):
            # an unreadable blob is a content transition, not a reason
            # to refuse with a misleading precondition error
        if at_c != parent:
            sweep_commit = c
            break
    later = _git("log", "--oneline", f"{sweep_commit}..HEAD", "--",
                 "lightsaber_spark", "__spark_entry__.py")
    if later:
        raise SystemExit(
            f"record_hashes.py: REFUSING — query-implementation commits "
            f"postdate the r{rnd} sweep ({sweep} landed in "
            f"{sweep_commit[:9]}):\n{later}\n"
            "The driver verified the code as of that sweep, not HEAD; "
            "recording now would vouch unverified implementations (they "
            "stay stale and front for the next sweep instead). Pass "
            "--force only if the later commits provably don't affect "
            "any query."
        )


def main(argv: list[str]) -> int:
    rnd = _newest_round()
    if "--round" in argv:
        rnd = int(argv[argv.index("--round") + 1])
    prune = "--prune" in argv
    if "--force" in argv:
        print("WARNING: --force — skipping the clean-tree precondition check")
    else:
        _check_tree_clean(rnd)

    green = _green_in_round(rnd)
    cur = current_hashes()
    rec = recorded_hashes()

    updated, skipped = 0, []
    for name in sorted(green):
        if name not in cur:
            skipped.append(name)
            continue
        prev = rec.get(name, {})
        if prev.get("hash") != cur[name] or prev.get("round") != rnd:
            rec[name] = {"hash": cur[name], "round": rnd}
            updated += 1
    if prune:
        dropped = [n for n in rec if n not in cur]
        for n in dropped:
            del rec[n]
        if dropped:
            print(f"pruned {len(dropped)} unregistered: {sorted(dropped)}")

    out = os.path.join(ROOT, HASHES_FILENAME)
    with open(out, "w") as f:
        json.dump({k: rec[k] for k in sorted(rec)}, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"round r{rnd:02d}: {len(green)} green, {updated} records updated, "
        f"{len(rec)} total recorded → {out}"
    )
    if skipped:
        print(f"green-but-unregistered (not recorded): {sorted(skipped)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
