"""Plan-quality flags over Spark's ``formatted`` explain output.

Pure text analysis (no SparkSession needed) so both the repo-wide audit
script (``scripts/explain_audit.py``) and pytest contracts can assert
on the same logic.

Flags:
  NESTED_LOOP  — BroadcastNestedLoopJoin / CartesianProduct (O(n·m)
                 predicate evaluation; acceptable only when one side is
                 provably tiny)
  NO_PUSHDOWN  — a parquet scan with EMPTY (or absent — DSv2 omits the
                 line when nothing pushed) PushedFilters feeding a
                 Filter whose condition contains a *pushable* atom
                 (isnotnull / bare-column-vs-literal comparison) over
                 that scan's own output columns. Any filtered parquet
                 scan normally pushes at least IsNotNull, so an empty
                 list under a pushable predicate means pushdown is off
                 or broken — a full scan at 100 TB.
  SINGLE_PART  — more than one Exchange SinglePartition (serializes the
                 data through one task; a final global agg/limit
                 legitimately uses one)
"""

from __future__ import annotations

import re

# A *pushable* predicate atom over a bare top-level column: isnotnull or
# a direct comparison against a literal-ish operand. Expressions over
# the column — length(text#5), props#7[key], lower(...) — deliberately
# do NOT match: parquet cannot push those, so their scans legitimately
# carry empty PushedFilters only when no other atom is pushable.
# (column ids may carry a type suffix, e.g. user_id#2562L)
_PUSHABLE_ATOM = re.compile(
    r"isnotnull\((\w+)#(\d+)[A-Za-z]*\)"
    r"|\((\w+)#(\d+)[A-Za-z]* (?:=|>|<|>=|<=|<=>) [^()#]*\)"
)

# formatted explain detail blocks: "(N) OperatorName\nKey: value..."
_BLOCK_SPLIT = re.compile(r"\n(?=\(\d+\) )")
_SCAN_HEAD = re.compile(r"\(\d+\) (?:Batch)?Scan parquet")
_FILTER_HEAD = re.compile(r"\(\d+\) Filter\b")
_OUTPUT_LINE = re.compile(r"\nOutput(?: \[\d+\])?: \[([^\]]*)\]")
_PUSHED_LINE = re.compile(r"\nPushedFilters: \[([^\]]*)\]")
_CONDITION_LINE = re.compile(r"\nCondition : ([^\n]*)")
_COL_ID = re.compile(r"#(\d+)")


def plan_flags(plan: str) -> list[str]:
    """Return scale-hazard flags for one formatted physical plan."""
    flags: list[str] = []
    if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
        flags.append("NESTED_LOOP")

    # NO_PUSHDOWN: map Filter conditions' pushable atoms back to scans.
    blocks = _BLOCK_SPLIT.split(plan)
    pushable_ids: set[str] = set()
    for b in blocks:
        if not _FILTER_HEAD.match(b):
            continue
        cond = _CONDITION_LINE.search(b)
        if not cond:
            continue
        for atom in _PUSHABLE_ATOM.finditer(cond.group(1)):
            col_id = atom.group(2) or atom.group(4)
            if col_id:
                pushable_ids.add(col_id)
    if pushable_ids:
        for b in blocks:
            if not _SCAN_HEAD.match(b):
                continue
            out = _OUTPUT_LINE.search(b)
            if not out:
                continue
            pushed = _PUSHED_LINE.search(b)
            if pushed is not None and pushed.group(1).strip():
                continue  # something was pushed — healthy
            if set(_COL_ID.findall(out.group(1))) & pushable_ids:
                flags.append("NO_PUSHDOWN")
                break

    sp = plan.count("Exchange SinglePartition")
    if sp > 1:
        flags.append(f"SINGLE_PART×{sp}")
    return flags
