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
# a direct comparison against a literal-ish operand, matched against an
# ENTIRE top-level AND-conjunct (anchored). Expressions over the column
# — length(text#5), props#7[key], a comparison buried inside a CASE
# bound — deliberately do NOT match: parquet cannot push those, so
# their scans legitimately carry empty PushedFilters.
# (column ids may carry a type suffix, e.g. user_id#2562L)
_PUSHABLE_ATOM = re.compile(
    r"^(?:isnotnull\((\w+)#(\d+)[A-Za-z]*\)"
    r"|\(?(\w+)#(\d+)[A-Za-z]* (?:=|>|<|>=|<=|<=>) [^()#]*\)?)$"
)


def _strip_outer_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    return s  # outer parens don't wrap the whole string
        s = s[1:-1].strip()
    return s


def _top_level_conjuncts(cond: str) -> list[str]:
    """Split a Condition string on AND at paren depth 0 (after removing
    one wrapping paren layer per recursion level)."""
    cond = _strip_outer_parens(cond)
    parts: list[str] = []
    depth, start, i = 0, 0, 0
    while i < len(cond):
        ch = cond[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and cond.startswith(" AND ", i):
            parts.append(cond[start:i])
            i += 5
            start = i
            continue
        i += 1
    parts.append(cond[start:])
    if len(parts) == 1:
        return [parts[0].strip()]
    out: list[str] = []
    for p in parts:
        out.extend(_top_level_conjuncts(p))
    return out

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
        for conjunct in _top_level_conjuncts(cond.group(1)):
            atom = _PUSHABLE_ATOM.match(_strip_outer_parens(conjunct))
            if atom:
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
