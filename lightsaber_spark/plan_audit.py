"""Plan-quality flags over Spark's ``formatted`` explain output.

Pure text analysis (no SparkSession needed) so both the repo-wide audit
script (``scripts/explain_audit.py``) and pytest contracts can assert
on the same logic.

Flags:
  NESTED_LOOP  — BroadcastNestedLoopJoin / CartesianProduct (O(n·m)
                 predicate evaluation; acceptable only when one side is
                 provably tiny)
  NO_PUSHDOWN  — a parquet scan with EMPTY (or absent — DSv2 omits the
                 line when nothing pushed) PushedFilters DIRECTLY under
                 a Filter (through transparent ops only: ColumnarToRow,
                 Project, WholeStageCodegen) whose condition has a
                 *pushable* top-level conjunct (isnotnull /
                 bare-column-vs-literal comparison) over that scan's
                 own output columns. Any filtered parquet scan normally
                 pushes at least IsNotNull, so an empty list under an
                 adjacent pushable predicate means pushdown is off or
                 broken — a full scan at 100 TB. A Filter sitting above
                 a Window/Join/Aggregate boundary is NOT adjacent: its
                 inferred isnotnull constraints legitimately cannot
                 cross the boundary.
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

# one line of the tree section: decoration (3-char groups of "   ",
# ":  ", "+- ", ":- "), optional codegen "*", operator name, "(id)"
_TREE_LINE = re.compile(r"^((?:[ :]  |[:+]- )*)\*? ?([A-Za-z][\w]*)[^(\n]*\((\d+)\)\s*$")

# ops a predicate passes through untouched on its way down to the scan
_TRANSPARENT = {"ColumnarToRow", "Project", "WholeStageCodegen", "InputAdapter"}

_AGG_OPS = {"HashAggregate", "ObjectHashAggregate", "SortAggregate"}


def _tree_nodes(plan: str) -> list[tuple[int, str, str]]:
    """(depth, name, id) per line of the formatted plan's tree section."""
    nodes: list[tuple[int, str, str]] = []
    for line in plan.splitlines():
        if line.startswith("("):
            break  # first detail block — tree section is over
        m = _TREE_LINE.match(line)
        if m:
            nodes.append((len(m.group(1)) // 3, m.group(2), m.group(3)))
    return nodes


def _bnlj_all_scalar(plan: str, by_id: dict[str, str]) -> bool:
    """True iff every BroadcastNestedLoopJoin in the plan broadcasts a
    PROVABLY single row: its BroadcastExchange child's first
    non-transparent descendant is a grouping-free aggregate
    (``Keys: []`` — a global agg emits exactly one row). Those joins
    are scalar-attach patterns (corpus counts, dense sketch bitmaps),
    not O(n·m) pair scans, and are not scale hazards."""
    nodes = _tree_nodes(plan)
    for i, (depth, name, _nid) in enumerate(nodes):
        if name != "BroadcastNestedLoopJoin":
            continue
        ok = False
        # children: following nodes at depth+1 until depth falls back
        for j in range(i + 1, len(nodes)):
            d, n, nid = nodes[j]
            if d <= depth:
                break
            if d == depth + 1 and n == "BroadcastExchange":
                # walk the exchange's single chain through transparent
                # ops to the first materializing operator
                dd = d
                for k in range(j + 1, len(nodes)):
                    cd, cn, cid = nodes[k]
                    if cd <= dd:
                        break
                    if cd == dd + 1:
                        if cn in _TRANSPARENT:
                            dd = cd
                            continue
                        if cn in _AGG_OPS and "\nKeys: []" in by_id.get(cid, ""):
                            ok = True
                        break
                break
        if not ok:
            return False
    return True


def _filter_over_scan(plan: str) -> dict[str, str]:
    """Map scan node id → the id of a Filter sitting directly above it
    (through transparent ops only), parsed from the tree section of a
    formatted plan. Scans under a Window/Join/Aggregate/Exchange have
    no entry — predicates cannot cross those boundaries."""
    nodes = _tree_nodes(plan)
    out: dict[str, str] = {}
    for i, (depth, name, nid) in enumerate(nodes):
        if name != "Scan" and name != "BatchScan":
            continue
        # walk ancestors: nearest preceding node one level shallower
        d = depth
        for j in range(i - 1, -1, -1):
            pd, pname, pid = nodes[j]
            if pd != d - 1:
                continue
            if pname in _TRANSPARENT:
                d = pd
                continue
            if pname == "Filter":
                out[nid] = pid
            break
    return out


def plan_flags(plan: str) -> list[str]:
    """Return scale-hazard flags for one formatted physical plan."""
    flags: list[str] = []
    blocks = _BLOCK_SPLIT.split(plan)
    by_id: dict[str, str] = {}
    for b in blocks:
        m = re.match(r"\((\d+)\) ", b)
        if m:
            by_id[m.group(1)] = b

    if "CartesianProduct" in plan:
        flags.append("NESTED_LOOP")
    elif "BroadcastNestedLoopJoin" in plan and not _bnlj_all_scalar(plan, by_id):
        flags.append("NESTED_LOOP")

    # NO_PUSHDOWN: for each scan, examine only the Filter directly
    # above it (tree adjacency), and flag when that filter carries a
    # pushable conjunct on the scan's columns yet the scan pushed
    # nothing.
    for scan_id, filter_id in _filter_over_scan(plan).items():
        sb = by_id.get(scan_id, "")
        fb = by_id.get(filter_id, "")
        if not _SCAN_HEAD.match(sb):
            continue
        pushed = _PUSHED_LINE.search(sb)
        if pushed is not None and pushed.group(1).strip():
            continue  # something was pushed — healthy
        out = _OUTPUT_LINE.search(sb)
        cond = _CONDITION_LINE.search(fb)
        if not out or not cond:
            continue
        scan_ids = set(_COL_ID.findall(out.group(1)))
        for conjunct in _top_level_conjuncts(cond.group(1)):
            atom = _PUSHABLE_ATOM.match(_strip_outer_parens(conjunct))
            if atom and (atom.group(2) or atom.group(4)) in scan_ids:
                flags.append("NO_PUSHDOWN")
                break
        if "NO_PUSHDOWN" in flags:
            break

    sp = plan.count("Exchange SinglePartition")
    if sp > 1:
        flags.append(f"SINGLE_PART×{sp}")
    return flags
