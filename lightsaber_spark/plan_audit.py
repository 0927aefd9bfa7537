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
  NO_CODEGEN   — (``codegen_flags``, separate pass over an AQE-OFF plan)
                 a Project/Filter outside every WholeStageCodegen span.
                 The r13 lesson: a CASE ladder too big for codegen runs
                 INTERPRETED with no warning, evaluating branch-local
                 expression copies per row (36s vs 1.15s at sf0.1 for
                 the inline private-PSL ladder) — the Spark-side twin of
                 the reference's everything-is-compiled guarantee
                 (/root/reference/src/cql/operators/codeGeneration/
                 OperatorJit.cpp:240). Exemptions: nodes under an
                 AdaptiveSparkPlan subtree (cached relations planned
                 under AQE defer codegen annotation), and blocks whose
                 expressions contain ``lambdafunction(`` — higher-order
                 functions are CodegenFallback in Spark by design — as
                 long as the block stays under 256 KB of expression
                 text. A fallback block BIGGER than that is exactly the
                 branch-local-copy blowup class and is flagged anyway.
                 Requires a plan built with spark.sql.adaptive.enabled
                 =false: under AQE the codegen stars are deferred to
                 runtime re-planning and every node looks interpreted.
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
_TREE_LINE = re.compile(r"^((?:[ :]  |[:+]- )*)(\*)? ?([A-Za-z][\w]*)[^(\n]*\((\d+)\)\s*$")

# ops a predicate passes through untouched on its way down to the scan
_TRANSPARENT = {"ColumnarToRow", "Project", "WholeStageCodegen", "InputAdapter"}

_AGG_OPS = {"HashAggregate", "ObjectHashAggregate", "SortAggregate"}


def _tree_nodes(plan: str) -> list[tuple[int, str, str]]:
    """(depth, name, id) per line of the formatted plan's tree section."""
    return [(d, name, nid) for d, _star, name, nid in _tree_nodes_cg(plan)]


def _tree_nodes_cg(plan: str) -> list[tuple[int, bool, str, str]]:
    """(depth, codegen_star, name, id) per tree-section line. The ``*``
    prefix is the authoritative whole-stage-codegen marker: detail-block
    ``[codegen id : N]`` annotations are sometimes absent on nodes whose
    tree line carries the star (observed on filters above reused
    broadcast subtrees), but a starless Project/Filter in an AQE-off
    plan really is outside every codegen span."""
    nodes: list[tuple[int, bool, str, str]] = []
    for line in plan.splitlines():
        if line.startswith("("):
            break  # first detail block — tree section is over
        m = _TREE_LINE.match(line)
        if m:
            nodes.append(
                (len(m.group(1)) // 3, m.group(2) is not None,
                 m.group(3), m.group(4))
            )
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

    # ROW_PYTHON — a row-at-a-time Python UDF in the plan (BatchEvalPython
    # pickles row batches through the legacy serializer, ~10-100× slower
    # than Arrow). The engine's rule is Arrow-batched pandas UDFs ONLY
    # (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas are fine).
    if "BatchEvalPython" in plan:
        flags.append("ROW_PYTHON")

    gw = _unbounded_global_windows(plan, by_id)
    if gw:
        flags.append(f"GLOBAL_WINDOW×{gw}")
    return flags


# ops whose output is bounded independent of input row count (a global
# aggregate/limit) or bounded by a key domain (grouped aggregate /
# distinct — both compile to the agg ops). A WindowExec with an empty
# partition spec runs its whole input through ONE task; that is only
# scale-safe when some such boundary sits between it and the raw data.
_BOUNDING_OPS = _AGG_OPS | {
    "GlobalLimit",
    "LocalLimit",
    "TakeOrderedAndProject",
    "FlatMapGroupsInPandas",  # stateful/grouped python op: per-group fold
}


def _window_partition_spec(block: str) -> str | None:
    """The partition-spec of a Window detail block. An EMPTY partition
    spec is rendered as a MISSING bracket group, not an empty one
    (measured on the catalog: global windows print
    ``Arguments: [funcs], [order]`` or just ``[funcs]``; partitioned
    ones print ``[funcs], [partition], [order]``) — so:

    - 3+ groups → second group is the partition spec;
    - 2 groups → the second is an ORDER spec (contains ASC/DESC) ⇒
      partition empty, else it is a partition-only spec;
    - 1 group → partition empty.

    Returns '' for an empty spec, the spec text otherwise, None when
    the block has no Arguments line (not a Window block)."""
    m = re.search(r"\nArguments: (.*)", block)
    if not m:
        return None
    s = m.group(1)
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start + 1 : i])
    if not groups:
        return None
    if len(groups) >= 3:
        return groups[1].strip()
    if len(groups) == 1:
        return ""
    second = groups[1].strip()
    if " ASC" in second or " DESC" in second:
        return ""  # it's the order spec — no partition group printed
    return second


def _unbounded_global_windows(plan: str, by_id: dict[str, str]) -> int:
    """Count Window nodes with an EMPTY partition spec whose input
    subtree contains no bounding operator (r14 verdict #5 — the
    mechanized form of the 'No Partition Defined' boundedness
    argument). Every legitimate catalog shape (row-window bucket
    offsets, exact median, ntile/rank over distinct values, chunk
    boundary tables, top-k) computes its global window over an
    aggregate/limit/grouped-python intermediate, so a qualifying
    Window has a bounding descendant; a global window directly over
    raw rows serializes the full input through one task — the 100 TB
    hazard. A ReusedExchange descendant counts as bounded only if its
    referenced subtree would (not resolvable textually) — none of the
    catalog's global windows sit over one, so it conservatively does
    NOT count."""
    nodes = _tree_nodes(plan)
    bad = 0
    for i, (depth, name, nid) in enumerate(nodes):
        if name != "Window":
            continue
        spec = _window_partition_spec(by_id.get(nid, ""))
        if spec is None or spec != "":
            continue
        bounded = False
        for j in range(i + 1, len(nodes)):
            d, n, _cid = nodes[j]
            if d <= depth:
                break
            if n in _BOUNDING_OPS:
                bounded = True
                break
        if not bounded:
            bad += 1
    return bad


# --- NO_CODEGEN (interpreted-eval) detection ------------------------------

# Why ONLY Project/Filter: the failure class is expression-ladder blowup,
# which Catalyst always places in a Project (or Filter) node. An r14
# starless-node census over all 171 catalog AQE-off plans found every
# other row-operator either never codegens structurally (Window,
# WindowGroupLimit, ObjectHashAggregate, MergingSessions,
# TakeOrderedAndProject, Union, exchanges, python nodes) or has RARE
# legitimately-starless instances that would need guesswork exemptions
# (4/531 HashAggregate — pivot aggregate shapes; 1/175 BroadcastHashJoin
# — non-inner build shapes; 1/91 Generate — non-codegen generator),
# while starless Project/Filter occurrences were exactly the bounded
# HOF-fallback set the exemption below covers.
_CODEGEN_CHECK_OPS = {"Project", "Filter"}
_CODEGEN_FALLBACK_MARK = "lambdafunction("
# Largest legitimate fallback block in the catalog is the PSL ladder's
# single staged InSet Project at ~84 KB; the r13 inline monster was
# 5.7 MB. 256 KB gives 3× headroom over legit and 20× margin under the
# failure class.
_CODEGEN_FALLBACK_MAX_BLOCK = 262144


def _detail_blocks(plan: str) -> dict[str, str]:
    by_id: dict[str, str] = {}
    for b in _BLOCK_SPLIT.split(plan):
        m = re.match(r"\((\d+)\) ", b)
        if m:
            by_id[m.group(1)] = b
    return by_id


def _plan_segments(plan: str) -> list[str]:
    """The main plan plus each subquery's plan as separate segments
    (each holds its own tree section; detail blocks share one global
    id space)."""
    main, sep, rest = plan.partition("===== Subqueries =====")
    segments = [main]
    if sep:
        segments.extend(re.split(r"\nSubquery:\d+", rest))
    return segments


def codegen_flags(plan: str) -> list[str]:
    """Return ["NO_CODEGEN×k"] if k Project/Filter nodes run outside
    whole-stage codegen (interpreted row-at-a-time eval). MUST be fed a
    plan generated with spark.sql.adaptive.enabled=false — under AQE
    codegen staging is deferred and every node looks starless. See the
    module docstring for the exemption rules."""
    by_id = _detail_blocks(plan)
    bad = 0
    for segment in _plan_segments(plan):
        nodes = _tree_nodes_cg(segment)
        skip_below: int | None = None
        for depth, star, name, nid in nodes:
            if skip_below is not None:
                if depth > skip_below:
                    continue
                skip_below = None
            if name == "AdaptiveSparkPlan":
                # cached InMemoryRelation subtree planned under AQE —
                # codegen annotation deferred, not evidence of fallback
                skip_below = depth
                continue
            if name in _CODEGEN_CHECK_OPS and not star:
                block = by_id.get(nid, "")
                if (
                    _CODEGEN_FALLBACK_MARK in block
                    and len(block) <= _CODEGEN_FALLBACK_MAX_BLOCK
                ):
                    continue  # bounded higher-order-function fallback
                bad += 1
    return [f"NO_CODEGEN×{bad}"] if bad else []


def formatted_plan(df, adaptive: bool | None = None) -> str:
    """Formatted explain string; with ``adaptive=False`` the physical
    plan is prepared with AQE off so codegen stars are assigned
    statically (feed that to :func:`codegen_flags`). The DataFrame must
    be freshly built — ``executedPlan`` is cached on first access, so a
    frame already explained under AQE keeps its adaptive plan. The
    caching cuts BOTH ways: calling this with ``adaptive=False``
    permanently bakes the AQE-off ``executedPlan`` into the passed
    frame (the conf is restored but the cached plan is not), so any
    later ACTION on that same frame silently runs without AQE — treat
    the frame as explain-only afterwards and rebuild before executing
    (every in-repo call site rebuilds a fresh frame)."""
    spark = df.sparkSession
    if adaptive is None:
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", str(adaptive).lower())
    try:
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
