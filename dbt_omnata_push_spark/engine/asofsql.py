"""SQL-surface ASOF JOIN (r13): Snowflake's time-series join clause —

    SELECT ...
    FROM trades t ASOF JOIN quotes q
         MATCH_CONDITION (t.ts >= q.ts)
         ON t.sym = q.sym
    [WHERE ...]

— resolved inside ``Engine.query`` (before transpile, like
MATCH_RECOGNIZE) into a temp view over the distributed as-of operator
(``ops/asof.py``: union-merge + one keyed window — never a range
cross-join). Semantics follow Snowflake: for each left row, the single
closest right row under the match condition within the ON equi-group;
left rows with no match keep NULL right columns (left-outer shape).

Supported subset (everything else raises loudly):
- exactly one ASOF JOIN per statement, table[ alias] operands;
- MATCH_CONDITION(l.ts >= r.ts | l.ts > r.ts) — the backward-looking
  forms (latest right at-or-before / strictly-before the left ts);
  the condition may be written flipped (r.ts <= l.ts). The
  forward-looking forms raise (reverse the timestamps upstream);
- ON: AND-ed equi conditions l.k = r.k (right keys rename to the left
  names for the operator);
- the resolved view exposes every left column under its own name, the
  right payload columns under theirs (collisions raise, as the
  operator does), and the matched right timestamp as
  ``matched_<rts>``; alias qualifiers (``t.``/``q.``) in the rest of
  the statement are stripped, since the view is a single relation.
"""

from __future__ import annotations

import itertools
import re

_ASOF_RE = re.compile(
    r"(?is)\bfrom\s+([A-Za-z_][\w.]*)(?:\s+(?:as\s+)?"
    r"(?!asof\b)([A-Za-z_]\w*))?"
    r"\s+asof\s+join\s+([A-Za-z_][\w.]*)(?:\s+(?:as\s+)?"
    r"(?!match_condition\b)([A-Za-z_]\w*))?"
    r"\s+match_condition\s*\("
)
_COND_RE = re.compile(
    r"(?is)^\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*"
    r"(>=|<=|>|<)\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*$"
)
_ON_PAIR_RE = re.compile(
    r"(?is)^\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*=\s*"
    r"([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*$"
)
_CLAUSE_END_RE = re.compile(
    r"(?is)\b(where|group\s+by|order\s+by|qualify|limit|having)\b"
)

_ASOF_VIEW_SEQ = itertools.count()


def _scan_balanced(text: str, open_idx: int) -> int:
    depth, i, in_str = 0, open_idx, False
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in MATCH_CONDITION")


def resolve_asof_join(engine, sql: str) -> tuple[str, list[str]]:
    """Rewrite the statement's ASOF JOIN clause into a temp-view
    reference; returns (rewritten sql, views to drop after analysis)."""
    m = _ASOF_RE.search(sql)
    if not m:
        return sql, []
    t1, a1, t2, a2 = m.group(1), m.group(2), m.group(3), m.group(4)
    a1 = (a1 or t1.rsplit(".", 1)[-1]).lower()
    a2 = (a2 or t2.rsplit(".", 1)[-1]).lower()
    cond_end = _scan_balanced(sql, m.end() - 1)
    cond = sql[m.end() : cond_end - 1]
    cm = _COND_RE.match(cond)
    if not cm:
        raise ValueError(
            "unsupported ASOF JOIN MATCH_CONDITION (expected "
            f"alias.ts >= alias.ts or a flipped form): {cond!r}"
        )
    la, lc, op, ra, rc = (
        cm.group(1).lower(),
        cm.group(2),
        cm.group(3),
        cm.group(4).lower(),
        cm.group(5),
    )
    # normalize so the LEFT alias is on the left of the comparison
    if la == a2 and ra == a1:
        la, lc, ra, rc = ra, rc, la, lc
        op = {">=": "<=", "<=": ">=", ">": "<", "<": ">"}[op]
    if la != a1 or ra != a2:
        raise ValueError(
            f"ASOF JOIN MATCH_CONDITION must compare {a1}.<ts> with "
            f"{a2}.<ts>; got {cond!r}"
        )
    if op in ("<=", "<"):
        raise ValueError(
            "forward-looking ASOF JOIN (left ts <= right ts) is not "
            "supported — reverse the timestamp ordering upstream"
        )
    strict = op == ">"
    # optional ON clause: up to the next top-level clause keyword
    rest = sql[cond_end:]
    on_pairs: list[tuple[str, str]] = []
    on_len = 0
    om = re.match(r"(?is)\s*on\s+", rest)
    if om:
        e = _CLAUSE_END_RE.search(rest, om.end())
        on_text = rest[om.end() : e.start() if e else len(rest)]
        on_len = (e.start() if e else len(rest))
        for part in re.split(r"(?is)\band\b", on_text):
            pm = _ON_PAIR_RE.match(part)
            if not pm:
                raise ValueError(
                    "unsupported ASOF JOIN ON condition (AND-ed "
                    f"alias.col = alias.col only): {part.strip()!r}"
                )
            xa, xc, ya, yc = (
                pm.group(1).lower(),
                pm.group(2),
                pm.group(3).lower(),
                pm.group(4),
            )
            if xa == a2 and ya == a1:
                xa, xc, ya, yc = ya, yc, xa, xc
            if xa != a1 or ya != a2:
                raise ValueError(
                    f"ASOF JOIN ON must pair {a1} and {a2} columns: "
                    f"{part.strip()!r}"
                )
            on_pairs.append((xc, yc))

    if not on_pairs:
        # Snowflake allows a global ASOF JOIN, but it is ONE ordered
        # merge — a single-partition window at any scale. The engine
        # refuses single-partition windows everywhere else (the
        # null-window rule); same posture here.
        raise ValueError(
            "ASOF JOIN without an ON equi-condition would be a single "
            "global ordering (one partition at 100 TB) — add an ON "
            "key, or call ops.asof.asof_join directly if you really "
            "want it"
        )

    from ..ops.asof import asof_join

    engine._register_views()
    left = engine.spark.table(t1.rsplit(".", 1)[-1])
    right = engine.spark.table(t2.rsplit(".", 1)[-1])
    # right keys rename to the left names; right ts renames to left ts
    for lk, rk in on_pairs:
        if rk != lk:
            right = right.withColumnRenamed(rk, lk)
    if rc != lc:
        right = right.withColumnRenamed(rc, lc)
    keys = [lk for lk, _rk in on_pairs]
    value_cols = [c for c in right.columns if c not in keys and c != lc]
    res = asof_join(
        left,
        right,
        on=keys,
        ts_col=lc,
        value_cols=value_cols,
        right_ts_alias=f"matched_{rc}",
        strict=strict,
    )
    view = f"__asof_{next(_ASOF_VIEW_SEQ)}"
    res.createOrReplaceTempView(view)
    out = (
        sql[: m.start()]
        + f" FROM {view} "
        + sql[cond_end + on_len :]
    )
    # the view is one relation: strip now-dangling alias qualifiers
    out = re.sub(rf"(?is)\b(?:{a1}|{a2})\s*\.\s*", "", out)
    if _ASOF_RE.search(out):
        raise ValueError(
            "multiple ASOF JOIN clauses in one statement are not "
            "supported"
        )
    return out, [view]
