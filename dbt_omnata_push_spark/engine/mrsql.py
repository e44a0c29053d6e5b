"""SQL-surface MATCH_RECOGNIZE (r11): a user of the reference dialect
writes Snowflake's clause directly —

    SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES FIRST(seq) AS s, FINAL COUNT(*) AS n
        ALL ROWS PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (D+ U+)
        DEFINE D AS price < PREV(price), U AS price > PREV(price)
    )

— and ``Engine.query`` rewrites it into a temp view over the
distributed operator (``ops/matchrec.py``: applyInPandas per
partition, vectorized DEFINE evaluation, C-regex pattern scan). The
clause is resolved BEFORE sqlfront transpile, so the body is parsed in
the reference dialect; the surrounding query (projections, WHERE,
joins against the result) continues through the normal SQL path.
Reads go through the engine's registered views, so masking and
row-access policies compose exactly as for any other FROM.

Translated subset, mirroring the operator's:
- PARTITION BY / ORDER BY (ASC or DESC per column, r13) over plain
  columns.
- MEASURES: [RUNNING|FINAL] FIRST(col) | LAST(col) | COUNT(*) |
  COUNT(sym.*) | MATCH_NUMBER() | CLASSIFIER() | SUM(col) | AVG(col) |
  MIN(col) | MAX(col), each AS alias.
- ONE ROW PER MATCH (default) | ALL ROWS PER MATCH.
- AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO [FIRST|LAST] sym.
- PATTERN (...) — the operator's regex subset.
- DEFINE sym AS <condition>: comparisons (= <> != < <= > >=),
  arithmetic, PREV(col)/NEXT(col) (LAG/LEAD-1), AND/OR/NOT,
  TRUE — translated to the operator's pandas-eval dialect — plus
  FIRST(sym.col)/LAST(sym.col) cross-symbol navigation (r13): the
  first/last row mapped to sym so far in the current match attempt
  (running, current row included), e.g.
  ``B AS price > FIRST(A.price)``.
  r14 widenings (VERDICT r13 #3/#4): FIRST/LAST take logical
  offsets (``FIRST(A.price, 2)``); bare symbol-qualified refs
  (``B AS price > A.price``) read as SQL:2016's running
  LAST(A.price); running aggregates
  ``COUNT(A.*)/COUNT(*)/SUM/AVG/MIN/MAX(col | A.col)`` carry
  per-attempt accumulators; IN / LIKE / BETWEEN / CASE /
  IS [NOT] NULL terms OFFLOAD to Spark SQL boolean columns
  evaluated JVM-side before the matcher (terms mixing those with
  PREV/NEXT/navigation in ONE comparison raise — split with
  AND/OR); MEASURES FIRST/LAST also take offsets under FINAL
  semantics.
"""
from __future__ import annotations

import itertools
import re

_MR_FROM_RE = re.compile(
    r"(?is)\bfrom\s+([A-Za-z_][\w.]*)\s+match_recognize\s*\("
)
_MEASURE_SQL_RE = re.compile(
    r"(?is)^\s*(?:(running|final)\s+)?"
    r"(first|last|count|match_number|classifier|sum|avg|min|max)\s*"
    # arg: *, col, SYM.col (r12 symbol-qualified), or SYM.*; FIRST/
    # LAST take an optional logical offset (r14)
    r"\(\s*(?:\*|([A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)?)(?:\s*\.\s*\*)?)?"
    r"(?:\s*,\s*(\d+))?"
    r"\s*\)\s*"
    r"(?:as\s+)?([A-Za-z_]\w*)\s*$"
)
_DEFINE_ITEM_RE = re.compile(
    r"(?is)^\s*([A-Za-z_]\w*)\s+as\s+(.+?)\s*$"
)


def _scan_balanced(text: str, open_idx: int) -> int:
    """Index just past the ')' closing the '(' at ``open_idx``
    (quote-aware)."""
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
    raise ValueError("unbalanced parentheses in MATCH_RECOGNIZE clause")


def _split_top_commas(text: str) -> list[str]:
    parts, depth, in_str, last = [], 0, False, 0
    for i, ch in enumerate(text):
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[last:i])
            last = i + 1
    parts.append(text[last:])
    return [p.strip() for p in parts if p.strip()]


def _split_top_keyword(text: str, word: str) -> list[str]:
    """Split on a top-level (paren/quote-aware) boolean keyword."""
    pat = re.compile(rf"(?is)\b{word}\b")
    parts, depth, in_str, last, out = [], 0, False, 0, []
    i = 0
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
        elif depth == 0:
            m = pat.match(text, i)
            if m and (i == 0 or not text[i - 1].isalnum()):
                out.append(text[last:i])
                last = m.end()
                i = m.end()
                continue
        i += 1
    out.append(text[last:])
    return out


def _shield_between_and(t: str) -> str:
    """Mask the AND that belongs to a top-level BETWEEN so the boolean
    splitter doesn't cut through it (``x BETWEEN 1 AND 5 AND y > 0``
    splits only at the second AND)."""
    out: list[str] = []
    i, n, depth, in_btw = 0, len(t), 0, False
    while i < n:
        ch = t[i]
        if ch == "'":
            j = i + 1
            while j < n and t[j] != "'":
                j += 1
            out.append(t[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch.isalpha() or ch == "_":
            m = re.match(r"[A-Za-z_]\w*", t[i:])
            w = m.group(0)
            if depth == 0 and w.lower() == "between":
                in_btw = True
            elif depth == 0 and w.lower() == "and" and in_btw:
                in_btw = False
                out.append("__mrbtwand__")
                i += m.end()
                continue
            out.append(w)
            i += m.end()
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _mask_case_spans(t: str) -> tuple[str, dict[str, str]]:
    """Replace every top-level ``CASE ... END`` span with a
    placeholder token (the span may contain AND/OR/parens that must
    not drive the boolean splitter); returns (masked text,
    placeholder -> original span)."""
    spans: dict[str, str] = {}
    while True:
        m = re.search(r"(?is)\bcase\b", t)
        if not m:
            return t, spans
        depth, i = 1, m.end()
        while i < len(t) and depth:
            cm = re.match(r"(?is)\b(case|end)\b", t[i:])
            if cm:
                depth += 1 if cm.group(1).lower() == "case" else -1
                i += cm.end()
            else:
                i += 1
        if depth:
            raise ValueError(f"CASE without END in DEFINE: {t!r}")
        ph = f"__mrcase{len(spans)}__"
        spans[ph] = t[m.start() : i]
        t = t[: m.start()] + ph + t[i:]


def _parse_in_subquery(
    term: str,
) -> tuple[str, bool, str] | None:
    """``<lhs> [NOT] IN (SELECT ...)`` -> (lhs, negated, subquery
    SQL), or None when the term is not exactly that shape (lhs with
    navigation tokens, trailing predicates after the subquery's
    close, multi-select lhs)."""
    t = term.strip()
    m = re.search(r"(?is)\b(not\s+)?in\s*(\()\s*select\b", t)
    if not m:
        return None
    try:
        if _scan_balanced(t, m.start(2)) != len(t):
            return None  # something follows the subquery's close
    except ValueError:
        return None
    lhs = t[: m.start()].strip()
    sub_sql = t[m.start(2) + 1 : len(t) - 1].strip()
    if not lhs or re.search(r"(?is)\bselect\b", lhs):
        return None
    # navigation/aggregate tokens in either part: the lhs evaluates
    # on the raw frame and the subquery through the engine — neither
    # can see match state
    nav = (
        r"(?i)\b(?:prev|next)\d*_[A-Za-z_]"
        r"|\b(?:prev|next)\s*\("
        r"|__mr(?:first|last|count|sum|avg|min|max|case|btwand)"
    )
    if re.search(nav, lhs) or re.search(nav, sub_sql):
        return None
    return lhs, bool(m.group(1)), sub_sql


def _apply_subquery_defines(
    engine, df, subq: dict[str, str]
) -> tuple:
    """Pre-evaluate each ``<expr> [NOT] IN (SELECT ...)`` DEFINE term
    (r15, VERDICT r14 #6) as a boolean column on the matcher's input:
    the subquery runs through the ENGINE (full dialect + store
    views), its distinct values LEFT-join against the source rows
    (size-gated broadcast — never a collected IN-list, never a
    per-row probe), and the matcher just reads the bit. SQL
    three-valued semantics fold to the matcher's TRUE/not-TRUE:
    a NULL lhs, or a NOT IN against a set containing NULL, yields
    NULL in SQL — which never matches, i.e. false here."""
    from pyspark.sql import functions as F

    from ..ops.partitioning import maybe_broadcast

    hidden: list[str] = []
    for ph, term in subq.items():
        lhs, neg, sub_sql = _parse_in_subquery(term)
        sub = engine.query(sub_sql)
        if len(sub.columns) != 1:
            raise ValueError(
                "MATCH_RECOGNIZE DEFINE IN-subquery must return "
                f"exactly one column: {sub_sql!r}"
            )
        vals = sub.select(
            F.col(sub.columns[0]).alias("__mrsubv")
        ).distinct()
        has_null = (
            vals.filter(F.col("__mrsubv").isNull()).limit(1).count()
            > 0
        )
        flag = vals.filter(F.col("__mrsubv").isNotNull()).withColumn(
            "__mrsubf", F.lit(True)
        )
        lhs_col = F.expr(lhs)
        matched = F.coalesce(F.col("__mrsubf"), F.lit(False))
        df = df.join(
            maybe_broadcast(flag),
            lhs_col == F.col("__mrsubv"),
            "left",
        )
        if neg:
            expr = F.when(matched, F.lit(False)).otherwise(
                lhs_col.isNotNull() & F.lit(not has_null)
            )
        else:
            expr = matched
        df = df.withColumn(ph, expr).drop("__mrsubv", "__mrsubf")
        hidden.append(ph)
    return df, hidden


_NAV_TOKEN_RE = re.compile(r"\b(prev|next)(\d*)_([A-Za-z_]\w*)")
# Keywords a foldable nav-predicate leaf may contain. Deliberately
# EXCLUDES `is` (and the CASE family): `PREV(x) IS NULL` is TRUE on a
# partition's boundary row (PREV returns NULL there), but the folded
# flag column shifts to NaN == not-matched — a predicate that can be
# TRUE on NULL input cannot fold, so IS-terms refuse instead.
_SQL_LEAF_KW = {
    "like", "ilike", "rlike", "between", "and", "or", "not", "in",
    "null", "true", "false", "escape", "distinct",
}


def _fold_uniform_nav(t: str, restore) -> tuple[str, str, str] | None:
    """A leaf mixing SQL-surface predicates with navigation folds to
    `NAV(<predicate over bare columns>)` when EVERY column reference
    carries the SAME navigation (direction + offset) — e.g.
    `PREV(state) LIKE 'err%'` ≡ the predicate evaluated on the
    previous row, so the inner predicate offloads as an SQL boolean
    column and the define reads its shifted value (r15). Returns
    (direction, offset, inner_sql) or None when the fold is unsound:
    mixed navigations, bare current-row columns alongside navigation,
    unconverted PREV(expr) calls, or match-dependent tokens."""
    if re.search(
        r"(?i)\b(?:prev|next)\s*\("
        r"|__mr(?:first|last|count|sum|avg|min|max|subq)",
        t,
    ):
        return None
    navs = {(m.group(1), m.group(2)) for m in _NAV_TOKEN_RE.finditer(t)}
    if len(navs) != 1:
        return None
    # every remaining identifier must be a keyword, a masked-span
    # placeholder, or part of the single nav form — a bare current-row
    # column alongside navigation cannot fold
    stripped_ids = _NAV_TOKEN_RE.sub(" ", re.sub(r"'(?:[^']|'')*'", " ", t))
    for ident in re.findall(r"[A-Za-z_]\w*", stripped_ids):
        # __mrbtwand__ is the shielded BETWEEN-and (no column refs);
        # a masked CASE span (__mrcaseN__) may hide CURRENT-row
        # column refs, so it blocks the fold
        if (
            ident.lower() not in _SQL_LEAF_KW
            and ident != "__mrbtwand__"
        ):
            return None
    direction, off = next(iter(navs))
    inner = _NAV_TOKEN_RE.sub(r"\3", t)
    return direction, off, restore(inner)


def _cond_to_pandas(
    cond: str,
    sql_terms: dict[str, str] | None = None,
    symbols: set[str] | None = None,
    subq_terms: dict[str, str] | None = None,
) -> str:
    """Translate a DEFINE condition from the reference dialect to the
    operator's pandas-eval dialect. Leaf terms carrying SQL-surface
    predicates the eval dialect lacks (IN / LIKE / BETWEEN / CASE /
    IS [NOT] NULL — r14, VERDICT r13 #3) are offloaded: each becomes a
    ``__mrsqlN__`` placeholder recorded in ``sql_terms``, which the
    operator pre-evaluates as a Spark SQL boolean column BEFORE the
    matcher (vectorized, JVM-side — never a Python re-implementation
    of SQL semantics). Anything the translation can't prove safe
    raises rather than mis-evaluating."""
    if sql_terms is None:
        sql_terms = {}
    s = cond.strip()
    if re.fullmatch(r"(?is)true", s):
        # Snowflake's "always matches" define; evaluate over a non-null
        # anchor is unnecessary — pandas eval accepts True.
        return "True"

    def _outside_quotes(text: str, fn) -> str:
        # apply fn only to the unquoted segments — a literal like
        # 'a=b' must pass through untouched
        parts = re.split(r"('(?:[^']|'')*')", text)
        return "".join(
            p if i % 2 else fn(p) for i, p in enumerate(parts)
        )

    # FIRST/LAST navigation in DEFINE (r13, VERDICT r12 #5):
    # FIRST(A.price) / LAST(A.price) — the first/last row mapped to A
    # so far in the CURRENT match attempt (running semantics, current
    # row included, as SQL:2016 prescribes) — and the unqualified
    # FIRST(price)/LAST(price) over all rows of the attempt. Encoded
    # as __mrfirst__SYM__col tokens; the operator evaluates symbols
    # whose condition carries one through its condition-aware NFA
    # scan instead of the vectorized pre-pass (ops/matchrec.py).
    s = _outside_quotes(
        s,
        lambda t: re.sub(
            r"(?is)\b(first|last)\s*\(\s*"
            r"(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*)"
            r"(?:\s*,\s*(\d+))?\s*\)",
            lambda m: (
                f"__mr{m.group(1).lower()}{m.group(4) or ''}__"
                f"{m.group(2) or ''}__{m.group(3)}"
            ),
            t,
        ),
    )
    # Running aggregates in DEFINE (r14, VERDICT r13 #4):
    # COUNT(A.*) / COUNT(*) (rows mapped so far), SUM/AVG/MIN/MAX/
    # COUNT over (sym-qualified or attempt-wide) columns — SQL:2016
    # running semantics, current row tentatively included. Encoded as
    # __mr<fn>__SYM__col tokens (col empty for the row-count forms);
    # like FIRST/LAST they make the define match-dependent, routing
    # the scan through the condition-aware NFA.
    def _agg_tokens(t: str) -> str:
        t = re.sub(
            r"(?is)\bcount\s*\(\s*(?:([A-Za-z_]\w*)\s*\.\s*)?\*\s*\)",
            lambda m: f"__mrcount__{m.group(1) or ''}__",
            t,
        )
        return re.sub(
            r"(?is)\b(count|sum|avg|min|max)\s*\(\s*"
            r"(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*)\s*\)",
            lambda m: (
                f"__mr{m.group(1).lower()}__"
                f"{m.group(2) or ''}__{m.group(3)}"
            ),
            t,
        )

    s = _outside_quotes(s, _agg_tokens)
    # Bare symbol-qualified references (r14): SQL:2016 reads a bare
    # ``A.price`` in DEFINE as the LAST row mapped to A so far in the
    # current attempt (running semantics — within A's own define it is
    # the current row, which is tentatively mapped to A). Translate to
    # the LAST-navigation token; qualifiers that are NOT defined
    # symbols still raise below.
    if symbols:
        s = _outside_quotes(
            s,
            lambda t: re.sub(
                r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)",
                lambda m: (
                    f"__mrlast__{m.group(1)}__{m.group(2)}"
                    if m.group(1).lower() in symbols
                    else m.group(0)
                ),
                t,
            ),
        )
    if re.search(r"\b[A-Za-z_]\w*\s*\.\s*[A-Za-z_]\w*", s):
        # Qualifiers that are not defined symbols — raise instead of
        # mis-evaluating.
        raise ValueError(
            "unsupported DEFINE condition for MATCH_RECOGNIZE: "
            f"{cond!r} (the qualifier of a symbol-qualified reference "
            "must be a defined pattern symbol)"
        )
    # CASE ... END spans must not drive the boolean splitter; mask
    # them (quote-aware) and restore at the leaf for SQL offload.
    s, case_spans = _mask_case_spans(s)

    def _ops(t: str) -> str:
        # two-arg offsets first (Snowflake PREV(col, N) -> prevN_col)
        t = re.sub(
            r"(?is)\bprev\s*\(\s*([A-Za-z_]\w*)\s*,\s*(\d+)\s*\)",
            r"prev\2_\1",
            t,
        )
        t = re.sub(
            r"(?is)\bnext\s*\(\s*([A-Za-z_]\w*)\s*,\s*(\d+)\s*\)",
            r"next\2_\1",
            t,
        )
        t = re.sub(
            r"(?is)\bprev\s*\(\s*([A-Za-z_]\w*)\s*\)", r"prev_\1", t
        )
        t = re.sub(
            r"(?is)\bnext\s*\(\s*([A-Za-z_]\w*)\s*\)", r"next_\1", t
        )
        t = t.replace("<>", "!=")
        # single = -> == (left alone when part of <=, >=, !=, ==)
        return re.sub(r"(?<![<>!=])=(?!=)", "==", t)

    s = _outside_quotes(s, _ops)
    s = _shield_between_and(s)

    def _restore(t: str) -> str:
        t = t.replace("__mrbtwand__", " and ")
        for ph, span in case_spans.items():
            t = t.replace(ph, span)
        return t

    def bool_tree(t: str) -> str:
        t = t.strip()
        # fully-wrapping parens strip and recurse (r15, VERDICT r14
        # #5): "(PREV(price) > 0 AND state LIKE 'err%')" decomposes
        # into a navigation term for the NFA and an SQL-offloaded
        # term, instead of raising as one mixed leaf
        while t.startswith("(") and _scan_balanced(t, 0) == len(t):
            t = t[1:-1].strip()
        ors = _split_top_keyword(t, "or")
        if len(ors) > 1:
            return " | ".join(f"({bool_tree(p)})" for p in ors)
        ands = _split_top_keyword(t, "and")
        if len(ands) > 1:
            return " & ".join(f"({bool_tree(p)})" for p in ands)
        m = re.match(r"(?is)^not\b(.+)$", t)
        if m:
            # NOT over a fully-SQL-offloadable operand negates INSIDE
            # the offload (r15): coalesce(NOT(expr), false) keeps
            # SQL's NULL -> not-matched, where ~coalesce(expr, false)
            # would turn a NULL operand into a match.
            restored_full = _restore(t)
            if (
                re.search(
                    r"(?is)\b(case|in|like|ilike|rlike|between|is)\b",
                    restored_full,
                )
                and not re.search(r"(?is)\bselect\b", restored_full)
                and not re.search(
                    r"(?i)\b(?:prev|next)\d*_[A-Za-z_]"
                    r"|\b(?:prev|next)\s*\("
                    r"|__mr(?:first|last|count|sum|avg|min|max|subq)",
                    restored_full,
                )
            ):
                ph = f"__mrsql{len(sql_terms)}__"
                sql_terms[ph] = restored_full
                return ph
            return f"~({bool_tree(m.group(1))})"
        # bare (possibly parenthesized) comparison/arithmetic term.
        # SQL-surface predicates the eval dialect lacks (IN / LIKE /
        # BETWEEN / CASE / IS [NOT] NULL — r14) offload to a Spark
        # SQL boolean column; subqueries and terms MIXING those with
        # PREV/NEXT/FIRST/LAST/aggregate navigation still raise.
        restored = _restore(t)
        if re.search(
            r"(?is)\b(case|in|like|ilike|rlike|between|is)\b", restored
        ):
            if re.search(r"(?is)\bselect\b", restored):
                # `<expr> [NOT] IN (SELECT ...)` (r15, VERDICT r14
                # #6): recorded for pre-evaluation as a broadcast
                # semi-join boolean column before the matcher — the
                # same offload seam as __mrsqlN__, but resolved by
                # the ENGINE (the subquery needs store tables).
                if (
                    subq_terms is not None
                    and _parse_in_subquery(restored) is not None
                ):
                    ph = f"__mrsubq{len(subq_terms)}__"
                    subq_terms[ph] = restored
                    return ph
                raise ValueError(
                    "unsupported DEFINE condition for MATCH_RECOGNIZE: "
                    f"{cond!r} (only `<expr> [NOT] IN (SELECT ...)` "
                    "subqueries are supported in DEFINE)"
                )
            if re.search(
                r"(?i)\b(?:prev|next)\d*_[A-Za-z_]"
                r"|\b(?:prev|next)\s*\("
                r"|__mr(?:first|last|count|sum|avg|min|max)__",
                restored,
            ):
                folded = _fold_uniform_nav(t, _restore)
                if folded is not None:
                    direction, off, inner_sql = folded
                    ph = f"__mrsql{len(sql_terms)}__"
                    sql_terms[ph] = inner_sql
                    return f"({direction}{off}_{ph} == True)"
                raise ValueError(
                    "unsupported DEFINE condition for "
                    f"MATCH_RECOGNIZE: {cond!r} (PREV/NEXT/FIRST/"
                    "LAST/aggregates cannot combine with IN/LIKE/"
                    "BETWEEN/CASE/IS in one comparison term — split "
                    "them with AND/OR)"
                )
            ph = f"__mrsql{len(sql_terms)}__"
            sql_terms[ph] = restored
            return ph
        return t

    return bool_tree(s)


def _parse_body(body: str) -> dict:
    def clause(pat):
        return re.search(pat, body)

    pb = clause(r"(?is)\bpartition\s+by\s+(.*?)\s*\border\s+by\b")
    ob = clause(
        r"(?is)\border\s+by\s+(.*?)\s*"
        r"\b(?:measures|one\s+row|all\s+rows|after\s+match|pattern)\b"
    )
    if not pb or not ob:
        raise ValueError(
            "MATCH_RECOGNIZE requires PARTITION BY ... ORDER BY ... "
            "(both, in that order)"
        )
    partition_by = [c.strip().strip('"') for c in pb.group(1).split(",")]
    order_by = []
    for c in ob.group(1).split(","):
        c = c.strip()
        desc = bool(re.search(r"(?is)\s+desc\s*$", c))
        c = re.sub(r"(?is)\s+(asc|desc)\s*$", "", c).strip().strip('"')
        # DESC supported (r13, VERDICT r12 #6): the operator sorts
        # each partition by the requested direction before matching
        order_by.append(f"{c} DESC" if desc else c)

    meas = clause(
        r"(?is)\bmeasures\s+(.*?)\s*"
        r"\b(?:one\s+row\s+per\s+match|all\s+rows\s+per\s+match|"
        r"after\s+match|pattern\s*\()"
    )
    measures: dict[str, str] = {}
    if meas:
        for item in _split_top_commas(meas.group(1)):
            m = _MEASURE_SQL_RE.match(item)
            if not m:
                raise ValueError(
                    f"unsupported MATCH_RECOGNIZE measure: {item!r}"
                )
            prefix = (m.group(1) or "").lower()
            kind, arg, off, alias = (
                m.group(2).lower(),
                m.group(3),
                m.group(4),
                m.group(5),
            )
            if kind in ("match_number", "classifier") and arg:
                raise ValueError(
                    f"{kind}() takes no argument: {item!r}"
                )
            if off and kind not in ("first", "last"):
                raise ValueError(
                    f"only FIRST/LAST take a logical offset: {item!r}"
                )
            if arg:
                # normalize `SYM . col` spacing for the operator's
                # measure parser (r12)
                arg = re.sub(r"\s*\.\s*", ".", arg)
            expr = f"{kind}({arg or ''}{', ' + off if off else ''})"
            measures[alias] = f"{prefix} {expr}".strip()

    if clause(
        r"(?is)\ball\s+rows\s+per\s+match\s+with\s+unmatched\s+rows\b"
    ):
        # r14: unmatched input rows emit with every measure NULL
        rows_per_match = "all_unmatched"
    elif clause(r"(?is)\ball\s+rows\s+per\s+match\b"):
        rows_per_match = "all"
    else:
        rows_per_match = "one"

    skip: str | tuple[str, str] = "past_last"
    sk = clause(
        r"(?is)\bafter\s+match\s+skip\s+"
        r"(past\s+last\s+row|to\s+next\s+row|"
        r"to\s+(?:(first|last)\s+)?([A-Za-z_]\w*))"
    )
    if sk:
        head = re.sub(r"\s+", " ", sk.group(1).lower())
        if head == "past last row":
            skip = "past_last"
        elif head == "to next row":
            skip = "next_row"
        else:
            # SKIP TO sym defaults to LAST sym, as in Snowflake
            skip = ((sk.group(2) or "last").lower(), sk.group(3))

    pm = clause(r"(?is)\bpattern\s*\(")
    if not pm:
        raise ValueError("MATCH_RECOGNIZE requires PATTERN (...)")
    p_end = _scan_balanced(body, pm.end() - 1)
    pattern = body[pm.end() : p_end - 1].strip()

    dm = clause(r"(?is)\bdefine\s+(.+)$")
    if not dm:
        raise ValueError("MATCH_RECOGNIZE requires DEFINE ...")
    defines: dict[str, str] = {}
    sql_terms: dict[str, str] = {}
    subq_terms: dict[str, str] = {}
    # two passes: bare SYM.col references can point at symbols defined
    # LATER in the clause, so collect every name first
    items = []
    for item in _split_top_commas(dm.group(1)):
        m = _DEFINE_ITEM_RE.match(item)
        if not m:
            raise ValueError(
                f"unparsable MATCH_RECOGNIZE DEFINE item: {item!r}"
            )
        items.append((m.group(1), m.group(2)))
    sym_names = {n.lower() for n, _c in items}
    for n, c in items:
        defines[n] = _cond_to_pandas(c, sql_terms, sym_names, subq_terms)

    return dict(
        partition_by=partition_by,
        order_by=order_by,
        defines=defines,
        pattern=pattern,
        measures=measures,
        rows_per_match=rows_per_match,
        skip=skip,
        sql_defines=sql_terms,
        subq_defines=subq_terms,
    )


_MR_VIEW_SEQ = itertools.count()


def resolve_match_recognize(engine, sql: str) -> tuple[str, list[str]]:
    """Rewrite every ``FROM <table> MATCH_RECOGNIZE (...)`` in ``sql``
    into a reference to a temp view holding the operator's result.

    Returns the rewritten SQL and the temp views it registered so the
    caller can drop them once the statement is ANALYZED (ADVICE r11
    #5): view names come from a process-wide monotonic counter — the
    previous salted-``hash()`` name let two concurrent statements in
    one session collide on ``createOrReplaceTempView`` and read each
    other's results, and the views were never dropped."""
    out = sql
    views: list[str] = []
    for _ in range(10):  # bounded: >10 clauses in one statement is absurd
        # Derived-table input (r15): `FROM (subquery) [alias]
        # MATCH_RECOGNIZE (...)` — the subquery resolves through the
        # full reference dialect (its own ASOF/MR/time-travel
        # included) before feeding the matcher. Scanned first so a
        # table-form regex can't mis-fire on a name INSIDE the
        # subquery's own FROM.
        sub = None
        for cand in re.finditer(r"(?is)\bfrom\s*\(", out):
            try:
                close = _scan_balanced(out, cand.end() - 1)
            except ValueError:
                continue
            tail = re.match(
                r"(?is)\s*(?:as\s+)?(?:[A-Za-z_]\w*\s+)?"
                r"match_recognize\s*\(",
                out[close:],
            )
            if tail:
                sub = (cand.start(), cand.end(), close, close + tail.end())
                break
        tm = _MR_FROM_RE.search(out)
        if sub is not None and (tm is None or sub[0] <= tm.start()):
            start, body_open, close, mr_open_end = sub
            src_sql = out[body_open : close - 1]
            mr_start = start
            mr_paren_end = mr_open_end
        elif tm is not None:
            src_sql = None
            mr_start = tm.start()
            mr_paren_end = tm.end()
        else:
            return out, views
        end = _scan_balanced(out, mr_paren_end - 1)
        body = out[mr_paren_end : end - 1]
        spec = _parse_body(body)
        from ..ops.matchrec import match_recognize

        engine._register_views()
        if src_sql is not None:
            df = engine.query(src_sql)
        else:
            df = engine.spark.table(tm.group(1).rsplit(".", 1)[-1])
        subq = spec.pop("subq_defines", None) or {}
        hidden: list[str] = []
        if subq:
            df, hidden = _apply_subquery_defines(engine, df, subq)
        res = match_recognize(df, hidden_cols=hidden or None, **spec)
        view = f"__mr_{next(_MR_VIEW_SEQ)}"
        res.createOrReplaceTempView(view)
        engine._mark_shadowed(view)
        views.append(view)
        out = out[:mr_start] + f"FROM {view}" + out[end:]
    raise ValueError("too many MATCH_RECOGNIZE clauses in one statement")
