"""Minimal Snowflake-dialect -> Spark SQL rewriter.

Lets the reference's model SQL run near-verbatim through ``spark.sql``
(SURVEY.md §7 step 7). Deliberately minimal-but-sufficient: ONLY the
constructs that actually appear in the reference repo (§2.2 inventory)
are rewritten; this is a pre-processing pass on SQL text, not a general
transpiler and not a Catalyst extension.

| Snowflake construct                  | rewrite                           |
|--------------------------------------|-----------------------------------|
| ``expr::type`` casts                 | ``CAST(expr AS type)``            |
| ``col:"Field"`` variant path         | ``get_json_object(col,'$.Field')``|
| ``OBJECT_CONSTRUCT('k', v, ...)``    | ``to_json(named_struct(...))``    |
| ``PARSE_JSON('literal')``            | the literal (JSON-string boundary)|
| ``ARRAY_CONSTRUCT(a, b)``            | ``array(a, b)``                   |
| ``ARRAY_AGG(x)``                     | ``collect_list(x)``               |
| ``UUID_STRING()``                    | ``uuid()``                        |
| ``IFF(c, a, b)``                     | ``if(c, a, b)``                   |
| ``DATEADD(part, n, expr)``           | ``timestampadd(part, n, expr)``   |
| ``LISTAGG(x, d)``                    | ``array_join(collect_list(x), d)``|
| ``TO_VARCHAR(x)``                    | ``CAST(x AS STRING)``             |
| ``row_number() over (partition by null order by null)`` | GLOBAL_ROWNUM_MARKER -> ``with_global_index`` |
| ``RATIO_TO_REPORT(x) OVER (w)``      | ``x / sum(x) OVER (w)``           |
| ``CONDITIONAL_TRUE_EVENT(p) OVER w`` | framed running ``sum(CASE ...)``  |
| ``TABLE(GENERATOR(ROWCOUNT => n))``  | ``range(n)`` (+ SEQ4/SEQ8 -> id)  |
| ``, LATERAL SPLIT_TO_TABLE(x, d) f`` | FLATTEN form -> LATERAL VIEW      |
| ``SELECT TOP n`` (outermost)         | ``... LIMIT n``                   |

(IFF/DATEADD/LISTAGG/TO_VARCHAR exceed the reference's own surface —
they are the most common Snowflake idioms in user model SQL that would
be pointed at this engine; NVL/COALESCE/CURRENT_TIMESTAMP parse
natively in Spark and need no rewrite. The r12 second wave added
TIME_SLICE / CONVERT_TIMEZONE / MONTHNAME / DAYNAME / REGEXP_SUBSTR /
Snowflake array signatures / TRUNCATE / HAVERSINE / OBJECT_KEYS /
SKEW; the r13 third wave adds the REGEXP_REPLACE/COUNT/LIKE/INSTR
long forms, PREVIOUS_DAY / LAST_DAY(part) / ISO calendar parts,
scalar BITAND-family and BOOLAND-family, EQUAL_NULL, NVL2, HLL,
RTRIMMED_LENGTH, and multiset ARRAY_EXCEPT / 0-based ARRAY_REMOVE_AT
+ ARRAY_INSERT / ARRAY_SORT flag forms — all JVM-side rewrites.)

Any OTHER window function over the null window raises: the only faithful
Spark plan is a single-partition Window, a silent scale-killer at 100 TB,
and the reference's own SQL only ever uses row_number() there.

VARIANT policy (SURVEY.md §1.2): records are JSON strings at SQL
boundaries, so OBJECT_CONSTRUCT serializes and ``:"path"`` extraction
reads with get_json_object; both compose (extraction after construction
round-trips through JSON text exactly like Snowflake's VARIANT).
"""

from __future__ import annotations

import re

_TYPE_MAP = {
    "varchar": "string",
    "string": "string",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "double": "double",
    "float": "double",
    "date": "date",
    "timestamp": "timestamp",
    "boolean": "boolean",
    "variant": "string",  # VARIANT boundary = JSON string
    "number": "decimal(38,0)",
}

_CAST_TYPE_RE = re.compile(
    r"::\s*(varchar|string|integer|int|bigint|double|float|date|timestamp|"
    r"boolean|variant|number)\s*(\(\s*\d+(?:\s*,\s*\d+)?\s*\))?",
    re.IGNORECASE,
)
_PATH_RE = re.compile(r'([A-Za-z_][A-Za-z_0-9.]*)\s*:\s*"([^"]+)"')
# r12: the UNQUOTED Snowflake path form — col:field.sub[0] — the form
# real queries actually write (the quoted form is for exotic keys).
# Cast (`::`) never matches: the char after the colon must start an
# identifier. Applied only OUTSIDE string literals.
_PATH_UNQ_RE = re.compile(
    r"\b([A-Za-z_][A-Za-z_0-9.]*)\s*:\s*"
    r"([A-Za-z_]\w*(?:\.[A-Za-z_]\w*|\[\d+\])*)"
)


def _rewrite_unquoted_paths(sql: str) -> str:
    # Skip single-quoted literals AND double-quoted identifiers: a
    # colon inside `"weird:ident"` is part of the identifier, not a
    # variant path (r12 advice). The quoted path form col:"field" was
    # already rewritten by _PATH_RE before this runs.
    parts = re.split(r"('(?:[^']|'')*'|\"[^\"]*\")", sql)
    return "".join(
        p
        if i % 2
        else _PATH_UNQ_RE.sub(
            lambda m: (
                f"get_json_object({m.group(1)}, '$.{m.group(2)}')"
            ),
            p,
        )
        for i, p in enumerate(parts)
    )
_FUNC_RES = {
    "OBJECT_CONSTRUCT": re.compile(r"\bobject_construct\s*\(", re.IGNORECASE),
    "OBJECT_AGG": re.compile(r"\bobject_agg\s*\(", re.IGNORECASE),
    "PARSE_JSON": re.compile(r"\bparse_json\s*\(", re.IGNORECASE),
    "ARRAY_CONSTRUCT": re.compile(r"\barray_construct\s*\(", re.IGNORECASE),
    "ARRAY_AGG": re.compile(r"\barray_agg\s*\(", re.IGNORECASE),
    "UUID_STRING": re.compile(r"\buuid_string\s*\(\s*\)", re.IGNORECASE),
    "IFF": re.compile(r"\biff\s*\(", re.IGNORECASE),
    "DATEADD": re.compile(r"\bdateadd\s*\(", re.IGNORECASE),
    "LISTAGG": re.compile(r"\blistagg\s*\(", re.IGNORECASE),
    "TO_VARCHAR": re.compile(r"\bto_varchar\s*\(", re.IGNORECASE),
    "DATEDIFF": re.compile(r"\bdatediff\s*\(", re.IGNORECASE),
    "NVL": re.compile(r"\bnvl\s*\(", re.IGNORECASE),
    "ZEROIFNULL": re.compile(r"\bzeroifnull\s*\(", re.IGNORECASE),
    "NULLIFZERO": re.compile(r"\bnullifzero\s*\(", re.IGNORECASE),
    "TRY_TO_NUMBER": re.compile(r"\btry_to_number\s*\(", re.IGNORECASE),
    "ARRAY_SIZE": re.compile(r"\barray_size\s*\(", re.IGNORECASE),
    # r11: Snowflake aggregate aliases + scalar fillers Spark lacks
    "BOOLAND_AGG": re.compile(r"\bbooland_agg\s*\(", re.IGNORECASE),
    "BOOLOR_AGG": re.compile(r"\bboolor_agg\s*\(", re.IGNORECASE),
    "BOOLXOR_AGG": re.compile(r"\bboolxor_agg\s*\(", re.IGNORECASE),
    "BITAND_AGG": re.compile(r"\bbitand_agg\s*\(", re.IGNORECASE),
    "BITOR_AGG": re.compile(r"\bbitor_agg\s*\(", re.IGNORECASE),
    "BITXOR_AGG": re.compile(r"\bbitxor_agg\s*\(", re.IGNORECASE),
    "ARRAY_UNIQUE_AGG": re.compile(
        r"\barray_unique_agg\s*\(", re.IGNORECASE
    ),
    "CHARINDEX": re.compile(r"\bcharindex\s*\(", re.IGNORECASE),
    "DIV0": re.compile(r"\bdiv0\s*\(", re.IGNORECASE),
    "DIV0NULL": re.compile(r"\bdiv0null\s*\(", re.IGNORECASE),
    "EDITDISTANCE": re.compile(r"\beditdistance\s*\(", re.IGNORECASE),
    "STRTOK": re.compile(r"\bstrtok\s*\(", re.IGNORECASE),
    "SQUARE": re.compile(r"\bsquare\s*\(", re.IGNORECASE),
    "TO_DOUBLE": re.compile(r"\bto_double\s*\(", re.IGNORECASE),
    "TRY_TO_DOUBLE": re.compile(r"\btry_to_double\s*\(", re.IGNORECASE),
    "TO_BOOLEAN": re.compile(r"\bto_boolean\s*\(", re.IGNORECASE),
    "TRY_TO_BOOLEAN": re.compile(
        r"\btry_to_boolean\s*\(", re.IGNORECASE
    ),
    "ARRAY_CAT": re.compile(r"\barray_cat\s*\(", re.IGNORECASE),
    "ARRAY_TO_STRING": re.compile(
        r"\barray_to_string\s*\(", re.IGNORECASE
    ),
    "ARRAY_INTERSECTION": re.compile(
        r"\barray_intersection\s*\(", re.IGNORECASE
    ),
    "BITSHIFTLEFT": re.compile(r"\bbitshiftleft\s*\(", re.IGNORECASE),
    "BITSHIFTRIGHT": re.compile(r"\bbitshiftright\s*\(", re.IGNORECASE),
    "GREATEST_IGNORE_NULLS": re.compile(
        r"\bgreatest_ignore_nulls\s*\(", re.IGNORECASE
    ),
    "LEAST_IGNORE_NULLS": re.compile(
        r"\bleast_ignore_nulls\s*\(", re.IGNORECASE
    ),
    # r12: second wave — date/regex/array fillers
    "CONVERT_TIMEZONE": re.compile(
        r"\bconvert_timezone\s*\(", re.IGNORECASE
    ),
    "MONTHNAME": re.compile(r"\bmonthname\s*\(", re.IGNORECASE),
    "DAYNAME": re.compile(r"\bdayname\s*\(", re.IGNORECASE),
    "REGEXP_SUBSTR": re.compile(r"\bregexp_substr\s*\(", re.IGNORECASE),
    "ARRAY_POSITION": re.compile(r"\barray_position\s*\(", re.IGNORECASE),
    "ARRAY_CONTAINS": re.compile(r"\barray_contains\s*\(", re.IGNORECASE),
    "ARRAY_SLICE": re.compile(r"\barray_slice\s*\(", re.IGNORECASE),
    "ARRAY_COMPACT": re.compile(r"\barray_compact\s*\(", re.IGNORECASE),
    "ARRAY_FLATTEN": re.compile(r"\barray_flatten\s*\(", re.IGNORECASE),
    "ARRAY_GENERATE_RANGE": re.compile(
        r"\barray_generate_range\s*\(", re.IGNORECASE
    ),
    "OBJECT_KEYS": re.compile(r"\bobject_keys\s*\(", re.IGNORECASE),
    "TRY_PARSE_JSON": re.compile(r"\btry_parse_json\s*\(", re.IGNORECASE),
    "TRUNCATE_NUM": re.compile(r"\btruncate\s*\(", re.IGNORECASE),
    "TIME_SLICE": re.compile(r"\btime_slice\s*\(", re.IGNORECASE),
    "HAVERSINE": re.compile(r"\bhaversine\s*\(", re.IGNORECASE),
    # Snowflake SKEW/KURTOSIS == Spark skewness/kurtosis (same
    # sample-moment definitions); only SKEW needs the name bridge
    "SKEW": re.compile(r"\bskew\s*\(", re.IGNORECASE),
    # r13: third wave — regex long forms, ISO-calendar parts, scalar
    # bit/bool fillers, multiset/0-based array forms
    "REGEXP_REPLACE": re.compile(r"\bregexp_replace\s*\(", re.IGNORECASE),
    "REGEXP_COUNT": re.compile(r"\bregexp_count\s*\(", re.IGNORECASE),
    "REGEXP_LIKE": re.compile(r"\bregexp_like\s*\(", re.IGNORECASE),
    "REGEXP_INSTR": re.compile(r"\bregexp_instr\s*\(", re.IGNORECASE),
    "PREVIOUS_DAY": re.compile(r"\bprevious_day\s*\(", re.IGNORECASE),
    "LAST_DAY": re.compile(r"\blast_day\s*\(", re.IGNORECASE),
    "DAYOFWEEKISO": re.compile(r"\bdayofweekiso\s*\(", re.IGNORECASE),
    "WEEKISO": re.compile(r"\bweekiso\s*\(", re.IGNORECASE),
    "YEAROFWEEKISO": re.compile(r"\byearofweekiso\s*\(", re.IGNORECASE),
    "BITAND": re.compile(r"\bbitand\s*\(", re.IGNORECASE),
    "BITOR": re.compile(r"\bbitor\s*\(", re.IGNORECASE),
    "BITXOR": re.compile(r"\bbitxor\s*\(", re.IGNORECASE),
    "BITNOT": re.compile(r"\bbitnot\s*\(", re.IGNORECASE),
    "BOOLAND": re.compile(r"\bbooland\s*\(", re.IGNORECASE),
    "BOOLOR": re.compile(r"\bboolor\s*\(", re.IGNORECASE),
    "BOOLXOR": re.compile(r"\bboolxor\s*\(", re.IGNORECASE),
    "BOOLNOT": re.compile(r"\bboolnot\s*\(", re.IGNORECASE),
    "EQUAL_NULL": re.compile(r"\bequal_null\s*\(", re.IGNORECASE),
    "NVL2": re.compile(r"\bnvl2\s*\(", re.IGNORECASE),
    "HLL": re.compile(r"\bhll\s*\(", re.IGNORECASE),
    "RTRIMMED_LENGTH": re.compile(
        r"\brtrimmed_length\s*\(", re.IGNORECASE
    ),
    "ARRAY_EXCEPT": re.compile(r"\barray_except\s*\(", re.IGNORECASE),
    "ARRAY_REMOVE_AT": re.compile(
        r"\barray_remove_at\s*\(", re.IGNORECASE
    ),
    "ARRAY_INSERT": re.compile(r"\barray_insert\s*\(", re.IGNORECASE),
    "ARRAY_SORT": re.compile(r"\barray_sort\s*\(", re.IGNORECASE),
}
# Snowflake `FROM t, LATERAL FLATTEN(input => expr) f` -> Spark
# `FROM t LATERAL VIEW posexplode(expr) f AS index, value` (the alias
# then serves f.value / f.index exactly as Snowflake's does).
_FLATTEN_RE = re.compile(
    r",\s*lateral\s+flatten\s*\(\s*(?:input\s*=>\s*)?",
    re.IGNORECASE,
)


def _split_top_level_args(args: str) -> list[str]:
    """Split a call's argument text on top-level commas (quote/paren aware)."""
    parts, depth, start, quote = [], 0, 0, None
    for i, c in enumerate(args):
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(args[start:i].strip())
            start = i + 1
    parts.append(args[start:].strip())
    return parts
_GLOBAL_WINDOW_RE = re.compile(
    r"over\s*\(\s*partition\s+by\s+null\s+order\s+by\s+null\s*\)", re.IGNORECASE
)
# row_number() over the null window -> resolved by resolve_global_rownum
# into ops.rownum.with_global_index (no Window operator in the plan).
_GLOBAL_ROWNUM_RE = re.compile(
    r"row_number\s*\(\s*\)\s*over\s*\(\s*partition\s+by\s+null\s+order\s+by\s+null\s*\)",
    re.IGNORECASE,
)
GLOBAL_ROWNUM_MARKER = "__global_row_number__()"
# QUALIFY <pred> [ORDER BY ...] [LIMIT ...] — Snowflake's post-window
# filter, absent from OSS Spark.
_QUALIFY_RE = re.compile(r"\bqualify\b", re.IGNORECASE)
_QUALIFY_TAIL_RE = re.compile(r"\b(order\s+by|limit)\b", re.IGNORECASE)


def _find_expr_start(sql: str, cast_pos: int) -> int:
    """Backward scan for the start of the expression preceding ``::``.

    Handles identifiers, dotted names, string literals, function calls
    and parenthesized expressions — the only shapes the reference casts
    (SURVEY.md §2.2 scalar functions)."""
    i = cast_pos - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i < 0:
        return 0
    if sql[i] in ")\"']":  # parenthesized expr / quoted ident / literal
        close = sql[i]
        openers = {")": "(", '"': '"', "'": "'", "]": "["}
        opener = openers[close]
        depth = 0
        while i >= 0:
            c = sql[i]
            if c == close and (close != opener or depth == 0):
                depth += 1
            elif c == opener:
                depth -= 1
                if depth == 0:
                    i -= 1
                    break
            i -= 1
        # include a preceding function name: foo(...)::int
        j = i
        while j >= 0 and (sql[j].isalnum() or sql[j] in "_."):
            j -= 1
        return j + 1
    while i >= 0 and (sql[i].isalnum() or sql[i] in "_.$"):
        i -= 1
    return i + 1


def _rewrite_casts(sql: str) -> str:
    while True:
        m = _CAST_TYPE_RE.search(sql)
        if not m:
            return sql
        ty = _TYPE_MAP[m.group(1).lower()]
        if m.group(2) and ty == "string":
            pass  # varchar(100) -> string (length is metadata only)
        elif m.group(2):
            if ty.startswith("decimal"):
                # number(10,2) -> decimal(10,2): the explicit precision
                # replaces the bare-`number` default of decimal(38,0).
                ty = f"decimal{m.group(2).replace(' ', '')}"
        start = _find_expr_start(sql, m.start())
        expr = sql[start : m.start()].strip()
        sql = f"{sql[:start]}CAST({expr} AS {ty}){sql[m.end():]}"


def _rewrite_funcs(sql: str) -> str:
    def replace_call(sql: str, pattern: re.Pattern, transform) -> str:
        while True:
            m = pattern.search(sql)
            if not m:
                return sql
            # quote-aware balanced scan: a '(' inside a string literal
            # (e.g. the regex '[(]x') must not bump the depth (ADVICE
            # r14 #3 fallout)
            depth, i, quote = 1, m.end(), None
            while i < len(sql) and depth:
                c = sql[i]
                if quote:
                    if c == quote:
                        quote = None
                elif c in "'\"":
                    quote = c
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                i += 1
            inner = sql[m.end() : i - 1]
            sql = sql[: m.start()] + transform(inner) + sql[i:]

    sql = _FUNC_RES["UUID_STRING"].sub("uuid()", sql)
    sql = replace_call(
        sql, _FUNC_RES["OBJECT_CONSTRUCT"], lambda a: f"to_json(named_struct({a}))"
    )
    sql = replace_call(sql, _FUNC_RES["PARSE_JSON"], lambda a: a.strip())

    def object_agg(a: str) -> str:
        # OBJECT_AGG(k, v) -> one JSON object per group, keys sorted
        # (deterministic rendering); values render as their string
        # form — the same VARIANT-at-the-boundary trade
        # ARRAY_CONSTRUCT documents. array_sort on the (key, value)
        # struct orders by key.
        k, v = (p.strip() for p in _split_top_level_args(a))
        return (
            f"to_json(map_from_entries(array_sort(collect_list("
            f"struct(CAST({k} AS STRING), CAST({v} AS STRING))))))"
        )

    sql = replace_call(sql, _FUNC_RES["OBJECT_AGG"], object_agg)
    def array_construct(a: str) -> str:
        # Snowflake's ARRAY_CONSTRUCT builds an ARRAY of VARIANTs — a
        # bare Spark array(...) would instead coerce mixed arguments to
        # one type (silently casting JSON payload strings to BIGINT when
        # the first element is numeric). Render every element as its
        # string/variant form, the same way variant values print.
        if not a.strip():
            return "array()"
        parts = _split_top_level_args(a)
        return "array(" + ", ".join(f"CAST({p} AS STRING)" for p in parts) + ")"

    sql = replace_call(sql, _FUNC_RES["ARRAY_CONSTRUCT"], array_construct)
    # WITHIN GROUP (ORDER BY k1 [ASC|DESC], k2 ...) on ARRAY_AGG /
    # LISTAGG (r13, widened r14): Spark's collect_list has no ordered
    # form — sort structs of (order-keys..., value) and project the
    # value back out, all JVM-side. Single ascending key uses the
    # plain struct sort (array_sort orders by fields left to right);
    # DESC reverses it; multiple keys or mixed directions use an
    # array_sort comparator (VERDICT r13 #7). Note the struct sort
    # breaks order-key TIES by value and reverse() flips ties too:
    # Snowflake leaves tie order unspecified, so this is a
    # deterministic superset, not a divergence. Must run BEFORE the
    # plain ARRAY_AGG/LISTAGG rewrites so the WITHIN GROUP suffix is
    # consumed with the call.
    def within_group_pass(sql: str) -> str:
        pat = re.compile(
            r"(?is)\b(array_agg|listagg)\s*\(", re.IGNORECASE
        )

        def scan_close(s: str, start: int) -> int:
            # index just past the ')' matching the '(' before start
            depth, i = 1, start
            while i < len(s) and depth:
                if s[i] == "(":
                    depth += 1
                elif s[i] == ")":
                    depth -= 1
                i += 1
            return i

        pos = 0
        while True:
            m = pat.search(sql, pos)
            if not m:
                return sql
            i = scan_close(sql, m.end())
            inner = sql[m.end() : i - 1]
            wm = re.match(
                r"(?is)\s*within\s+group\s*\(", sql[i:]
            )
            if not wm:
                pos = i
                continue
            # balanced close of the WITHIN GROUP clause (ADVICE r13
            # #4: the old non-greedy match stopped at the FIRST ')',
            # truncating function-call order keys like lower(k))
            wg_end = scan_close(sql, i + wm.end())
            wg_body = sql[i + wm.end() : wg_end - 1]
            ob = re.match(r"(?is)\s*order\s+by\s+(.+)$", wg_body)
            if not ob:
                raise ValueError(
                    "WITHIN GROUP requires (ORDER BY ...): "
                    f"{wg_body.strip()!r}"
                )
            keys: list[tuple[str, str]] = []
            for part in _split_top_level_args(ob.group(1)):
                km = re.match(
                    r"(?is)^\s*(.*?)(?:\s+(asc|desc))?\s*$", part
                )
                keys.append(
                    (km.group(1).strip(), (km.group(2) or "asc").lower())
                )
            if not all(k for k, _d in keys):
                raise ValueError(
                    f"unparsable WITHIN GROUP order key in {wg_body!r}"
                )
            fn = m.group(1).lower()
            if fn == "array_agg":
                val = inner.strip()
                delim = None
            else:
                parts = [
                    p.strip() for p in _split_top_level_args(inner)
                ]
                val = parts[0]
                delim = parts[1] if len(parts) > 1 else "''"
            entries = ", ".join(
                f"'o{j}', {k}" for j, (k, _d) in enumerate(keys)
            )
            collected = (
                f"collect_list(named_struct({entries}, 'v', {val}))"
            )
            if len(keys) == 1:
                sorted_vals = f"array_sort({collected})"
                if keys[0][1] == "desc":
                    sorted_vals = f"reverse({sorted_vals})"
            else:
                # comparator: per-key three-way compare, ASC nulls
                # last / DESC nulls first (Snowflake's defaults)
                conds = []
                for j, (_k, d) in enumerate(keys):
                    lo, hi = ("-1", "1") if d == "asc" else ("1", "-1")
                    nl = "1" if d == "asc" else "-1"
                    nf = "-1" if d == "asc" else "1"
                    conds.append(
                        f"when l.o{j} is null and r.o{j} is not null "
                        f"then {nl} "
                        f"when l.o{j} is not null and r.o{j} is null "
                        f"then {nf} "
                        f"when l.o{j} < r.o{j} then {lo} "
                        f"when l.o{j} > r.o{j} then {hi}"
                    )
                cmp_case = "case " + " ".join(conds) + " else 0 end"
                # the __sf_ placeholder name keeps the Snowflake
                # ARRAY_SORT(arr, flags) rewriter off this Spark
                # comparator form; it restores to array_sort(...)
                sorted_vals = (
                    f"__sf_array_sort({collected}, "
                    f"(l, r) -> {cmp_case})"
                )
            sorted_vals = f"transform({sorted_vals}, s -> s.v)"
            repl = (
                sorted_vals
                if delim is None
                else f"array_join({sorted_vals}, {delim})"
            )
            sql = sql[: m.start()] + repl + sql[wg_end:]
            pos = m.start() + len(repl)

    sql = within_group_pass(sql)
    sql = replace_call(sql, _FUNC_RES["ARRAY_AGG"], lambda a: f"collect_list({a})")
    sql = replace_call(sql, _FUNC_RES["IFF"], lambda a: f"if({a})")

    def dateadd(a: str) -> str:
        part, n, expr = _split_top_level_args(a)
        return f"timestampadd({part.strip(chr(39))}, {n}, {expr})"

    sql = replace_call(sql, _FUNC_RES["DATEADD"], dateadd)

    def datediff(a: str) -> str:
        part, start, end = _split_top_level_args(a)
        return f"timestampdiff({part.strip(chr(39))}, {start}, {end})"

    sql = replace_call(sql, _FUNC_RES["DATEDIFF"], datediff)
    sql = replace_call(sql, _FUNC_RES["NVL"], lambda a: f"coalesce({a})")
    sql = replace_call(
        sql, _FUNC_RES["ZEROIFNULL"], lambda a: f"coalesce({a}, 0)"
    )
    sql = replace_call(
        sql, _FUNC_RES["NULLIFZERO"], lambda a: f"nullif({a}, 0)"
    )
    sql = replace_call(
        sql, _FUNC_RES["TRY_TO_NUMBER"], lambda a: f"try_cast({a} AS DOUBLE)"
    )
    sql = replace_call(sql, _FUNC_RES["ARRAY_SIZE"], lambda a: f"size({a})")
    # r11: aggregate aliases map 1:1 onto Spark built-ins (JVM-side;
    # the direct-alias ones are window-compatible). BOOLXOR_AGG is
    # Snowflake's "exactly one TRUE" (NOT an xor fold); it rewrites to
    # a CASE (r12: all-NULL/empty group -> NULL, matching Snowflake,
    # since count() skips NULLs) and therefore cannot take an OVER
    # clause — a window use fails loudly at parse time.
    sql = replace_call(
        sql, _FUNC_RES["BOOLAND_AGG"], lambda a: f"bool_and({a})"
    )
    sql = replace_call(
        sql, _FUNC_RES["BOOLOR_AGG"], lambda a: f"bool_or({a})"
    )
    sql = replace_call(
        sql,
        _FUNC_RES["BOOLXOR_AGG"],
        lambda a: (
            f"(CASE WHEN count({a}) = 0 THEN NULL "
            f"ELSE count_if({a}) = 1 END)"
        ),
    )
    sql = replace_call(
        sql, _FUNC_RES["BITAND_AGG"], lambda a: f"bit_and({a})"
    )
    sql = replace_call(
        sql, _FUNC_RES["BITOR_AGG"], lambda a: f"bit_or({a})"
    )
    sql = replace_call(
        sql, _FUNC_RES["BITXOR_AGG"], lambda a: f"bit_xor({a})"
    )
    sql = replace_call(
        sql, _FUNC_RES["ARRAY_UNIQUE_AGG"], lambda a: f"collect_set({a})"
    )
    # CHARINDEX(target, source[, pos]) == locate's argument order
    sql = replace_call(
        sql, _FUNC_RES["CHARINDEX"], lambda a: f"locate({a})"
    )

    def div0(a: str, null_too: bool) -> str:
        parts = _split_top_level_args(a)
        if len(parts) != 2:
            raise ValueError(f"DIV0 takes 2 arguments, got: {a!r}")
        num, den = parts
        zero = (
            f"(({den}) = 0 OR ({den}) IS NULL)"
            if null_too
            else f"(({den}) = 0)"
        )
        return f"(CASE WHEN {zero} THEN 0 ELSE ({num}) / ({den}) END)"

    sql = replace_call(sql, _FUNC_RES["DIV0"], lambda a: div0(a, False))
    sql = replace_call(
        sql, _FUNC_RES["DIV0NULL"], lambda a: div0(a, True)
    )
    sql = replace_call(
        sql, _FUNC_RES["EDITDISTANCE"], lambda a: f"levenshtein({a})"
    )
    # r11 scalar fillers (1:1 built-in mappings; all JVM-side).
    # STRTOK maps to split_part — full-delimiter-string semantics;
    # Snowflake treats a multi-char delimiter as a SET of single-char
    # delimiters, a documented divergence (single-char delimiters,
    # the common case, are identical). r12: Snowflake's optional-arg
    # defaults apply — STRTOK(s) == STRTOK(s, ' ', 1),
    # STRTOK(s, d) == STRTOK(s, d, 1).
    def strtok(a: str) -> str:
        parts = _split_top_level_args(a)
        if len(parts) == 1:
            parts.append("' '")
        if len(parts) == 2:
            parts.append("1")
        return f"split_part({', '.join(p.strip() for p in parts)})"

    sql = replace_call(sql, _FUNC_RES["STRTOK"], strtok)
    sql = replace_call(
        sql, _FUNC_RES["SQUARE"], lambda a: f"power({a}, 2)"
    )
    sql = replace_call(
        sql, _FUNC_RES["TO_DOUBLE"], lambda a: f"CAST({a} AS DOUBLE)"
    )
    sql = replace_call(
        sql,
        _FUNC_RES["TRY_TO_DOUBLE"],
        lambda a: f"try_cast({a} AS DOUBLE)",
    )
    sql = replace_call(
        sql, _FUNC_RES["TO_BOOLEAN"], lambda a: f"CAST({a} AS BOOLEAN)"
    )
    sql = replace_call(
        sql,
        _FUNC_RES["TRY_TO_BOOLEAN"],
        lambda a: f"try_cast({a} AS BOOLEAN)",
    )
    sql = replace_call(
        sql, _FUNC_RES["ARRAY_CAT"], lambda a: f"concat({a})"
    )
    # r12: Snowflake renders NULL elements as empty strings; Spark's
    # array_join silently DROPS them (and their separators) unless
    # given a nullReplacement — pass '' explicitly.
    def array_to_string(a: str) -> str:
        arr, sep = _split_top_level_args(a)
        return f"array_join({arr}, {sep}, '')"

    sql = replace_call(sql, _FUNC_RES["ARRAY_TO_STRING"], array_to_string)

    # r12: Snowflake's ARRAY_INTERSECTION is a MULTISET intersection
    # (duplicates kept at min multiplicity); Spark's array_intersect
    # dedupes. Keep the k-th occurrence of an element of the left
    # array only if the right array holds at least k occurrences —
    # null-safe (<=>) so NULL elements intersect like Snowflake's.
    # Output order follows the left array (Snowflake documents the
    # order as unspecified).
    def array_intersection(a: str) -> str:
        x, y = (p.strip() for p in _split_top_level_args(a))
        return (
            f"filter({x}, (el, i) -> "
            f"size(filter(slice({x}, 1, i + 1), e2 -> e2 <=> el)) <= "
            f"size(filter({y}, e2 -> e2 <=> el)))"
        )

    sql = replace_call(
        sql, _FUNC_RES["ARRAY_INTERSECTION"], array_intersection
    )
    sql = replace_call(
        sql, _FUNC_RES["BITSHIFTLEFT"], lambda a: f"shiftleft({a})"
    )
    sql = replace_call(
        sql, _FUNC_RES["BITSHIFTRIGHT"], lambda a: f"shiftright({a})"
    )
    # Spark's greatest/least already skip NULLs (return the extreme of
    # the non-null inputs), which IS Snowflake's *_IGNORE_NULLS.
    sql = replace_call(
        sql,
        _FUNC_RES["GREATEST_IGNORE_NULLS"],
        lambda a: f"greatest({a})",
    )
    sql = replace_call(
        sql, _FUNC_RES["LEAST_IGNORE_NULLS"], lambda a: f"least({a})"
    )

    # --- r12 second wave: date / regex / array fillers -----------------
    def convert_timezone(a: str) -> str:
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) == 2:
            # 2-arg form: source tz is the session tz (UTC here)
            tz_to, ts = parts
            return f"from_utc_timestamp({ts}, {tz_to})"
        tz_from, tz_to, ts = parts
        return (
            f"from_utc_timestamp(to_utc_timestamp({ts}, {tz_from}), "
            f"{tz_to})"
        )

    sql = replace_call(
        sql, _FUNC_RES["CONVERT_TIMEZONE"], convert_timezone
    )
    # Snowflake returns abbreviated names ('Jan', 'Mon')
    sql = replace_call(
        sql, _FUNC_RES["MONTHNAME"], lambda a: f"date_format({a}, 'MMM')"
    )
    sql = replace_call(
        sql, _FUNC_RES["DAYNAME"], lambda a: f"date_format({a}, 'EEE')"
    )

    def _regex_params(lit: str, fname: str) -> tuple[str, bool]:
        """Snowflake regex_parameters string literal -> (Java inline
        flag letters, has_e). 'c' vs 'i': the LAST occurrence wins
        (Snowflake rule)."""
        if not (lit.startswith("'") and lit.endswith("'")):
            raise ValueError(
                f"{fname}: regex_parameters must be a string literal"
            )
        flags = lit[1:-1].replace("''", "'")
        unknown = set(flags) - set("cimse")
        if unknown:
            raise ValueError(
                f"{fname}: unknown regex_parameters {unknown}"
            )
        inline = ""
        if max(flags.rfind("i"), -1) > flags.rfind("c"):
            inline += "i"
        if "s" in flags:
            inline += "s"
        if "m" in flags:
            inline += "m"
        return inline, "e" in flags

    def regexp_substr(a: str) -> str:
        # REGEXP_SUBSTR(subject, pattern[, position[, occurrence
        # [, regex_parameters[, group_num]]]]): NULL when no match
        # (Spark's regexp_extract returns ''). Occurrence selects among
        # non-overlapping matches from `position` on. regex_parameters
        # map to Java inline flags ((?i)(?s)(?m) prefixed to the
        # pattern — concat of literals stays foldable, so
        # regexp_extract_all still compiles); 'e'/group_num select a
        # capture group (group_num implies 'e', Snowflake's rule).
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) > 6:
            raise ValueError(
                f"REGEXP_SUBSTR: too many arguments ({len(parts)})"
            )
        subj, pat = parts[0], parts[1]
        group = "0"
        if len(parts) >= 5:
            inline, has_e = _regex_params(parts[4], "REGEXP_SUBSTR")
            if inline:
                pat = f"concat('(?{inline})', {pat})"
            if has_e:
                group = "1"
        if len(parts) == 6:
            group = parts[5]
        if len(parts) >= 3 and parts[2] != "1":
            subj = f"substr({subj}, {parts[2]})"
        occ = parts[3] if len(parts) >= 4 else "1"
        if len(parts) >= 4 or group != "0":
            return (
                f"try_element_at(regexp_extract_all({subj}, "
                f"{pat}, {group}), {occ})"
            )
        return f"nullif(regexp_extract({subj}, {pat}, 0), '')"

    sql = replace_call(sql, _FUNC_RES["REGEXP_SUBSTR"], regexp_substr)

    # Snowflake array functions take (element, array) / 0-based
    # positions; Spark's same-named builtins take (array, element) /
    # 1-based. The transpiler presents the SNOWFLAKE signatures.
    # The rewritten text spells the SAME function name Spark-side, and
    # replace_call rescans from the start — a direct emission would
    # re-match its own output forever. Emit a placeholder name and
    # resolve it after every pass (nested Snowflake-order calls still
    # rewrite correctly on the rescan).
    def array_position_sf(a: str) -> str:
        elem, arr = (p.strip() for p in _split_top_level_args(a))
        return f"(nullif(__sf_array_position({arr}, {elem}), 0) - 1)"

    sql = replace_call(
        sql, _FUNC_RES["ARRAY_POSITION"], array_position_sf
    )

    def array_contains_sf(a: str) -> str:
        elem, arr = (p.strip() for p in _split_top_level_args(a))
        return f"__sf_array_contains({arr}, {elem})"

    sql = replace_call(
        sql, _FUNC_RES["ARRAY_CONTAINS"], array_contains_sf
    )
    sql = sql.replace("__sf_array_position(", "array_position(")
    sql = sql.replace("__sf_array_contains(", "array_contains(")

    def array_slice(a: str) -> str:
        # 0-based from (inclusive) .. to (exclusive) -> slice's
        # 1-based start + length; to <= from yields [] in Snowflake,
        # so the length clamps at 0 (Spark's slice errors on negative).
        # Negative bounds count from the end (-1 = last element) and
        # clamp at 0 when they underrun the array (r12 advice) — they
        # must be normalized against size(arr) BEFORE the 1-based and
        # length conversion, or mixed-sign calls like (1, -1) return [].
        arr, lo, hi = (p.strip() for p in _split_top_level_args(a))
        lo_n = f"if(({lo}) < 0, greatest(size({arr}) + ({lo}), 0), ({lo}))"
        hi_n = f"if(({hi}) < 0, greatest(size({arr}) + ({hi}), 0), ({hi}))"
        return (
            f"slice({arr}, ({lo_n}) + 1, "
            f"greatest(({hi_n}) - ({lo_n}), 0))"
        )

    sql = replace_call(sql, _FUNC_RES["ARRAY_SLICE"], array_slice)
    sql = replace_call(
        sql,
        _FUNC_RES["ARRAY_COMPACT"],
        lambda a: f"filter({a}, x -> x IS NOT NULL)",
    )
    sql = replace_call(
        sql, _FUNC_RES["ARRAY_FLATTEN"], lambda a: f"flatten({a})"
    )

    def array_generate_range(a: str) -> str:
        # end-EXCLUSIVE (Snowflake) vs sequence's inclusive stop: the
        # stop value appears only when (stop-start) divides step —
        # remove it (it occurs at most once, as the last element).
        # Snowflake returns [] when the step sign cannot reach stop
        # from start; Spark's sequence(5,2) instead auto-DESCENDS and
        # an explicit sign-mismatched step throws — guard with a CASE
        # so those return [] (r12 advice). `if` evaluates only the
        # taken branch, so the throwing sequence is never run. The
        # typed-empty arm reuses sequence (slice to length 0) to keep
        # both branches the same array type.
        parts = [p.strip() for p in _split_top_level_args(a)]
        start, stop = parts[0], parts[1]
        step = parts[2] if len(parts) > 2 else "1"
        seq = f"sequence({', '.join(parts)})"
        empty = f"slice(sequence(({start}), ({start})), 1, 0)"
        return (
            f"if(((({stop}) - ({start})) * sign({step})) > 0, "
            f"array_remove({seq}, {stop}), {empty})"
        )

    sql = replace_call(
        sql, _FUNC_RES["ARRAY_GENERATE_RANGE"], array_generate_range
    )
    # objects are JSON strings at engine boundaries (OBJECT_CONSTRUCT
    # -> to_json), so OBJECT_KEYS reads them back
    sql = replace_call(
        sql, _FUNC_RES["OBJECT_KEYS"], lambda a: f"json_object_keys({a})"
    )
    sql = replace_call(
        sql, _FUNC_RES["TRY_PARSE_JSON"], lambda a: a.strip()
    )

    def truncate_num(a: str) -> str:
        # numeric truncation toward zero; floor/ceil carry the scale
        # (Spark >= 3.3 two-arg floor/ceil). TRUNCATE TABLE never
        # reaches here — no parenthesis follows the keyword there.
        parts = [p.strip() for p in _split_top_level_args(a)]
        x = parts[0]
        d = parts[1] if len(parts) > 1 else "0"
        return (
            f"if(({x}) >= 0, floor(({x}), {d}), ceil(({x}), {d}))"
        )

    sql = replace_call(sql, _FUNC_RES["TRUNCATE_NUM"], truncate_num)

    def time_slice(a: str) -> str:
        # TIME_SLICE(ts, n, 'PART'[, 'START'|'END']): the start (or
        # end) of ts's n-PART bucket. Fixed-width parts (SECOND..WEEK)
        # align buckets to the unix epoch via pure arithmetic on epoch
        # seconds; calendar parts (MONTH/QUARTER/YEAR, r13) count whole
        # months since 1970-01 and add_months back from the epoch —
        # both UDF-free, surviving whole-stage codegen. floor() handles
        # pre-1970 inputs on either path.
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) not in (3, 4):
            raise ValueError(
                f"TIME_SLICE: expected 3 or 4 arguments, got {len(parts)}"
            )
        ts, n, part = parts[0], parts[1], parts[2]
        kind = "START"
        if len(parts) == 4:
            kind = parts[3].strip().strip("'\"").upper()
            if kind not in ("START", "END"):
                raise ValueError(
                    f"TIME_SLICE: start_or_end must be 'START' or "
                    f"'END', got {parts[3]}"
                )
        key = part.strip().strip("'\"").lower()
        secs = {
            "second": 1,
            "minute": 60,
            "hour": 3600,
            "day": 86400,
            "week": 604800,
        }.get(key)
        if secs is not None:
            width = f"(({n}) * {secs})"
            bucket = f"floor(unix_timestamp({ts}) / {width})"
            if kind == "END":
                bucket = f"({bucket} + 1)"
            return f"to_timestamp({bucket} * {width})"
        months = {"month": 1, "quarter": 3, "year": 12}.get(key)
        if months is None:
            raise ValueError(
                f"TIME_SLICE: unsupported slice part {part} "
                "(SECOND/MINUTE/HOUR/DAY/WEEK/MONTH/QUARTER/YEAR)"
            )
        width = f"(({n}) * {months})"
        m_since_epoch = f"((year({ts}) - 1970) * 12 + month({ts}) - 1)"
        bucket = f"floor({m_since_epoch} / {width})"
        if kind == "END":
            bucket = f"({bucket} + 1)"
        return (
            f"CAST(add_months(date'1970-01-01', "
            f"CAST({bucket} * {width} AS INT)) AS TIMESTAMP)"
        )

    sql = replace_call(sql, _FUNC_RES["TIME_SLICE"], time_slice)

    def haversine(a: str) -> str:
        lat1, lon1, lat2, lon2 = (
            p.strip() for p in _split_top_level_args(a)
        )
        return (
            "(2 * 6371 * asin(sqrt("
            f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
            f"cos(radians({lat1})) * cos(radians({lat2})) * "
            f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
        )

    sql = replace_call(sql, _FUNC_RES["HAVERSINE"], haversine)
    sql = replace_call(
        sql, _FUNC_RES["SKEW"], lambda a: f"skewness({a})"
    )

    # --- r13 third wave: regex long forms, ISO calendar, scalar -------
    # bit/bool fillers, multiset/0-based array forms. Same-named Spark
    # builtins are emitted through __sf_* placeholders (resolved after
    # each pass) so replace_call never re-matches its own output.
    def regexp_replace_sf(a: str) -> str:
        # REGEXP_REPLACE(subject, pattern[, replacement[, position
        # [, occurrence[, regex_parameters]]]]): Snowflake's default
        # replacement is '' (Spark requires it) and occurrence 0 =
        # replace all (the only Spark semantics; a specific occurrence
        # raises). position maps to Spark's native 4th argument.
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) > 6:
            raise ValueError(
                f"REGEXP_REPLACE: too many arguments ({len(parts)})"
            )
        s, p = parts[0], parts[1]
        r = parts[2] if len(parts) >= 3 else "''"
        if len(parts) >= 6:
            inline, _e = _regex_params(parts[5], "REGEXP_REPLACE")
            if inline:
                p = f"concat('(?{inline})', {p})"
        if len(parts) >= 5 and parts[4] != "0":
            raise ValueError(
                "REGEXP_REPLACE: only occurrence 0 (replace all) is "
                "supported"
            )
        if len(parts) >= 4 and parts[3] != "1":
            return f"__sf_regexp_replace({s}, {p}, {r}, {parts[3]})"
        return f"__sf_regexp_replace({s}, {p}, {r})"

    sql = replace_call(sql, _FUNC_RES["REGEXP_REPLACE"], regexp_replace_sf)

    def regexp_count_sf(a: str) -> str:
        # REGEXP_COUNT(subject, pattern[, position[, regex_parameters]])
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) > 4:
            raise ValueError(
                f"REGEXP_COUNT: too many arguments ({len(parts)})"
            )
        s, p = parts[0], parts[1]
        if len(parts) >= 4:
            inline, _e = _regex_params(parts[3], "REGEXP_COUNT")
            if inline:
                p = f"concat('(?{inline})', {p})"
        if len(parts) >= 3 and parts[2] != "1":
            s = f"substr({s}, {parts[2]})"
        return f"__sf_regexp_count({s}, {p})"

    sql = replace_call(sql, _FUNC_RES["REGEXP_COUNT"], regexp_count_sf)

    def regexp_like_sf(a: str) -> str:
        # Snowflake REGEXP_LIKE matches the ENTIRE subject (Spark's
        # regexp_like is a substring search): anchor with ^(?:...)$
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) > 3:
            raise ValueError(
                f"REGEXP_LIKE: too many arguments ({len(parts)})"
            )
        s, p = parts[0], parts[1]
        inline = ""
        if len(parts) == 3:
            inline, _e = _regex_params(parts[2], "REGEXP_LIKE")
        pre = f"^(?{inline})(?:" if inline else "^(?:"
        return f"__sf_regexp_like({s}, concat('{pre}', {p}, ')$'))"

    sql = replace_call(sql, _FUNC_RES["REGEXP_LIKE"], regexp_like_sf)

    def regexp_instr_sf(a: str) -> str:
        # REGEXP_INSTR(subject, pattern[, position[, occurrence
        # [, option[, regex_parameters[, group_num]]]]]) — r14
        # (VERDICT r13 #8): 1-based match position, 0 when no match.
        #
        # - occurrence N (literal): the Nth match locates via ONE scan
        #   of a derived pattern `(?:(?:p)[\s\S]*?){N-1}((?:p))` whose
        #   group 1 is the Nth occurrence (lazy gaps = Snowflake's
        #   scan-from-previous-end), read with Spark regexp_instr's
        #   group index — still a single JVM regex pass, no loops.
        # - option 0 = match start; option 1 = first char AFTER the
        #   match (start + matched length).
        # - group_num: direct group index at occurrence 1; for
        #   occurrence > 1 the wrapper shifts group numbers, so it is
        #   supported only when the pattern is a string LITERAL (its
        #   capture count is countable) — otherwise raises.
        # position offsets via substr; coalesce/nullif keeps it all
        # inside the one regexp_instr call.
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) > 7:
            raise ValueError(
                f"REGEXP_INSTR: too many arguments ({len(parts)})"
            )
        s, p = parts[0], parts[1]
        occ_s = parts[3] if len(parts) >= 4 else "1"
        if not re.fullmatch(r"\d+", occ_s) or int(occ_s) < 1:
            raise ValueError(
                "REGEXP_INSTR: occurrence must be a literal positive "
                f"integer, got {occ_s!r}"
            )
        occ = int(occ_s)
        opt_s = parts[4] if len(parts) >= 5 else "0"
        if opt_s not in ("0", "1"):
            raise ValueError(
                f"REGEXP_INSTR: option must be literal 0 or 1, got "
                f"{opt_s!r}"
            )
        group = parts[6] if len(parts) >= 7 else "0"
        if not re.fullmatch(r"\d+", group):
            raise ValueError(
                "REGEXP_INSTR: group_num must be a literal integer"
            )
        # literal pattern text, or None. Inline flags stay a SEPARATE
        # prefix applied at position 0 of whatever final pattern gets
        # built — Java expires mid-pattern (?i) at the enclosing
        # group, so folding flags into a literal that later gets
        # group-surgered would silently drop them.
        litm = re.fullmatch(r"'((?:[^']|'')*)'", p)
        lit = litm.group(1) if litm else None
        fx = ""
        if len(parts) >= 6:
            inline, _e = _regex_params(parts[5], "REGEXP_INSTR")
            if inline:
                fx = f"(?{inline})"
                if lit is None:
                    p = f"concat('{fx}', {p})"
                else:
                    p = f"'{fx}{lit}'"
        g = int(group)
        if g != 0 and lit is None:
            raise ValueError(
                "REGEXP_INSTR: group_num needs a string-literal "
                "pattern (the capture structure must be statically "
                "known)"
            )
        subject = s
        pos = parts[2] if len(parts) >= 3 else "1"
        if pos != "1":
            subject = f"substr({s}, {pos})"

        def q(t: str) -> str:  # SQL string literal (already ''-safe)
            return f"'{t}'"

        def ext(pat_sql: str, idx: int) -> str:
            return f"length(regexp_extract({subject}, {pat_sql}, {idx}))"

        def capture_opens(pat: str) -> list[int]:
            # positions of CAPTURING '(' — escape- and character-
            # class-aware (ADVICE r14 #3: '[(]' is a literal paren,
            # not a group; counting it corrupts the group surgery)
            opens, i, in_cls = [], 0, False
            while i < len(pat):
                ch = pat[i]
                if ch == "\\":
                    i += 2
                    continue
                if in_cls:
                    if ch == "]":
                        in_cls = False
                elif ch == "[":
                    in_cls = True
                elif ch == "(" and not pat.startswith("(?", i):
                    opens.append(i)
                i += 1
            return opens

        if g != 0:
            # prefix-capture surgery on the literal: '(' at the start,
            # ')' just before group g's paren — group-g start = match
            # start + len(prefix capture)
            opens = capture_opens(lit)
            if g > len(opens):
                raise ValueError(
                    f"REGEXP_INSTR: group_num {g} exceeds the "
                    f"pattern's {len(opens)} capture groups"
                )
            pre_lit = "(" + lit[: opens[g - 1]] + ")" + lit[opens[g - 1] :]
        if occ == 1:
            if g == 0:
                core = f"__sf_regexp_instr({subject}, {p})"
                if opt_s == "1":
                    core = (
                        f"case when {core} = 0 then 0 else {core} + "
                        f"{ext(p, 0)} end"
                    )
            else:
                # new group 1 = prefix; original group g shifts to g+1
                pl = q(fx + pre_lit)
                start = f"__sf_regexp_instr({subject}, {pl})"
                off = ext(pl, 1)
                tail = f" + {ext(pl, g + 1)}" if opt_s == "1" else ""
                core = (
                    f"case when {start} = 0 then 0 else "
                    f"{start} + {off}{tail} end"
                )
        else:
            # occurrence N: one scan of (?:(?:p)gap){N-1}(final) —
            # lazy gaps walk successive matches; the Nth occurrence's
            # position falls out of length arithmetic on the captures
            # (Spark's regexp_instr has no group-position form).
            if lit is not None:
                inner = lit
                if g == 0:
                    wrap = (
                        f"(?:(?>{inner})[\\\\s\\\\S]*?){{{occ - 1}}}"
                        f"((?:{inner}))"
                    )
                    pat_sql = q(fx + wrap)
                    c = len(capture_opens(inner))
                    last_idx = c + 1
                    pre_idx = None
                    g_idx = None
                else:
                    c = len(capture_opens(inner))
                    # final occurrence = outer capture (c+1) wrapping
                    # the prefix-captured literal; inside it: pre =
                    # c+2, original groups 1..g-1 inside pre, original
                    # group g = c+2+g
                    wrap = (
                        f"(?:(?>{inner})[\\\\s\\\\S]*?){{{occ - 1}}}"
                        f"({pre_lit})"
                    )
                    pat_sql = q(fx + wrap)
                    last_idx = c + 1
                    pre_idx = c + 2
                    g_idx = c + 2 + g
            else:
                # a runtime pattern's capture count is unknowable
                # statically: if it contains groups, group 1 belongs
                # to the first (?>p) copy, not the final-occurrence
                # wrapper, and the length arithmetic silently reads
                # the wrong group (ADVICE r14 #3) — raise, like the
                # group_num path already does.
                raise ValueError(
                    "REGEXP_INSTR: occurrence > 1 needs a string-"
                    "literal pattern (the wrapper's group index "
                    "depends on the pattern's capture count, which "
                    "must be statically known)"
                )
            start = f"__sf_regexp_instr({subject}, {pat_sql})"
            # start of the Nth occurrence = wrapper start + len(whole
            # wrapper match) - len(final occurrence)
            expr = (
                f"{start} + {ext(pat_sql, 0)} - {ext(pat_sql, last_idx)}"
            )
            if pre_idx is not None:
                expr = f"{expr} + {ext(pat_sql, pre_idx)}"
                if opt_s == "1":
                    expr = f"{expr} + {ext(pat_sql, g_idx)}"
            elif opt_s == "1":
                expr = f"{expr} + {ext(pat_sql, last_idx)}"
            core = f"case when {start} = 0 then 0 else {expr} end"
        if pos != "1":
            return f"coalesce(nullif({core}, 0) + ({pos}) - 1, 0)"
        return core

    sql = replace_call(sql, _FUNC_RES["REGEXP_INSTR"], regexp_instr_sf)

    def previous_day(a: str) -> str:
        # first DOW strictly BEFORE the date: next_day is strictly
        # after, so next_day(d - 1) is the first DOW >= d; minus 7
        d, dow = (p.strip() for p in _split_top_level_args(a))
        return (
            f"date_sub(next_day(date_sub(CAST({d} AS DATE), 1), "
            f"{dow}), 7)"
        )

    sql = replace_call(sql, _FUNC_RES["PREVIOUS_DAY"], previous_day)

    def last_day_sf(a: str) -> str:
        # LAST_DAY(d[, part]): Spark's native covers MONTH; YEAR /
        # QUARTER via trunc + add_months - 1 day; WEEK ends Sunday
        # (ISO week, Snowflake's default WEEK_START=0 behavior)
        parts = [p.strip() for p in _split_top_level_args(a)]
        if len(parts) == 1:
            return f"__sf_last_day({parts[0]})"
        d = f"CAST({parts[0]} AS DATE)"
        part = parts[1].strip().strip("'\"").lower()
        if part in ("month", "mon", "mm", "months"):
            return f"__sf_last_day({parts[0]})"
        if part in ("year", "yyyy", "yy", "years"):
            return f"date_sub(add_months(trunc({d}, 'YEAR'), 12), 1)"
        if part in ("quarter", "qtr", "q", "quarters"):
            return f"date_sub(add_months(trunc({d}, 'QUARTER'), 3), 1)"
        if part in ("week", "wk", "w", "weeks"):
            return f"date_add({d}, 6 - weekday({d}))"
        raise ValueError(
            f"LAST_DAY: unsupported part {parts[1]} "
            "(MONTH/QUARTER/YEAR/WEEK)"
        )

    sql = replace_call(sql, _FUNC_RES["LAST_DAY"], last_day_sf)

    # ISO calendar parts: Spark weekday() is 0=Monday, weekofyear()
    # is ISO already; the ISO year is the year of the week's Thursday
    sql = replace_call(
        sql,
        _FUNC_RES["DAYOFWEEKISO"],
        lambda a: f"(weekday({a}) + 1)",
    )
    sql = replace_call(
        sql, _FUNC_RES["WEEKISO"], lambda a: f"weekofyear({a})"
    )
    sql = replace_call(
        sql,
        _FUNC_RES["YEAROFWEEKISO"],
        lambda a: (
            f"year(date_add(CAST({a} AS DATE), 3 - weekday({a})))"
        ),
    )

    def _two(a: str) -> tuple[str, str]:
        x, y = (p.strip() for p in _split_top_level_args(a))
        return x, y

    sql = replace_call(
        sql, _FUNC_RES["BITAND"],
        lambda a: "(({}) & ({}))".format(*_two(a)),
    )
    sql = replace_call(
        sql, _FUNC_RES["BITOR"],
        lambda a: "(({}) | ({}))".format(*_two(a)),
    )
    sql = replace_call(
        sql, _FUNC_RES["BITXOR"],
        lambda a: "(({}) ^ ({}))".format(*_two(a)),
    )
    sql = replace_call(
        sql, _FUNC_RES["BITNOT"], lambda a: f"(~({a.strip()}))"
    )
    # BOOLAND/BOOLOR/BOOLXOR/BOOLNOT: numeric inputs, nonzero = true;
    # SQL three-valued logic reproduces Snowflake's NULL rules exactly
    # (BOOLAND(0, NULL) = false, BOOLAND(1, NULL) = NULL, ...)
    sql = replace_call(
        sql, _FUNC_RES["BOOLAND"],
        lambda a: "((({}) <> 0) AND (({}) <> 0))".format(*_two(a)),
    )
    sql = replace_call(
        sql, _FUNC_RES["BOOLOR"],
        lambda a: "((({}) <> 0) OR (({}) <> 0))".format(*_two(a)),
    )
    sql = replace_call(
        sql, _FUNC_RES["BOOLXOR"],
        lambda a: "((({}) <> 0) <> (({}) <> 0))".format(*_two(a)),
    )
    sql = replace_call(
        sql, _FUNC_RES["BOOLNOT"],
        lambda a: f"(NOT (({a.strip()}) <> 0))",
    )
    sql = replace_call(
        sql, _FUNC_RES["EQUAL_NULL"],
        lambda a: "(({}) <=> ({}))".format(*_two(a)),
    )

    def nvl2(a: str) -> str:
        x, y, z = (p.strip() for p in _split_top_level_args(a))
        return f"if(({x}) IS NOT NULL, {y}, {z})"

    sql = replace_call(sql, _FUNC_RES["NVL2"], nvl2)
    # (RATIO_TO_REPORT is handled by the dedicated window-function
    # rewrite pass later in transpile — it enforces the OVER clause
    # and casts the numerator to DOUBLE.)
    sql = replace_call(
        sql, _FUNC_RES["HLL"],
        lambda a: f"approx_count_distinct({a})",
    )
    sql = replace_call(
        sql, _FUNC_RES["RTRIMMED_LENGTH"],
        lambda a: f"length(rtrim({a}))",
    )

    def array_except_sf(a: str) -> str:
        # MULTISET except (Snowflake): keep the k-th occurrence of an
        # element of the left array only if the right holds FEWER than
        # k occurrences — Spark's array_except dedupes, so it can't be
        # used. Null-safe (<=>) like the ARRAY_INTERSECTION rewrite.
        x, y = _two(a)
        return (
            f"filter({x}, (el, i) -> "
            f"size(filter(slice({x}, 1, i + 1), e2 -> e2 <=> el)) > "
            f"size(filter({y}, e2 -> e2 <=> el)))"
        )

    sql = replace_call(sql, _FUNC_RES["ARRAY_EXCEPT"], array_except_sf)

    def array_remove_at(a: str) -> str:
        # 0-based position, negative counts from the end; an
        # out-of-range position returns the array unmodified
        arr, pos = _two(a)
        posn = f"if(({pos}) < 0, size({arr}) + ({pos}), ({pos}))"
        posc = f"if(({posn}) < 0, size({arr}), ({posn}))"
        return (
            f"concat(slice({arr}, 1, greatest({posc}, 0)), "
            f"slice({arr}, ({posc}) + 2, "
            f"greatest(size({arr}) - (({posc}) + 1), 0)))"
        )

    sql = replace_call(sql, _FUNC_RES["ARRAY_REMOVE_AT"], array_remove_at)

    def array_insert_sf(a: str) -> str:
        # 0-based insert (Spark's is 1-based); beyond-length positions
        # NULL-pad on both engines. Negative positions differ between
        # the engines' conventions — refused loudly.
        arr, pos, elem = (p.strip() for p in _split_top_level_args(a))
        return (
            f"if(({pos}) >= 0, "
            f"__sf_array_insert({arr}, ({pos}) + 1, {elem}), "
            f"raise_error('ARRAY_INSERT: negative positions are not "
            f"supported'))"
        )

    sql = replace_call(sql, _FUNC_RES["ARRAY_INSERT"], array_insert_sf)

    def array_sort_sf(a: str) -> str:
        # ARRAY_SORT(arr[, sort_ascending[, nulls_first]]) — Snowflake
        # defaults: ascending, nulls LAST == Spark's array_sort.
        # Literal flags pick among array_sort / sort_array(asc: nulls
        # first, desc: nulls last) / reverse(array_sort) (desc, nulls
        # first); runtime flags raise.
        parts = [p.strip() for p in _split_top_level_args(a)]
        arr = parts[0]
        if len(parts) == 1:
            return f"__sf_array_sort({arr})"
        if len(parts) > 3:
            raise ValueError(
                f"ARRAY_SORT: too many arguments ({len(parts)})"
            )
        flags = [p.lower() for p in parts[1:]]
        if any(fl not in ("true", "false") for fl in flags):
            raise ValueError(
                "ARRAY_SORT: sort flags must be literal TRUE/FALSE"
            )
        asc = flags[0] == "true"
        nulls_first = len(flags) > 1 and flags[1] == "true"
        if asc and not nulls_first:
            return f"__sf_array_sort({arr})"
        if asc and nulls_first:
            return f"sort_array({arr}, true)"
        if not asc and not nulls_first:
            return f"sort_array({arr}, false)"
        return f"reverse(__sf_array_sort({arr}))"

    sql = replace_call(sql, _FUNC_RES["ARRAY_SORT"], array_sort_sf)
    for ph, real in (
        ("__sf_regexp_replace(", "regexp_replace("),
        ("__sf_regexp_count(", "regexp_count("),
        ("__sf_regexp_like(", "regexp_like("),
        ("__sf_regexp_instr(", "regexp_instr("),
        ("__sf_last_day(", "last_day("),
        ("__sf_array_insert(", "array_insert("),
        ("__sf_array_sort(", "array_sort("),
    ):
        sql = sql.replace(ph, real)

    def listagg(a: str) -> str:
        parts = _split_top_level_args(a)
        expr = parts[0]
        delim = parts[1] if len(parts) > 1 else "''"
        return f"array_join(collect_list({expr}), {delim})"

    sql = replace_call(sql, _FUNC_RES["LISTAGG"], listagg)
    sql = replace_call(
        sql, _FUNC_RES["TO_VARCHAR"], lambda a: f"CAST({a} AS STRING)"
    )
    if _GENERATOR_RE.search(sql):
        sql = _GENERATOR_RE.sub(lambda m: f"range({m.group(1)})", sql)
        sql = _SEQN_RE.sub("id", sql)
    sql = replace_call(
        sql,
        _SPLIT_TO_TABLE_RE,
        lambda a: f"flatten(input => split({a}))",
    )
    return _rewrite_flatten(sql)


def _rewrite_flatten(sql: str) -> str:
    """``, LATERAL FLATTEN(input => X) f`` ->
    ``LATERAL VIEW posexplode(X) f AS index, value`` — Snowflake's
    comma-join flatten idiom in Spark's LATERAL VIEW form; the alias
    exposes ``f.value`` / ``f.index`` with identical meaning (0-based
    index, one row per array element)."""
    while True:
        m = _FLATTEN_RE.search(sql)
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner = sql[m.end() : i - 1]
        am = re.match(r"\s*(?:as\s+)?([A-Za-z_]\w*)", sql[i:])
        if not am:
            raise ValueError(
                "LATERAL FLATTEN requires an alias (e.g. `, lateral "
                "flatten(input => col) f`)"
            )
        alias = am.group(1)
        sql = (
            sql[: m.start()]
            + f" LATERAL VIEW posexplode({inner}) {alias} AS index, value"
            + sql[i + am.end() :]
        )


# Snowflake row generator: `TABLE(GENERATOR(ROWCOUNT => n))` -> Spark's
# native `range(n)` (one narrow partition-parallel source, no data
# scan). SEQ4()/SEQ8() inside such a query become the range's `id`
# column — valid only over a single generator source, like Snowflake's
# own within-generator use.
_GENERATOR_RE = re.compile(
    r"\btable\s*\(\s*generator\s*\(\s*rowcount\s*=>\s*(\d+)\s*\)\s*\)",
    re.IGNORECASE,
)
_SEQN_RE = re.compile(r"\bseq[48]\s*\(\s*\)", re.IGNORECASE)
# Snowflake `, LATERAL SPLIT_TO_TABLE(x, d) f` == FLATTEN over
# split(x, d): normalize to the FLATTEN form and let _rewrite_flatten
# handle it (f.value / f.index, index 0-based like the FLATTEN path).
_SPLIT_TO_TABLE_RE = re.compile(
    r"\bsplit_to_table\s*\(", re.IGNORECASE
)
# Snowflake `SELECT TOP n <list> ...` -> `SELECT <list> ... LIMIT n`
# (outermost statement only — TOP in a subquery is rare and would need
# full paren tracking to place the LIMIT; raise instead of mis-placing).
_TOP_RE = re.compile(r"^(\s*select)\s+top\s+(\d+)\b", re.IGNORECASE)
_TOP_ANY_RE = re.compile(r"\bselect\s+top\s+\d+\b", re.IGNORECASE)
_RATIO_TO_REPORT_RE = re.compile(r"\bratio_to_report\s*\(", re.IGNORECASE)
_COND_TRUE_RE = re.compile(r"\bconditional_true_event\s*\(", re.IGNORECASE)
_COND_CHANGE_RE = re.compile(
    r"\bconditional_change_event\s*\(", re.IGNORECASE
)
_OVER_RE = re.compile(r"\s*over\s*\(", re.IGNORECASE)


_CONNECT_BY_RE = re.compile(
    r"(?is)^\s*select\s+(?P<list>.+?)\s+from\s+(?P<table>[A-Za-z_][\w.]*)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"\s+start\s+with\s+(?P<start>.+?)"
    r"\s+connect\s+by\s+(?P<conn>.+?)\s*;?\s*$"
)
_PRIOR_LHS_RE = re.compile(
    r"(?is)^\s*prior\s+([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*$"
)
_PRIOR_RHS_RE = re.compile(
    r"(?is)^\s*([A-Za-z_]\w*)\s*=\s*prior\s+([A-Za-z_]\w*)\s*$"
)
_CB_ROOT_RE = re.compile(r"(?is)\bconnect_by_root\s+([A-Za-z_]\w*)")
_CB_PATH_RE = re.compile(
    r"(?is)\bsys_connect_by_path\s*\(\s*([A-Za-z_]\w*)\s*,\s*"
    r"'([^']*)'\s*\)"
)


def _rewrite_connect_by(sql: str) -> str:
    """Snowflake/Oracle ``START WITH .. CONNECT BY PRIOR`` -> Spark 4's
    native ``WITH RECURSIVE`` (SPARK-24497). Each recursion round is
    one equi-join of the frontier against the table — the same scale
    posture as the engine's recursive-CTE hierarchy queries (depth
    rounds of hash joins, never row-count iterations). ``LEVEL`` is
    exposed as a regular ``level`` column (1 at the roots). Supported
    shape: a single-table SELECT with optional WHERE (applied AFTER
    the hierarchy, as in Snowflake) and one ``PRIOR a = b`` /
    ``b = PRIOR a`` condition; anything else is left untouched (and a
    CONNECT BY the regex cannot shape raises downstream as unparsed
    SQL rather than being silently mis-run)."""
    m = _CONNECT_BY_RE.match(sql)
    if not m:
        return sql
    pm = _PRIOR_LHS_RE.match(m.group("conn"))
    if pm:
        p_col, c_col = pm.group(1), pm.group(2)
    else:
        pm = _PRIOR_RHS_RE.match(m.group("conn"))
        if not pm:
            raise ValueError(
                "CONNECT BY supports a single `PRIOR a = b` (or "
                f"`b = PRIOR a`) condition, got: {m.group('conn')!r}"
            )
        c_col, p_col = pm.group(1), pm.group(2)
    t = m.group("table")

    # r10 (VERDICT r9 #3): CONNECT_BY_ROOT / SYS_CONNECT_BY_PATH swap
    # each occurrence (select list AND post-hierarchy WHERE) for a
    # carried column: (alias -> (anchor expr, recursion expr)).
    carries: dict[str, tuple[str, str]] = {}

    def sub_root(mm: re.Match) -> str:
        col = mm.group(1)
        alias = f"__root_{col.lower()}"
        carries[alias] = (f"__r.{col}", f"__p.{alias}")
        return alias

    path_n = 0

    def sub_path(mm: re.Match) -> str:
        nonlocal path_n
        col, sep = mm.group(1), mm.group(2).replace("'", "''")
        alias = f"__path_{path_n}"
        path_n += 1
        carries[alias] = (
            f"concat('{sep}', cast(__r.{col} as string))",
            f"concat(__p.{alias}, '{sep}', cast(__c.{col} as string))",
        )
        return alias

    sel_list = _CB_PATH_RE.sub(sub_path, m.group("list"))
    sel_list = _CB_ROOT_RE.sub(sub_root, sel_list)
    where_text = m.group("where")
    if where_text:
        where_text = _CB_PATH_RE.sub(sub_path, where_text)
        where_text = _CB_ROOT_RE.sub(sub_root, where_text)
    where = f" WHERE {where_text}" if where_text else ""
    # ADVICE r10: carried helper columns referenced only by the
    # post-hierarchy WHERE (or by nothing, under SELECT *) must not
    # leak into the output. The WHERE runs INSIDE the subquery (it is
    # evaluated before the projection, so EXCEPT'd columns remain
    # visible to it) and the EXCEPT drops every carried alias the
    # select list does not itself reference.
    drop = ["__visited"] + [
        a for a in carries if not re.search(rf"\b{a}\b", sel_list)
    ]

    # Cycle safety (r10): every path carries its visited PRIOR-key
    # array; a child already among its own ancestors raises 'CONNECT
    # BY loop detected' at the row closing the cycle (Snowflake's
    # CONNECT_BY_LOOP error) instead of joining to the recursion
    # limit. assert_true returns NULL when sound, so the CASE yields
    # the appended array. The carry is O(depth) per row — the cost
    # SYS_CONNECT_BY_PATH pays anyway.
    anchor_extra = "".join(
        f", {root} AS {alias}" for alias, (root, _rec) in carries.items()
    ) + f", array(__r.{p_col}) AS __visited"
    rec_extra = "".join(
        f", {rec} AS {alias}" for alias, (_root, rec) in carries.items()
    ) + (
        # exists(), not array_contains: this generated SQL flows
        # through _rewrite_funcs, whose r12 ARRAY_CONTAINS mapping
        # presents the SNOWFLAKE (element, array) signature — the
        # Spark-order call here would get its arguments swapped and
        # break cycle detection (infinite recursion).
        f", CASE WHEN assert_true(NOT exists(__p.__visited, "
        f"__x -> __x <=> __c.{p_col}), "
        f"'CONNECT BY loop detected: hierarchy cycle on "
        f"{p_col}') IS NULL THEN array_append(__p.__visited, "
        f"__c.{p_col}) END AS __visited"
    )
    return (
        f"WITH RECURSIVE __cb AS ("
        f"SELECT __r.*, 1 AS level{anchor_extra} FROM {t} __r "
        f"WHERE {m.group('start')} "
        f"UNION ALL "
        f"SELECT __c.*, __p.level + 1 AS level{rec_extra} "
        f"FROM __cb __p JOIN {t} __c ON __p.{p_col} = __c.{c_col}"
        f") SELECT {sel_list} FROM "
        f"(SELECT * EXCEPT ({', '.join(drop)}) FROM __cb{where}) __cb"
    )


def _rewrite_window_funcs(sql: str) -> str:
    """Snowflake window functions OSS Spark lacks, as inline rewrites.

    ``RATIO_TO_REPORT(x) OVER (w)`` -> ``(CAST(x AS DOUBLE) /
    sum(x) OVER (w))`` (the value's share of its partition's total;
    integer inputs divide as exact IEEE doubles, cross-engine stable).

    ``CONDITIONAL_TRUE_EVENT(pred) OVER (w)`` -> running
    ``sum(CASE WHEN pred ...)`` with an explicit
    UNBOUNDED PRECEDING..CURRENT ROW frame (Snowflake's running count
    of rows where the predicate held, current row included).

    ``CONDITIONAL_CHANGE_EVENT`` cannot inline — the change flag needs
    LAG inside a running SUM, nested window functions — so it raises
    with a pointer to ``ops.condevents.conditional_change_event``.
    """

    def consume_call(s: str, open_end: int) -> tuple[str, int]:
        depth, i = 1, open_end
        while i < len(s) and depth:
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
            i += 1
        return s[open_end : i - 1], i

    def rewrite(pattern: re.Pattern, build) -> None:
        nonlocal sql
        while True:
            m = pattern.search(sql)
            if not m:
                return
            args, call_end = consume_call(sql, m.end())
            om = _OVER_RE.match(sql[call_end:])
            if not om:
                raise ValueError(
                    f"{sql[m.start():call_end]} requires an OVER clause"
                )
            spec, over_end = consume_call(sql, call_end + om.end())
            sql = (
                sql[: m.start()]
                + build(args.strip(), spec.strip())
                + sql[over_end:]
            )

    if _COND_CHANGE_RE.search(sql):
        raise ValueError(
            "CONDITIONAL_CHANGE_EVENT needs LAG inside a running SUM — "
            "nested window functions, inexpressible in one SQL pass. "
            "Use ops.condevents.conditional_change_event (two Window "
            "operators over one shuffle)."
        )
    rewrite(
        _RATIO_TO_REPORT_RE,
        lambda args, spec: (
            f"(CAST({args} AS DOUBLE) / sum({args}) OVER ({spec}))"
        ),
    )
    rewrite(
        _COND_TRUE_RE,
        lambda args, spec: (
            f"sum(CASE WHEN ({args}) THEN 1 ELSE 0 END) OVER ({spec} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
    )
    return sql


def transpile(sql: str) -> str:
    """Rewrite Snowflake-dialect SQL (the reference's surface) to Spark SQL.

    ``row_number() over (partition by null order by null)`` becomes the
    GLOBAL_ROWNUM_MARKER, which is NOT directly runnable: callers with a
    SparkSession must pass the result through ``resolve_global_rownum``
    (the engine's build_df does). Other functions over the null window
    raise ValueError — the faithful plan would be a single-partition
    Window, which is never acceptable at scale.
    """
    from ..connectors.sqlbridge import strip_namespaces

    out = strip_namespaces(sql)
    m = _TOP_RE.match(out)
    if m:
        out = (
            out[: m.start(0)]
            + m.group(1)
            + out[m.end(0) :].rstrip().rstrip(";")
            + f" LIMIT {m.group(2)}"
        )
    elif _TOP_ANY_RE.search(out):
        raise ValueError(
            "SELECT TOP n is only supported on the outermost statement; "
            "rewrite inner TOPs as LIMIT"
        )
    out = _rewrite_connect_by(out)
    out = _PATH_RE.sub(lambda m: f"get_json_object({m.group(1)}, '$.{m.group(2)}')", out)
    out = _rewrite_unquoted_paths(out)
    out = _rewrite_casts(out)
    out = _rewrite_funcs(out)
    out = _rewrite_window_funcs(out)
    out = _rewrite_qualify(out)
    out = _GLOBAL_ROWNUM_RE.sub(GLOBAL_ROWNUM_MARKER, out)
    leftover = _GLOBAL_WINDOW_RE.search(out)
    if leftover:
        # Any OTHER function over the null window would need a
        # single-partition Window (all rows on one executor) — a silent
        # scale-killer at 100 TB. The reference itself only ever uses
        # row_number() here (macros/apps/*_upload.sql), which routes
        # through ops.rownum.with_global_index; refuse the rest loudly.
        raise ValueError(
            "only row_number() is supported over (partition by null order "
            "by null): other window functions would force a "
            "single-partition Window plan. Rewrite with an explicit "
            "partition/order key, or use ops.rownum.with_global_index for "
            "global numbering."
        )
    return out


def _rewrite_qualify(sql: str) -> str:
    """QUALIFY pred -> post-window filter in a wrapping SELECT.

    ``<query> QUALIFY <pred> [tail]`` becomes
    ``SELECT * EXCEPT(__q) FROM (SELECT *, (<pred>) AS __q FROM
    (<query>)) WHERE __q [tail]`` — the predicate's window functions
    evaluate over the inner query's output, which covers the idiomatic
    dedupe/top-per-group uses (predicates referencing un-selected input
    columns are not supported). Only a top-level, single QUALIFY is
    rewritten; QUALIFY inside subqueries raises.
    """
    matches = [
        m for m in _QUALIFY_RE.finditer(sql) if _depth_at(sql, m.start()) == 0
    ]
    if not matches:
        if _QUALIFY_RE.search(sql):
            raise ValueError(
                "QUALIFY inside a subquery is not supported by the "
                "transpiler; lift it into the outer query or filter a "
                "window column explicitly"
            )
        return sql
    m = matches[0]
    head = sql[: m.start()].rstrip()
    rest = sql[m.end() :]
    tail_m = next(
        (
            t
            for t in _QUALIFY_TAIL_RE.finditer(rest)
            if _depth_at(rest, t.start()) == 0
        ),
        None,
    )
    pred = (rest[: tail_m.start()] if tail_m else rest).strip()
    tail = rest[tail_m.start() :].strip() if tail_m else ""
    return (
        f"SELECT * EXCEPT(__q) FROM (SELECT *, ({pred}) AS __q FROM "
        f"({head})) WHERE __q {tail}".strip()
    )


def _depth_at(sql: str, pos: int) -> int:
    depth = 0
    for c in sql[:pos]:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
    return depth


_IDENT_RE = re.compile(r"[A-Za-z_][\w.]*")
_GID_COL = "__gid__"
# Keywords that can follow a FROM relation with no alias between them;
# any other bare identifier in that position IS an alias.
_POST_FROM_KEYWORDS = {
    "where", "group", "order", "limit", "having", "qualify", "join",
    "inner", "left", "right", "full", "cross", "natural", "on", "using",
    "union", "intersect", "except", "minus", "window",
}


def _has_alias_after(sql: str, fe: int) -> bool:
    """True when an explicit alias token follows the FROM identifier at fe."""
    j = fe
    n = len(sql)
    while j < n and sql[j].isspace():
        j += 1
    m = _IDENT_RE.match(sql, j)
    if not m:
        return False
    tok = m.group(0).lower()
    return tok == "as" or tok not in _POST_FROM_KEYWORDS


def _from_target(sql: str, mpos: int) -> tuple[int, int, str]:
    """Locate the FROM relation of the SELECT containing the marker.

    Forward scan from the marker tracking parenthesis depth relative to
    the marker's position: the owning SELECT's FROM appears at depth <= 0
    (closing parens of expression groups around the marker may take depth
    negative); any FROM at depth > 0 belongs to a nested scalar subquery
    in a later select item and is skipped.
    """
    depth = 0
    i = mpos
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth <= 0
            and sql[i : i + 4].lower() == "from"
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
            and (i + 4 >= n or not (sql[i + 4].isalnum() or sql[i + 4] == "_"))
        ):
            j = i + 4
            while j < n and sql[j].isspace():
                j += 1
            m = _IDENT_RE.match(sql, j)
            if not m:
                raise ValueError(
                    "global row_number() requires its SELECT to read FROM a "
                    "named table/view (subquery FROM unsupported); "
                    "materialize the subquery or use "
                    "ops.rownum.with_global_index directly"
                )
            return j, m.end(), m.group(0)
        i += 1
    raise ValueError("no FROM found for global row_number() marker")


def resolve_global_rownum(spark, sql: str) -> str:
    """Replace GLOBAL_ROWNUM_MARKER occurrences with a dense index column.

    For each SELECT using the marker, the FROM relation is swapped for a
    temp view pre-numbered by ops.rownum.with_global_index (two narrow
    jobs, no single-partition Window — SURVEY.md §4.1). All markers over
    one relation share one index assignment, matching Snowflake's
    single-window evaluation.
    """
    from ..ops.rownum import with_global_index

    aliased: dict[str, str] = {}
    while GLOBAL_ROWNUM_MARKER in sql:
        mpos = sql.index(GLOBAL_ROWNUM_MARKER)
        fs, fe, ident = _from_target(sql, mpos)
        if ident.endswith("__gidx"):  # second marker over the same SELECT
            alias = ident
        elif ident in aliased:
            alias = aliased[ident]
        else:
            alias = f"{ident.replace('.', '_')}__gidx"
            try:
                base = spark.table(ident)
            except Exception as e:
                raise ValueError(
                    f"global row_number(): FROM relation '{ident}' must be a "
                    "resolvable table/view (CTE names are not; materialize "
                    "the CTE first)"
                ) from e
            with_global_index(base, _GID_COL, one_based=True).createOrReplaceTempView(
                alias
            )
            aliased[ident] = alias
        # Preserve qualified references (t.x): when the original FROM had
        # no explicit alias, re-alias the swapped view back to the source
        # name's last segment so existing qualifiers keep resolving
        # (ADVICE r2: bare swap broke `SELECT t.x ... FROM t`).
        replacement = alias
        if alias != ident and not _has_alias_after(sql, fe):
            replacement = f"{alias} AS {ident.rsplit('.', 1)[-1]}"
        sql = sql[:fs] + replacement + sql[fe:]
        sql = sql.replace(GLOBAL_ROWNUM_MARKER, _GID_COL, 1)
    return sql


# ---------------------------------------------------------------------------
# Snowflake time travel: ``FROM t AT(VERSION => 3)`` /
# ``AT(TIMESTAMP => '...')`` / ``AT(OFFSET => -3600)``  (r7).
# Snowflake documents AT/BEFORE on any table; our store's immutable
# version directories provide the same semantics (engine/store.py::
# read_version). Resolution mirrors resolve_global_rownum: the FROM
# target swaps for a temp view registered from the historical read, so
# the query itself stays pure Spark SQL.
# ---------------------------------------------------------------------------
_AT_RE = re.compile(
    r"\b([A-Za-z_][\w.]*)\s+(at|before)\s*\(\s*(version|timestamp|offset)"
    r"\s*=>\s*('[^']*'|-?\d+(?:\.\d+)?)\s*\)",
    re.IGNORECASE,
)

# Snowflake change tracking: ``FROM t CHANGES(INFORMATION => DEFAULT |
# APPEND_ONLY) AT(VERSION => n) [END(VERSION => m)]`` (r9). Resolution
# mirrors resolve_time_travel: the FROM target swaps for a temp view
# over the store's version-diff CDC read (store.read_changes), rendered
# with Snowflake's metadata columns. Must run BEFORE resolve_time_travel
# (its own AT(...) belongs to the CHANGES clause, not to time travel).
_CHANGES_RE = re.compile(
    r"\b([A-Za-z_][\w.]*)\s+changes\s*\(\s*information\s*=>\s*"
    r"(default|append_only)\s*\)"
    r"\s*at\s*\(\s*version\s*=>\s*(\d+)\s*\)"
    r"(?:\s*end\s*\(\s*version\s*=>\s*(\d+)\s*\))?",
    re.IGNORECASE,
)


def snowflake_change_columns(df):
    """Render a store.read_changes frame with Snowflake's change-
    tracking metadata columns: METADATA$ACTION ('INSERT'|'DELETE') and
    METADATA$ISUPDATE (update pre/post images), dropping the internal
    change_type. Shared by the CHANGES clause and STREAM reads."""
    from pyspark.sql import functions as F

    return (
        df.withColumn(
            "METADATA$ACTION",
            F.when(
                F.col("change_type").isin("insert", "update_postimage"),
                F.lit("INSERT"),
            ).otherwise(F.lit("DELETE")),
        )
        .withColumn(
            "METADATA$ISUPDATE",
            F.col("change_type").startswith("update"),
        )
        .drop("change_type")
    )


def resolve_changes(spark, store, sql: str, mask_fn=None) -> str:
    """Rewrite ``<table> CHANGES(INFORMATION => ...) AT(VERSION => n)
    [END(VERSION => m)]`` to temp views over the store's CDC diff.

    Snowflake semantics (net delta between the two points, reference:
    Snowflake CHANGES clause on change-tracked tables):
    - ``DEFAULT``: inserts as (METADATA$ACTION='INSERT',
      METADATA$ISUPDATE=false), deletes as ('DELETE', false), updated
      rows as a pre-image ('DELETE', true) + post-image ('INSERT',
      true) pair. Unchanged rows emit nothing.
    - ``APPEND_ONLY``: only appended rows (inserts; update images and
      deletes excluded).
    - END defaults to the table's current version. Start point is
      VERSION only (Snowflake also allows TIMESTAMP/OFFSET there; use
      AT time travel to resolve a timestamp to a version first).
    - Row identity is the table's informational PRIMARY KEY
      (``ALTER TABLE t ADD [CONSTRAINT n] PRIMARY KEY (col)``) — the
      engine analogue of Snowflake's change-tracking requirement
      (CHANGE_TRACKING = TRUE): CHANGES on a table without a PK raises.
    - ``mask_fn``: governance hook — masking and row access policies
      apply to change rows exactly as on time-travel reads.
    In Spark SQL, quote the metadata columns with backticks
    (`` `METADATA$ACTION` ``); Snowflake's unquoted form is not valid
    Spark identifier syntax.
    """
    from pyspark.sql import functions as F

    def sub(m: re.Match) -> str:
        ident, info, v_from = m.group(1), m.group(2).lower(), int(m.group(3))
        pk = store.primary_key(ident)
        if not pk:
            raise ValueError(
                f"CHANGES requires a PRIMARY KEY on '{ident}' for row "
                "identity — ALTER TABLE ... ADD PRIMARY KEY (col) first "
                "(the engine analogue of CHANGE_TRACKING = TRUE)"
            )
        v_end = (
            int(m.group(4))
            if m.group(4) is not None
            else store.current_version(ident)
        )
        raw = store.read_changes(
            spark, ident, v_from, v_end, pk["columns"]
        )
        if info == "append_only":
            raw = raw.filter(F.col("change_type") == "insert")
        if mask_fn is not None:
            raw = mask_fn(ident, raw)
        df = (
            raw.withColumn(
                "METADATA$ACTION",
                F.when(
                    F.col("change_type").isin("insert", "update_postimage"),
                    F.lit("INSERT"),
                ).otherwise(F.lit("DELETE")),
            )
            .withColumn(
                "METADATA$ISUPDATE",
                F.col("change_type").startswith("update"),
            )
            .drop("change_type")
        )
        alias = f"{ident.replace('.', '_')}__changes_v{v_from}_{v_end}"
        df.createOrReplaceTempView(alias)
        return f"{alias} AS {ident.rsplit('.', 1)[-1]}"

    return _CHANGES_RE.sub(sub, sql)


def resolve_time_travel(spark, store, sql: str, mask_fn=None) -> str:
    """Rewrite ``<table> AT(...)`` clauses to temp views over the
    store's historical versions.

    ``mask_fn(name, df) -> df`` — governance hook (ADVICE r8 #1):
    Snowflake applies masking and row access policies to time-travel
    reads too, so the engine passes its ``_policy_masked`` here; a raw
    ``store.read_version`` view would otherwise leak pre-mask PII
    through ``SELECT ... FROM t AT(VERSION => n)``. Policies are
    evaluated AS OF QUERY TIME (current attachments over historical
    data), matching Snowflake's behavior.

    - ``VERSION => n``: read version n directly (raises if vacuumed —
      never silently reads the wrong data, same contract as
      read_version).
    - ``TIMESTAMP => 'ts'`` (UTC): the latest version whose commit time
      (operation log) is <= ts.
    - ``OFFSET => -secs``: TIMESTAMP semantics at now+offset (offset
      must be <= 0, as in Snowflake).
    """
    import datetime as _dt

    def pick_version_at(name: str, cutoff_epoch: float) -> int:
        rows = store.history(spark, name).collect()
        eligible = [r["version"] for r in rows if r["ts_unix"] <= cutoff_epoch]
        if not eligible:
            raise ValueError(
                f"time travel: no committed version of '{name}' at or "
                f"before the requested time"
            )
        return max(eligible)

    def sub(m: re.Match) -> str:
        ident, mode, kind, raw = (
            m.group(1),
            m.group(2).lower(),
            m.group(3).lower(),
            m.group(4),
        )
        if kind == "version":
            v = int(raw)
        elif kind == "timestamp":
            ts = _dt.datetime.fromisoformat(raw.strip("'"))
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            v = pick_version_at(ident, ts.timestamp())
        else:  # offset
            off = float(raw)
            if off > 0:
                raise ValueError("time travel OFFSET must be <= 0 seconds")
            now = _dt.datetime.now(tz=_dt.timezone.utc).timestamp()
            v = pick_version_at(ident, now + off)
        if mode == "before":
            # Snowflake BEFORE: state strictly prior to the reference
            # point — one version earlier than the AT resolution.
            v -= 1
            if v < 0:
                raise ValueError(
                    f"time travel: no version of '{ident}' exists before "
                    "the requested point"
                )
        alias = f"{ident.replace('.', '_')}__at_v{v}"
        hist = store.read_version(spark, ident, v)
        if mask_fn is not None:
            hist = mask_fn(ident, hist)
        hist.createOrReplaceTempView(alias)
        # re-alias back to the bare table name so existing qualified
        # references (t.x) keep resolving
        return f"{alias} AS {ident.rsplit('.', 1)[-1]}"

    return _AT_RE.sub(sub, sql)
