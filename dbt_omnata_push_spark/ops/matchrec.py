"""MATCH_RECOGNIZE-lite: Snowflake row-pattern matching on Spark.

Snowflake's ``MATCH_RECOGNIZE`` (reference dialect surface) finds regex
patterns over ordered rows within partitions. OSS Spark has no
equivalent, and the semantics (sequential pattern backtracking along an
order) are inherently per-partition imperative — exactly the case the
build rules reserve for ``applyInPandas``: partitions distribute, the
per-group matcher is Arrow-batched pandas, nothing ever concentrates on
one executor.

Supported subset (the common analytics shapes; everything else raises):

- ``PARTITION BY p ORDER BY o`` — one pandas group per partition key.
- ``DEFINE sym AS <predicate>`` — a pandas ``DataFrame.eval`` boolean
  expression over the row's columns plus ``prev_<col>`` /  ``next_<col>``
  (LAG/LEAD-1 of every column, precomputed per group). Symbols must be
  MUTUALLY EXCLUSIVE per row — then variable assignment is unambiguous
  and matching reduces to a regex over the per-row symbol string, with
  Python's ``re`` providing the same greedy-with-backtracking semantics
  as Snowflake's pattern engine. Overlapping defines raise per group.
- ``PATTERN`` — a regex over symbol names: concatenation, ``+`` ``*``
  ``?`` ``|`` and parentheses (e.g. ``"D+ U+"``).
- ``ONE ROW PER MATCH`` with ``AFTER MATCH SKIP PAST LAST ROW``
  (``re.finditer`` semantics: non-overlapping, leftmost, greedy).
- ``MEASURES`` — ``first(col)``, ``last(col)``, ``count()``,
  ``count(SYM)``, ``match_number()``.

Output: partition keys + one column per measure, one row per match.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MEASURE_RE = re.compile(
    r"^\s*(first|last|count|match_number)\s*\(\s*([A-Za-z_]\w*)?\s*\)\s*$",
    re.IGNORECASE,
)
_SYM_RE = re.compile(r"[A-Za-z_]\w*")


def _measure_type(kind: str, arg: str | None, schema: T.StructType):
    if kind in ("count", "match_number"):
        return T.LongType()
    # first/last carry the column's own type
    return schema[arg].dataType


def match_recognize(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    defines: dict[str, str],
    pattern: str,
    measures: dict[str, str],
) -> DataFrame:
    """One row per pattern match; see module docstring for the subset."""
    symbols = list(defines)
    if len(symbols) > 52:
        raise ValueError("at most 52 pattern symbols supported")
    # symbol name -> single char for the regex alphabet; '.' = no symbol
    alphabet = {
        s: chr(ord("a") + i) if i < 26 else chr(ord("A") + i - 26)
        for i, s in enumerate(symbols)
    }

    # PATTERN "D+ U+" -> "d+u+": replace symbol tokens, drop whitespace,
    # keep regex metachars; unknown tokens raise.
    def tok(m: re.Match) -> str:
        name = m.group(0)
        if name not in alphabet:
            raise ValueError(
                f"PATTERN references undefined symbol: {name}"
            )
        return alphabet[name]

    rx_text = _SYM_RE.sub(tok, pattern).replace(" ", "")
    if not re.fullmatch(r"[a-zA-Z+*?|()]+", rx_text):
        raise ValueError(
            f"unsupported PATTERN syntax: {pattern!r} (concatenation, "
            "+ * ? | and parentheses only)"
        )
    rx = re.compile(rx_text)

    parsed: list[tuple[str, str, str | None]] = []
    for out_name, expr in measures.items():
        m = _MEASURE_RE.match(expr)
        if not m:
            raise ValueError(
                f"unsupported MEASURE {expr!r} (first/last/count/"
                "match_number only)"
            )
        kind, arg = m.group(1).lower(), m.group(2)
        if kind in ("first", "last") and (
            arg is None or arg not in df.columns
        ):
            raise ValueError(f"MEASURE {expr!r}: unknown column {arg}")
        if kind == "count" and arg is not None and arg not in defines:
            raise ValueError(f"MEASURE {expr!r}: unknown symbol {arg}")
        parsed.append((out_name, kind, arg))

    out_fields = [df.schema[c] for c in partition_by] + [
        T.StructField(n, _measure_type(k, a, df.schema), True)
        for n, k, a in parsed
    ]
    out_schema = T.StructType(out_fields)
    data_cols = df.columns

    def run_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(list(order_by), kind="mergesort")
        pdf = pdf.reset_index(drop=True)
        env = {c: pdf[c] for c in data_cols}
        for c in data_cols:
            env[f"prev_{c}"] = pdf[c].shift(1)
            env[f"next_{c}"] = pdf[c].shift(-1)
        flags = {}
        for s, expr in defines.items():
            res = pd.eval(expr, local_dict=env)
            flags[s] = res.fillna(False).astype(bool)
        taken = None
        chars = []
        for s in symbols:
            f = flags[s]
            if taken is None:
                taken = f.copy()
            else:
                if bool((taken & f).any()):
                    raise ValueError(
                        "DEFINE predicates must be mutually exclusive "
                        f"per row (symbol {s} overlaps another)"
                    )
                taken |= f
        for i in range(len(pdf)):
            ch = "."
            for s in symbols:
                if flags[s].iloc[i]:
                    ch = alphabet[s]
                    break
            chars.append(ch)
        seq = "".join(chars)
        rows = []
        match_no = 0
        for m in rx.finditer(seq):
            if m.start() == m.end():
                continue  # empty match (e.g. pure X*) is no match
            match_no += 1
            span = pdf.iloc[m.start() : m.end()]
            row = {c: pdf[c].iloc[m.start()] for c in partition_by}
            for n, kind, arg in parsed:
                if kind == "first":
                    row[n] = span[arg].iloc[0]
                elif kind == "last":
                    row[n] = span[arg].iloc[-1]
                elif kind == "match_number":
                    row[n] = match_no
                elif kind == "count" and arg is None:
                    row[n] = len(span)
                else:  # count(SYM)
                    ch = alphabet[arg]
                    row[n] = seq.count(ch, m.start(), m.end())
            rows.append(row)
        if not rows:
            return pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in out_fields}
            )
        return pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return df.groupBy(*[F.col(c) for c in partition_by]).applyInPandas(
        run_group, schema=out_schema
    )
