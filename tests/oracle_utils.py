"""Local replica of the driver's Spark-vs-DuckDB comparison.

Stricter than the driver (exact value equality after column-name sort),
so anything passing here should hash-match in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import numpy as _np

        if isinstance(v, _np.ndarray):  # DuckDB list columns (r12)
            return tuple(_norm(x) for x in v.tolist())
        if isinstance(v, _np.generic):
            return _norm(v.item())
    except ImportError:
        pass
    if v != v:  # pandas.NaT (and any NaN-like) — not equal to itself
        return "NaN"
    if isinstance(v, datetime.datetime):
        # pandas.Timestamp is a datetime subclass; force plain datetime so
        # repr-based sorting is type-stable.
        return datetime.datetime(
            v.year, v.month, v.day, v.hour, v.minute, v.second, v.microsecond
        )
    if hasattr(v, "to_pydatetime"):  # pandas.Timestamp
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:  # Decimal -> float-compatible comparison via exact str? keep Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _tz_aware_oracle_cols(odf):
    """Oracle columns whose pandas dtype is tz-aware (DuckDB TIMESTAMPTZ).

    The driver's schema comparison is tz-strict: a DuckDB TIMESTAMPTZ
    column against a Spark timestamp (which materializes naive via
    Arrow/pandas) records schema_match=false even when wall-clock values
    agree (r12 `events_dialect_scalars`). `_norm` erases tzinfo for value
    comparison, so without this check a mistyped oracle passes locally
    and fails at the driver. Fix the oracle with CAST(... AS TIMESTAMP).
    """
    out = []
    for col in odf.columns:
        tz = getattr(odf[col].dtype, "tz", None)
        if tz is not None:
            out.append(col)
    return out


def compare(spark_df, oracle: str, sf_dir: str, float_tol: float = 0.0):
    """Return (ok, detail). Column-name-sorted, row-order-insensitive."""
    con = duckdb_con(sf_dir)
    odf = con.execute(oracle).fetchdf()
    tz_cols = _tz_aware_oracle_cols(odf)
    if tz_cols:
        return False, (
            "driver-strict schema mismatch: oracle columns are tz-aware "
            f"(TIMESTAMPTZ) {tz_cols}; Spark side materializes naive — "
            "wrap the oracle expression in CAST(... AS TIMESTAMP)"
        )
    ocols = sorted(odf.columns.str.lower())
    scols = sorted(c.lower() for c in spark_df.columns)
    if ocols != scols:
        return False, f"schema mismatch: spark={scols} oracle={ocols}"
    srows = [
        tuple(_norm(r[c]) for c in sorted(spark_df.columns, key=str.lower))
        for r in (row.asDict() for row in spark_df.collect())
    ]
    orows = [
        tuple(_norm(v) for v in row)
        for row in odf[sorted(odf.columns, key=str.lower)].itertuples(index=False)
    ]
    if len(srows) != len(orows):
        return False, f"row count: spark={len(srows)} oracle={len(orows)}"
    s_sorted = sorted(srows, key=repr)
    o_sorted = sorted(orows, key=repr)
    for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
        if a != b:
            if float_tol and _close(a, b, float_tol):
                continue
            return False, f"row {i}: spark={a!r} oracle={b!r}"
    return True, f"ok ({len(srows)} rows)"


def _close(a, b, tol):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if abs(x - y) > tol * max(1.0, abs(x), abs(y)):
                return False
        elif x != y:
            return False
    return True
