"""SQL-callable external functions: the reference's
``"db"."schema".FN(...)`` scalar surface bridged to the connector
registry, so the macros' statements run near-verbatim through
``Engine.query`` / ``execute_script``.

``sqlfront.transpile`` strips the two-part namespace prefix off the
eight KNOWN scalar function names below (the namespace's routing role —
one set of deployed External Functions per environment,
/root/reference/README.md:130-139 — is played here by engine vars via
``connectors.base.get_connector``); ``ensure_ext_fns`` then registers
each referenced name as an Arrow-batched pandas UDF closed over the
resolved connector, under its exact reference name, so the statement
text calls it directly.

Placement semantics: Snowflake External Functions execute remotely,
invoked from wherever the warehouse evaluates the expression; here the
UDFs run on executors with the driver-resolved (picklable) connector
shipped in. Per-record call sites batch per Arrow page —
``SFDC_BULK_API_LOAD_BATCH`` / ``SFMC_FETCH_RESULTS`` group rows by
job/stage id within each page and make ONE connector call per group —
matching the batched-call posture of ``materializations/push.py``,
which remains the production pipeline route (and the only route for
the GPG_* TABLE functions: the reference chains those over a forced
single-partition window, which ``transpile`` refuses loudly;
``ops/gpg.py`` is the per-batch redesign).
"""

from __future__ import annotations

import json
import re

import pandas as pd

from .base import get_connector

# The complete scalar external-function inventory of the reference
# (macros/apps/operations/*.sql; the GPG_* names are table functions).
SCALAR_FNS = {
    "SFDC_BULK_API_CREATE_JOB",
    "SFDC_BULK_API_LOAD_BATCH",
    "SFDC_BULK_API_CLOSE_JOB",
    "SFMC_DATA_EXTENSION_MANAGE",
    "SFMC_STAGE_DATA",
    "SFMC_DE_IMPORT",
    "SFMC_AWAIT_RESULTS_POLL",
    "SFMC_FETCH_RESULTS",
}

_APP_BY_PREFIX = {"SFDC": "salesforce", "SFMC": "marketing_cloud"}

_QUOTED_PREFIX_RE = re.compile(
    r'"[^"]*"\s*\.\s*"[^"]*"\s*\.\s*([A-Za-z_][\w]*)\s*\('
)
_UNQUOTED_PREFIX_RE = re.compile(
    r"\b[A-Za-z_][\w]*\s*\.\s*[A-Za-z_][\w]*\s*\.\s*"
    r"((?:SFDC|SFMC)_[A-Za-z_]\w*)\s*\("
)
_NAME_RE = re.compile(r"\b((?:SFDC|SFMC)_[A-Z_0-9]+)\s*\(")


def strip_namespaces(sql: str) -> str:
    """``"DB"."SCHEMA".SFDC_..."(`` -> ``SFDC_...(`` for known scalar
    external functions; anything else is left untouched."""

    def sub(m: re.Match) -> str:
        name = m.group(1).upper()
        if name in SCALAR_FNS:
            return f"{name}("
        return m.group(0)

    out = _QUOTED_PREFIX_RE.sub(sub, sql)
    return _UNQUOTED_PREFIX_RE.sub(sub, out)


def referenced_fns(sql: str) -> list[str]:
    return sorted(
        n for n in set(_NAME_RE.findall(sql.upper())) if n in SCALAR_FNS
    )


def ensure_ext_fns(spark, sql: str, vars: dict | None = None) -> list[str]:
    """Register a pandas UDF (under the reference name) for every known
    external function the statement references. Connectors resolve
    per app through the registry/vars routing; a test (or caller) can
    pin exact instances via ``vars['omnata_sql_connectors'] = {app:
    connector}``. Re-registration is idempotent."""
    names = referenced_fns(sql)
    if not names:
        return []
    pinned = (vars or {}).get("omnata_sql_connectors", {})
    conns: dict[str, object] = {}
    for name in names:
        app = _APP_BY_PREFIX[name.split("_", 1)[0]]
        if app not in conns:
            conns[app] = pinned.get(app) or get_connector(app, vars=vars)
    for name in names:
        app = _APP_BY_PREFIX[name.split("_", 1)[0]]
        spark.udf.register(name, _build_udf(name, conns[app]))
    return names


def _build_udf(name: str, conn):
    from pyspark.sql.functions import pandas_udf

    if name == "SFDC_BULK_API_CREATE_JOB":

        @pandas_udf("string")
        def create_job(
            op: pd.Series, obj: pd.Series, serial: pd.Series, ext_id: pd.Series
        ) -> pd.Series:
            return pd.Series(
                [
                    json.dumps(conn.create_job(o, ob, bool(s), e))
                    for o, ob, s, e in zip(op, obj, serial, ext_id)
                ],
                dtype=object,
            )

        return create_job

    if name == "SFDC_BULK_API_LOAD_BATCH":

        @pandas_udf("string")
        def load_batch(
            job_id: pd.Series, record: pd.Series, wait: pd.Series
        ) -> pd.Series:
            out = pd.Series([None] * len(job_id), dtype=object)
            for jid in job_id.dropna().unique():
                idx = job_id.index[job_id == jid]
                recs = [json.loads(r) for r in record[idx]]
                res = conn.load_batch(jid, recs)
                out[idx] = [json.dumps(x) for x in res]
            return out

        return load_batch

    if name == "SFDC_BULK_API_CLOSE_JOB":

        @pandas_udf("string")
        def close_job(job_id: pd.Series, wait: pd.Series) -> pd.Series:
            return pd.Series(
                [json.dumps(conn.close_job(j)) for j in job_id], dtype=object
            )

        return close_job

    if name == "SFMC_DATA_EXTENSION_MANAGE":

        @pandas_udf("string")
        def manage(config: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    json.dumps(conn.ensure_data_extension(json.loads(c)))
                    for c in config
                ],
                dtype=object,
            )

        return manage

    if name == "SFMC_STAGE_DATA":

        @pandas_udf("string")
        def stage(pairs: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    conn.stage_batch([[int(p[0]), p[1]] for p in batch])
                    if batch is not None
                    else None
                    for batch in pairs
                ],
                dtype=object,
            )

        return stage

    if name == "SFMC_DE_IMPORT":

        @pandas_udf("string")
        def de_import(params: pd.Series, stage_id: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    conn.start_import(json.loads(p), s)
                    for p, s in zip(params, stage_id)
                ],
                dtype=object,
            )

        return de_import

    if name == "SFMC_AWAIT_RESULTS_POLL":

        @pandas_udf("boolean")
        def poll(handle: pd.Series) -> pd.Series:
            return pd.Series([bool(conn.wait_for_import(h)) for h in handle])

        return poll

    if name == "SFMC_FETCH_RESULTS":

        @pandas_udf("string")
        def fetch(stage_id: pd.Series, row_number: pd.Series) -> pd.Series:
            out = pd.Series([None] * len(stage_id), dtype=object)
            for sid in stage_id.dropna().unique():
                idx = stage_id.index[stage_id == sid]
                res = conn.fetch_results(sid, [int(r) for r in row_number[idx]])
                out[idx] = [json.dumps(x) for x in res]
            return out

        return fetch

    raise ValueError(f"unknown external function: {name}")
