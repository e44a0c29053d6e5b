"""Materialization dispatch (the reference's custom materializations).

materialized= config value -> implementation:
  view / table / incremental   stock dbt materializations used by the
                               reference's test models
  tracking_table               full-refresh-immune upsert table
                               (macros/tracking_table_materialization.sql)
  omnata_push                  push dispatch (macros/omnata_push_
                               materialization.sql:9-15)
  load_task                    legacy Salesforce-only push (macros/
                               load_task_materialization.sql) — kept as a
                               config alias onto the salesforce path
                               (SURVEY.md §2.1 D3)
  snapshot                     SCD2 history (dbt's snapshot class; the
                               reference scaffolds snapshots/ but ships
                               no implementation — see snapshot.py)
"""

from __future__ import annotations

from ..engine.dag import RunResult
from .core import materialize_incremental, materialize_table, materialize_tracking_table, materialize_view
from .push import materialize_load_task, materialize_omnata_push
from .snapshot import materialize_snapshot

_DISPATCH = {
    "view": materialize_view,
    "table": materialize_table,
    "incremental": materialize_incremental,
    "tracking_table": materialize_tracking_table,
    "omnata_push": materialize_omnata_push,
    "load_task": materialize_load_task,
    "snapshot": materialize_snapshot,
}


def materialize(engine, model) -> RunResult:
    mat = model.config.get("materialized", "view")
    if mat not in _DISPATCH:
        raise ValueError(f"unknown materialization '{mat}' for model {model.name}")
    return _DISPATCH[mat](engine, model)
