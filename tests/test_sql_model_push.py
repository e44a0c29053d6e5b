"""End-to-end: a push model DEFINED IN THE REFERENCE'S SQL DIALECT runs
through Jinja-lite compile -> sqlfront transpile -> spark.sql -> the
Salesforce push pipeline. This is the 'a user of the reference could
switch' path: model text stays in their dialect."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.connectors import MockSalesforceConnector
from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations import tracking

SQL_MODEL = """
-- depends_on: {{ ref('sfdc_load_tasks') }}
-- depends_on: {{ ref('sfdc_load_task_logs') }}
select OBJECT_CONSTRUCT('Name', NAME, 'AccountID__c', ACCOUNT_ID) as record
from {{ ref('accounts_sql') }}
where 1=1
and ACCOUNT_ID not in (
    select RECORD:"AccountID__c"::varchar
    from {{ ref('sfdc_load_task_logs') }}
    where load_task_name = 'accounts_sql_load'
    and RESULT:"success" = true
)
"""


@pytest.fixture(scope="module")
def sql_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sql_store"))
    engine = Engine(spark, TableStore(root))
    engine.seed(
        "accounts_sql",
        spark.createDataFrame(
            [(f"Co {i}", f"co-{i}") for i in range(50)],
            "NAME string, ACCOUNT_ID string",
        ),
    )
    for t in (tracking.SFDC_LOAD_TASKS, tracking.SFDC_LOAD_TASK_LOGS):
        engine.register(
            Model(
                t,
                builder=lambda ctx, n=t: spark.createDataFrame(
                    [], tracking.SCHEMAS[n]
                ),
                config={"materialized": "tracking_table", "unique_key": "job_id"},
            )
        )
    engine.register(
        Model(
            "accounts_sql_load",
            sql=SQL_MODEL,
            config={
                "materialized": "omnata_push",
                "app": "salesforce",
                "operation": "bulk_load",
                "load_type": "upsert",
                "object_name": "Account",
                "external_id_field": "AccountID__c",
                "dialect": "snowflake",
                "max_parallel_batches": 2,
                "connector": MockSalesforceConnector(),
            },
        )
    )
    return engine


def test_sql_dialect_push_end_to_end(sql_engine):
    first = sql_engine.run()
    assert first["accounts_sql_load"].status == "success"
    assert first["accounts_sql_load"].rows_affected == 50

    logs = sql_engine.store.read(sql_engine.spark, tracking.SFDC_LOAD_TASK_LOGS)
    mine = logs.filter(F.col("load_task_name") == "accounts_sql_load")
    assert mine.count() == 50
    # RECORD column came from OBJECT_CONSTRUCT -> JSON string boundary.
    sample = mine.limit(1).collect()[0]
    assert sample["record"].startswith("{")
    assert (
        mine.filter(
            F.get_json_object("record", "$.AccountID__c").isNull()
        ).count()
        == 0
    )

    # Second run: the dialect NOT-IN filter sees the pushed records.
    second = sql_engine.run()
    assert second["accounts_sql_load"].status == "skipped"
    assert (
        sql_engine.store.read(sql_engine.spark, tracking.SFDC_LOAD_TASK_LOGS)
        .filter(F.col("load_task_name") == "accounts_sql_load")
        .count()
        == 50
    )
