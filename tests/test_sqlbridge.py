"""SQL-callable external functions (connectors/sqlbridge.py): the
reference's macro statements run near-verbatim through
Engine.execute_script with `"db"."schema".FN(...)` calls bridged to
connector-backed pandas UDFs.

The Salesforce script below is /root/reference/macros/apps/operations/
salesforce_bulk_load.sql:14-55 with Jinja resolved and nothing else
changed; the SFMC statements mirror marketing_cloud_data_extension_
upload.sql:57-116's function call shapes.
"""

from __future__ import annotations

import json

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


def _make_tables(spark, engine):
    engine.store.create(
        spark, "sfdc_load_tasks",
        spark.createDataFrame(
            [],
            "job_id string, load_task_name string, object_name string, "
            "operation string, external_id_field string, "
            "creation_time timestamp, creation_metadata string, "
            "close_metadata string",
        ),
    )
    engine.store.create(
        spark, "sfdc_load_task_logs",
        spark.createDataFrame(
            [],
            "job_id string, job_log_entry_id string, load_task_name string, "
            "object_name string, operation string, external_id_field string, "
            "record string, result string",
        ),
    )


class TestSalesforceBulkLoadScript:
    def test_reference_statement_sequence(self, spark, engine):
        _make_tables(spark, engine)
        engine.seed(
            "contacts",
            spark.createDataFrame(
                [(i, f"u{i}@x.com", f"Name {i}") for i in range(200)],
                "c_id long, c_email string, c_name string",
            ),
        )
        # salesforce_bulk_load.sql:14-55, Jinja resolved:
        #   temp_table=temp_42, load_task_name=contacts_load,
        #   object_name=Contact, load_type=upsert, external_id_field=Email,
        #   serial_load=False, functions db/schema = OMNATA.FUNCTIONS,
        #   {{ sql }} = the model body producing `record`.
        engine.execute_script(
            """
            create temp table temp_42 as(
                select "OMNATA"."FUNCTIONS".SFDC_BULK_API_CREATE_JOB('upsert','Contact',False,'Email') as METADATA
            );
            insert into sfdc_load_tasks (job_id,load_task_name,object_name,operation,external_id_field,creation_time,creation_metadata)
            select METADATA:"id",
                'contacts_load',
                'Contact',
                'upsert',
                'Email',
                current_timestamp(),
                METADATA
            from temp_42;
            insert into sfdc_load_task_logs
            with load_source as (
                select OBJECT_CONSTRUCT('Email', c_email, 'Name', c_name) as record from contacts
            )
            select METADATA:"id" as job_id,
                    UUID_STRING() as job_log_entry_id,
                    'contacts_load',
                    'Contact',
                    'upsert',
                    'Email',
                    load_source.record,
                    "OMNATA"."FUNCTIONS".SFDC_BULK_API_LOAD_BATCH(METADATA:"id",load_source.RECORD,true) as result
            from load_source,temp_42;
            update sfdc_load_tasks load_tasks
            set close_metadata = "OMNATA"."FUNCTIONS".SFDC_BULK_API_CLOSE_JOB(METADATA:"id",true)
            from temp_42
            where load_tasks.job_id = METADATA:"id";
            """
        )
        tasks = engine.query("select * from sfdc_load_tasks").collect()
        assert len(tasks) == 1
        task = tasks[0]
        assert task["object_name"] == "Contact"
        meta = json.loads(task["creation_metadata"])
        assert meta["id"] == task["job_id"]
        assert meta["state"] == "Queued"
        close = json.loads(task["close_metadata"])
        assert close["state"] == "Closed"

        logs = engine.query("select * from sfdc_load_task_logs").collect()
        assert len(logs) == 200
        assert len({r["job_log_entry_id"] for r in logs}) == 200
        for r in logs:
            assert r["job_id"] == task["job_id"]
            assert json.loads(r["result"])["success"] is True
            assert json.loads(r["record"])["Email"].endswith("@x.com")

    def test_load_batch_calls_are_batched_per_arrow_page(
        self, spark, engine, tmp_path
    ):
        """Per-record SQL call sites must NOT mean per-record connector
        calls: rows group per (Arrow page, job id) — call count is
        bounded by partitions, while record totals are exact."""
        from dbt_omnata_push_spark.connectors.mock_salesforce import (
            MockSalesforceConnector,
        )

        log = str(tmp_path / "calls.csv")
        engine.vars["omnata_sql_connectors"] = {
            "salesforce": MockSalesforceConnector(call_log=log)
        }
        _make_tables(spark, engine)
        engine.seed(
            "contacts",
            spark.createDataFrame(
                [(i, f"u{i}@x.com") for i in range(1000)],
                "c_id long, c_email string",
            ).repartition(4),
        )
        engine.execute_script(
            """
            create temp table temp_7 as(
                select "O"."F".SFDC_BULK_API_CREATE_JOB('insert','Contact',False,'Email') as METADATA
            );
            insert into sfdc_load_task_logs
            with load_source as (
                select OBJECT_CONSTRUCT('Email', c_email) as record from contacts
            )
            select METADATA:"id", UUID_STRING(), 'x', 'Contact', 'insert',
                   'Email', load_source.record,
                   "O"."F".SFDC_BULK_API_LOAD_BATCH(METADATA:"id",load_source.RECORD,true)
            from load_source,temp_7;
            """
        )
        calls = [
            line.split(",") for line in open(log).read().strip().splitlines()
        ]
        batches = [int(n) for kind, n in calls if kind == "load_batch"]
        assert sum(batches) == 1000  # every record delivered exactly once
        assert len(batches) <= 8  # batched, never per-record


class TestMarketingCloudFns:
    def test_manage_stage_import_poll_fetch(self, spark, engine):
        out = engine.query(
            "select \"OM\".\"FN\".SFMC_DATA_EXTENSION_MANAGE(PARSE_JSON("
            "'{\"name\": \"de1\", \"extension_fields\": [\"Email\"]}')) as meta"
        ).collect()[0]
        meta = json.loads(out["meta"])
        assert meta["success"] is True

        engine.seed(
            "rows_src",
            spark.createDataFrame(
                [(i, f"rec{i}") for i in range(1, 251)], "rn long, rec string"
            ),
        )
        staged = engine.query(
            'select "OM"."FN".SFMC_STAGE_DATA('
            "array_agg(array_construct(rn, rec))) as staged_result "
            "from rows_src"
        ).collect()[0]["staged_result"]
        assert staged == "abcd"  # the reference harness's canned id

        done = engine.query(
            "select \"OM\".\"FN\".SFMC_AWAIT_RESULTS_POLL("
            "\"OM\".\"FN\".SFMC_DE_IMPORT("
            "PARSE_JSON('{\"name\": \"de1\", \"operation\": \"upsert\"}'),"
            "'abcd')) as import_result"
        ).collect()[0]["import_result"]
        assert done is True

        res = engine.query(
            'select rn, "OM"."FN".SFMC_FETCH_RESULTS(\'abcd\', rn) as result '
            "from rows_src"
        ).collect()
        assert len(res) == 250
        assert all(json.loads(r["result"])["success"] is True for r in res)


class TestBridgeGuards:
    def test_unknown_namespaced_function_left_untouched(self, spark, engine):
        with pytest.raises(Exception):
            engine.query('select "A"."B".NOT_A_REAL_FN(1) as x')

    def test_gpg_table_function_chain_refused(self, spark, engine):
        # The GPG UDTF chain rides a forced single-partition window;
        # transpile refuses it loudly (ops/gpg.py is the redesign).
        with pytest.raises(ValueError, match="row_number"):
            engine.query(
                "select sum(x) over (partition by null order by null) from t"
            )


class TestModelLevelBridge:
    def test_snowflake_model_with_ext_fn_materializes(self, spark, engine):
        """A registered snowflake-dialect MODEL whose SQL calls an
        external function materializes through engine.run — the bridge
        registers the UDF during build_df, so model text that embeds
        `"db"."schema".FN(...)` runs unchanged."""
        from dbt_omnata_push_spark.engine.model import Model

        engine.seed(
            "de_specs",
            spark.createDataFrame(
                [('{"name": "de_main", "extension_fields": ["Email"]}',)],
                "spec string",
            ),
        )
        engine.register(
            Model(
                "de_metadata",
                sql=(
                    'select "OMNATA"."FUNCTIONS".SFMC_DATA_EXTENSION_MANAGE('
                    "PARSE_JSON(spec)) as metadata_creation_result "
                    "from {{ ref('de_specs') }}"
                ),
                config={"materialized": "table", "dialect": "snowflake"},
            )
        )
        res = engine.run(["de_metadata"])
        assert res["de_metadata"].status == "success"
        row = engine.query("select * from de_metadata").collect()[0]
        assert json.loads(row["metadata_creation_result"])["success"] is True
