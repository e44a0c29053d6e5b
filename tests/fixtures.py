"""Reference-parity fixtures (FIXTURES.md §1-§3).

Rebuilds the reference's integration test project in engine terms:
seeds (accounts 100, contacts 1000, transactions -> 9500 account-days),
the five test models, and the tracking-table models.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations import tracking
from dbt_omnata_push_spark.materializations.core import high_watermark_incremental

N_ACCOUNTS = 100
N_CONTACTS = 1000
N_DAYS = 95  # 100 accounts x 95 days = 9500 daily rows (FIXTURES.md §1)


def seed_dataframes(spark):
    accounts = spark.createDataFrame(
        [(f"Company {i:03d}", f"company-{i:03d}") for i in range(N_ACCOUNTS)],
        "NAME string, ACCOUNT_ID string",
    )
    contacts = spark.createDataFrame(
        [
            (i, f"First{i}", f"Last{i}", f"user{i}@example.com", f"Title {i % 7}")
            for i in range(N_CONTACTS)
        ],
        "CONTACT_NUMBER int, FIRST_NAME string, LAST_NAME string, "
        "EMAIL string, TITLE string",
    )
    base = datetime.datetime.now() - datetime.timedelta(days=N_DAYS + 1)
    tx_rows = [
        (
            f"company-{a:03d}",
            base + datetime.timedelta(days=d, hours=a % 24),
            float(10 + a + d),
            float(1 + (a + d) % 5),
        )
        for a in range(N_ACCOUNTS)
        for d in range(N_DAYS)
    ]
    transactions = spark.createDataFrame(
        tx_rows,
        "ACCOUNT_ID string, TRANSACTION_DATETIME timestamp, "
        "TRANSACTION_AMOUNT double, REVENUE_AMOUNT double",
    )
    return accounts, contacts, transactions


# --- model builders (mirroring integration_tests/models/**) ---------------


def _already_pushed(ctx, load_task_name: str, key_path: str):
    logs = ctx.ref(tracking.SFDC_LOAD_TASK_LOGS)
    return logs.filter(
        (F.get_json_object("result", "$.success") == "true")
        & (F.col("load_task_name") == load_task_name)
    ).select(F.get_json_object("record", key_path).alias("_loaded"))


def accounts_load_builder(name):
    """accounts_load.sql:14-30: record + incremental NOT-IN anti-join."""

    def build(ctx):
        acc = ctx.ref("accounts")
        rec = acc.select(
            F.struct(
                F.col("NAME").alias("Name"),
                F.col("ACCOUNT_ID").alias("AccountID__c"),
            ).alias("record")
        )
        if not ctx.var("full-refresh-salesforce", False):
            loaded = _already_pushed(ctx, name, "$.AccountID__c")
            rec = rec.join(
                loaded,
                rec["record.AccountID__c"] == loaded["_loaded"],
                "left_anti",
            )
        return rec

    return build


def transactions_daily_builder(ctx):
    """transactions_daily.sql:5-21: daily agg + watermark incremental."""
    tx = ctx.ref("transactions")
    agg = (
        tx.groupBy(
            "ACCOUNT_ID",
            F.col("TRANSACTION_DATETIME").cast("date").alias("TRANSACTIONS_DATE"),
        )
        .agg(
            F.sum("TRANSACTION_AMOUNT").alias("GTV_DAILY"),
            F.sum("REVENUE_AMOUNT").alias("NTR_DAILY"),
        )
        .filter(F.col("TRANSACTIONS_DATE") < F.current_date())
    )
    return high_watermark_incremental(ctx, agg, "TRANSACTIONS_DATE")


def transactions_daily_load_builder(ctx):
    """transactions_daily_load.sql:12-29: nested record + NOT-IN filter."""
    daily = ctx.ref("transactions_daily")
    acc = ctx.ref("accounts")
    joined = daily.join(acc, "ACCOUNT_ID")
    rec = joined.select(
        F.struct(
            F.col("NAME").alias("Name"),
            F.concat_ws(
                "_", F.col("ACCOUNT_ID"), F.col("TRANSACTIONS_DATE").cast("string")
            ).alias("Duplicate_Key__c"),
            F.col("GTV_DAILY").alias("Total_Transactions_Sum__c"),
            F.col("NTR_DAILY").alias("Total_Revenue_Sum__c"),
            F.col("TRANSACTIONS_DATE").cast("string").alias("Transactions_Date__c"),
            F.struct(F.col("ACCOUNT_ID").alias("AccountID__c")).alias("Account__r"),
        ).alias("record")
    )
    if not ctx.var("full-refresh-salesforce", False):
        loaded = _already_pushed(ctx, "transactions_daily_load", "$.Duplicate_Key__c")
        rec = rec.join(
            loaded, rec["record.Duplicate_Key__c"] == loaded["_loaded"], "left_anti"
        )
    return rec


def contacts_load_builder(ctx):
    """contacts_load.sql:20-37: SFMC record (field names with spaces) +
    whole-record NOT-IN anti-join against sfmc logs."""
    con = ctx.ref("contacts")
    rec = con.select(
        F.to_json(
            F.struct(
                F.col("CONTACT_NUMBER").alias("ContactID"),
                F.col("FIRST_NAME").alias("First Name"),
                F.col("LAST_NAME").alias("Last Name"),
                F.col("EMAIL").alias("EmailAddress"),
                F.col("TITLE").alias("Title"),
            )
        ).alias("record")
    )
    if not ctx.var("full-refresh-marketing-cloud", False):
        logs = ctx.ref(tracking.SFMC_LOAD_TASK_LOGS)
        loaded = logs.filter(F.col("load_task_name") == "contacts_load").select(
            F.col("record").alias("_loaded")
        )
        rec = rec.join(loaded, rec["record"] == loaded["_loaded"], "left_anti")
    return rec


TRACKING_DEPENDS = [
    tracking.SFDC_LOAD_TASKS,
    tracking.SFDC_LOAD_TASK_LOGS,
    tracking.SFMC_LOAD_TASKS,
    tracking.SFMC_LOAD_TASK_LOGS,
]

SFMC_FIELDS = [
    {"field_name": "ContactID", "field_type": "Number", "is_primary_key": True},
    {"field_name": "First Name", "field_type": "Text"},
    {"field_name": "Last Name", "field_type": "Text"},
    {"field_name": "EmailAddress", "field_type": "EmailAddress", "is_required": True},
    {"field_name": "Title", "field_type": "Text"},
]


def build_engine(spark, root, sf_conn, mc_conn, vars=None) -> Engine:
    engine = Engine(spark, TableStore(root), vars=vars or {})
    accounts, contacts, transactions = seed_dataframes(spark)
    engine.seed("accounts", accounts)
    engine.seed("contacts", contacts)
    engine.seed("transactions", transactions)

    def tracking_model(name):
        return Model(
            name=name,
            builder=lambda ctx, n=name: spark.createDataFrame([], tracking.SCHEMAS[n]),
            config={"materialized": "tracking_table", "unique_key": "job_id"},
        )

    for t in TRACKING_DEPENDS:
        engine.register(tracking_model(t))

    engine.register(
        Model(
            "accounts_load",
            builder=accounts_load_builder("accounts_load"),
            config={
                "materialized": "omnata_push",
                "app": "salesforce",
                "operation": "bulk_load",
                "load_type": "upsert",
                "object_name": "Account",
                "external_id_field": "AccountID__c",
                "connector": sf_conn,
            },
            depends_on=["accounts", *TRACKING_DEPENDS],
        )
    )
    engine.register(
        Model(
            "accounts_load_legacy",
            builder=accounts_load_builder("accounts_load_legacy"),
            config={
                "materialized": "load_task",
                "operation": "upsert",
                "object_name": "Account",
                "external_id_field": "AccountID__c",
                "connector": sf_conn,
            },
            depends_on=["accounts", *TRACKING_DEPENDS],
        )
    )
    engine.register(
        Model(
            "transactions_daily",
            builder=transactions_daily_builder,
            config={"materialized": "incremental"},
            depends_on=["transactions"],
        )
    )
    engine.register(
        Model(
            "transactions_daily_load",
            builder=transactions_daily_load_builder,
            config={
                "materialized": "load_task",
                "operation": "upsert",
                "object_name": "Transaction__c",
                "external_id_field": "Duplicate_Key__c",
                "connector": sf_conn,
            },
            depends_on=["transactions_daily", "accounts", *TRACKING_DEPENDS],
        )
    )
    engine.register(
        Model(
            "contacts_load",
            builder=contacts_load_builder,
            config={
                "materialized": "omnata_push",
                "app": "marketing_cloud",
                "operation": "data_extension_upload",
                "import_type": "AddAndUpdate",
                "data_extension_name": "Contacts DE",
                "data_extension_fields": SFMC_FIELDS,
                "file_location_external_key": "ENHANCED_FTP",
                "connector": mc_conn,
            },
            depends_on=["contacts", *TRACKING_DEPENDS],
        )
    )
    return engine
