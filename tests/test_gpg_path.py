"""Encrypted SFMC upload path (reference GPG UDTF chain redesigned as
per-batch encryption, SURVEY.md §2.1 D8) + gpg op units."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.connectors import MockMarketingCloudConnector
from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations import tracking
from dbt_omnata_push_spark.ops.gpg import (
    encrypt_batch,
    gpg_session_params,
    json_records_to_csv,
)


def test_session_params_deterministic():
    a = gpg_session_params("PUBKEY")
    assert a == gpg_session_params("PUBKEY")
    assert a["key_id"] != gpg_session_params("OTHER")["key_id"]


def test_json_to_csv():
    csv_text = json_records_to_csv(
        [(1, '{"b": 2, "a": "x"}'), (2, '{"b": 3, "a": "y,z"}')]
    )
    lines = csv_text.strip().split("\n")
    assert lines[0] == "row_number,a,b"
    assert lines[1] == "1,x,2"
    assert lines[2] == '2,"y,z",3'


def test_encrypt_batch_stub_roundtrip():
    session = gpg_session_params("PUBKEY")
    msg = encrypt_batch(session, "hello,world")
    assert msg.startswith("-----BEGIN PGP MESSAGE-----")
    assert "STUB" in msg  # clearly marked stand-in
    body = "".join(
        line
        for line in msg.splitlines()
        if line and not line.startswith(("-----", "KeyID:"))
    )
    assert base64.b64decode(body).decode() == "hello,world"


class CapturingMC(MockMarketingCloudConnector):
    """applyInPandas runs in Python worker subprocesses, so in-memory
    capture never reaches the driver; write each staged payload to the
    shared filesystem instead (one file per call, uuid-named)."""

    def __init__(self, capture_dir: str):
        super().__init__()
        self.capture_dir = capture_dir

    def stage_batch(self, rows):
        import json as _json
        import uuid as _uuid

        with open(f"{self.capture_dir}/{_uuid.uuid4().hex}.json", "w") as f:
            _json.dump(rows, f)
        return super().stage_batch(rows)

    def payloads(self):
        import glob
        import json as _json

        return [
            _json.load(open(p)) for p in glob.glob(f"{self.capture_dir}/*.json")
        ]


@pytest.fixture(scope="module")
def encrypted_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gpg_store"))
    mc = CapturingMC(str(tmp_path_factory.mktemp("staged")))
    engine = Engine(spark, TableStore(root))
    engine.seed(
        "contacts_small",
        spark.createDataFrame(
            [(i, f"user{i}@example.com") for i in range(250)],
            "CONTACT_NUMBER int, EMAIL string",
        ),
    )
    engine.register(
        Model(
            "contacts_encrypted_load",
            builder=lambda ctx: ctx.ref("contacts_small").select(
                F.to_json(
                    F.struct(
                        F.col("CONTACT_NUMBER").alias("ContactID"),
                        F.col("EMAIL").alias("EmailAddress"),
                    )
                ).alias("record")
            ),
            config={
                "materialized": "omnata_push",
                "app": "marketing_cloud",
                "operation": "data_extension_upload",
                "data_extension_name": "Enc DE",
                "encrypted": True,
                "gpg_public_key": "TESTKEY",
                "connector": mc,
            },
            depends_on=["contacts_small"],
        )
    )
    results = engine.run(["contacts_encrypted_load"])
    return engine, results, mc


def test_encrypted_run_succeeds(encrypted_engine):
    engine, results, _ = encrypted_engine
    assert results["contacts_encrypted_load"].status == "success"
    assert results["contacts_encrypted_load"].rows_affected == 250


def test_encrypted_logs_per_original_row(encrypted_engine):
    """Results keyed by original row (upload.sql:105-119 semantics)."""
    engine, _, _ = encrypted_engine
    logs = engine.store.read(engine.spark, tracking.SFMC_LOAD_TASK_LOGS)
    mine = logs.filter(F.col("load_task_name") == "contacts_encrypted_load")
    assert mine.count() == 250
    assert mine.select("job_log_entry_id").distinct().count() == 250
    assert (
        mine.filter(F.get_json_object("result", "$.success") != "true").count() == 0
    )


def test_encrypted_payloads_are_armored_batches(encrypted_engine):
    """Each staged payload is one armored message per batch of 100."""
    _, _, mc = encrypted_engine
    payloads = mc.payloads()
    assert len(payloads) == 3  # 250 rows -> batches of 100/100/50
    for rows in payloads:
        assert len(rows) == 1  # [batch_first_idx, armored_payload]
        assert rows[0][1].startswith("-----BEGIN PGP MESSAGE-----")
