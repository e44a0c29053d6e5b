"""Python UDTF surface: the reference's table(JSON_TO_CSV(...)) lateral
join shape runs literally (reference: marketing_cloud_data_extension_
upload.sql:93)."""

from __future__ import annotations

import json

from dbt_omnata_push_spark.ops.udtf import register_udtfs


def test_json_to_csv_lateral_join(spark):
    register_udtfs(spark)
    rows = [
        (1.0, json.dumps({"name": "Acme", "id": "a1"})),
        (2.0, json.dumps({"name": "B, C", "id": 'b"2'})),
        (3.0, json.dumps({"name": None, "id": "n1"})),
    ]
    spark.createDataFrame(rows, "rn double, record string").createOrReplaceTempView(
        "records_in"
    )
    out = spark.sql(
        """
        SELECT f.row_number, f.csv
        FROM records_in,
        LATERAL json_to_csv(rn, record) f
        ORDER BY f.row_number
        """
    ).collect()
    assert [r["csv"] for r in out] == ['Acme,a1', '"B, C","b""2"', ",n1"]
    assert [r["row_number"] for r in out] == [1.0, 2.0, 3.0]
