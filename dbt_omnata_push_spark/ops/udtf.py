"""Python UDTFs: the reference's table-function surface, natively.

The reference's encrypted SFMC path laterally joins scalar rows to
``table(JSON_TO_CSV(row_number::double, record::variant))``
(marketing_cloud_data_extension_upload.sql:93) — a UDTF turning one
JSON record row into one CSV row. The engine's production path does
this conversion with built-in expressions (ops/gpg.py), but Spark 3.5+
Python UDTFs reproduce the *form* too, so reference SQL that laterally
joins a table function has a literal equivalent.

UDTFs run row-at-a-time in Python — keep them off hot paths (the
vectorized to_csv/struct expressions are ~10-100x faster); they exist
for surface parity and for genuinely row-generative logic.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="row_number double, csv string")
class JsonToCsv:
    """JSON record -> CSV line (values in key order), with row id.

    Mirrors the JSON_TO_CSV external table function's contract: one
    input row -> one (row_number, csv) output row; quoting per RFC4180
    for values containing commas/quotes/newlines.
    """

    def eval(self, row_number: float, record: str):  # noqa: D102
        obj = json.loads(record)
        vals = []
        for key in obj:
            v = obj[key]
            s = "" if v is None else str(v)
            if any(c in s for c in ',"\n'):
                s = '"' + s.replace('"', '""') + '"'
            vals.append(s)
        yield row_number, ",".join(vals)


def register_udtfs(spark) -> None:
    """Register engine UDTFs for SQL use (lateral join syntax)."""
    spark.udtf.register("json_to_csv", JsonToCsv)
