"""Empty-input robustness for the round-5 operators: a 100 TB pipeline
hits empty partitions/filters constantly; no operator may throw or
return a malformed frame on zero rows."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_block_dedup_empty(spark):
    from dbt_omnata_push_spark.llmops.dedup import block_dedup_rebuild

    out = block_dedup_rebuild(_empty_docs(spark))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_blocks", "n_kept", "rebuilt_text",
    ]


def test_fuzzy_pairs_empty_and_singleton(spark):
    from dbt_omnata_push_spark.ops.fuzzyjoin import fuzzy_self_pairs

    empty = spark.createDataFrame([], "id long, s string")
    assert fuzzy_self_pairs(empty, "id", "s").count() == 0
    single = spark.createDataFrame([(1, "abc")], "id long, s string")
    assert fuzzy_self_pairs(single, "id", "s").count() == 0


def test_bpe_empty_vocab(spark):
    from dbt_omnata_push_spark.llmops.bpe import bpe_train

    words = spark.createDataFrame([], "word string, freq long")
    assert bpe_train(words, n_merges=3) == []


def test_bloom_empty_corpus_admits_everything(spark):
    from dbt_omnata_push_spark.llmops.dedup import bloom_gated_new_rows

    corpus = spark.createDataFrame([], "h string")
    batch = spark.range(5).select(
        F.col("id").alias("row_id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    assert bloom_gated_new_rows(batch, corpus, "h").count() == 5


def test_semantic_dedup_empty(spark):
    from dbt_omnata_push_spark.llmops.similarity import semantic_dedup_flags

    emb = spark.createDataFrame([], "vec_id long, label int, embedding array<float>")
    assert semantic_dedup_flags(emb).count() == 0


def test_ivm_empty_changes_and_empty_agg(spark):
    from dbt_omnata_push_spark.ops.ivm import apply_cdc, build_agg

    agg = build_agg(
        spark.createDataFrame([(1, "a", 5)], "k long, grp string, v long"),
        ["grp"],
        ["v"],
    )
    no_changes = spark.createDataFrame(
        [], "k long, grp string, v long, change_type string"
    )
    out = {(r["grp"], r["n_rows"], r["sum_v"])
           for r in apply_cdc(agg, no_changes, ["grp"], ["v"]).collect()}
    assert out == {("a", 1, 5)}
    # empty aggregate + pure-insert feed bootstraps the view
    empty_agg = build_agg(
        spark.createDataFrame([], "k long, grp string, v long"), ["grp"], ["v"]
    )
    inserts = spark.createDataFrame(
        [(1, "x", 3, "insert")], "k long, grp string, v long, change_type string"
    )
    out = {(r["grp"], r["n_rows"], r["sum_v"])
           for r in apply_cdc(empty_agg, inserts, ["grp"], ["v"]).collect()}
    assert out == {("x", 1, 3)}


def test_zvalue_three_columns(spark):
    import duckdb

    from dbt_omnata_push_spark.ops.zorder import bucket16, bucket16_sql, zvalue, zvalue_sql

    # 3-way interleave: bit i of col j lands at position 3i + j
    df = spark.createDataFrame([(1, 1, 1)], "a long, b long, c long")
    got = df.select(
        zvalue([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z")
    ).collect()[0]["z"]
    assert got == 0b111
    rows = [(i * 7 % 50, i * 11 % 50, i * 13 % 50) for i in range(60)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    spark_z = sorted(
        r["z"]
        for r in df.select(
            zvalue([bucket16(F.col(c)) for c in ("a", "b", "c")]).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b},{c})" for a, b, c in rows)
        + ") v(a,b,c)"
    )
    zsql = zvalue_sql([bucket16_sql(c) for c in ("a", "b", "c")])
    duck_z = sorted(r[0] for r in con.execute(f"SELECT {zsql} FROM t").fetchall())
    assert spark_z == duck_z


def test_bloom_gate_keeps_null_key_rows(spark):
    """Anti-join semantics: a NULL key matches nothing in the corpus,
    so the row must SURVIVE the gate (review finding: the verdict
    equi-join silently dropped it)."""
    from dbt_omnata_push_spark.llmops.dedup import bloom_gated_new_rows

    corpus = spark.createDataFrame([("k1",)], "h string")
    batch = spark.createDataFrame(
        [(1, "k1"), (2, "k2"), (3, None)], "row_id long, h string"
    )
    got = {r["row_id"] for r in bloom_gated_new_rows(batch, corpus, "h").collect()}
    assert got == {2, 3}


def test_ivm_null_group_key_merges(spark):
    """Null-safe group join: a NULL-key group in both the aggregate and
    the delta feed must fold into ONE row (review finding: plain join
    split it into two)."""
    from dbt_omnata_push_spark.ops.ivm import apply_cdc, build_agg

    agg = build_agg(
        spark.createDataFrame(
            [(1, None, 5), (2, "a", 7)], "k long, grp string, v long"
        ),
        ["grp"],
        ["v"],
    )
    changes = spark.createDataFrame(
        [(3, None, 2, "insert")], "k long, grp string, v long, change_type string"
    )
    out = {(r["grp"], r["n_rows"], r["sum_v"])
           for r in apply_cdc(agg, changes, ["grp"], ["v"]).collect()}
    assert out == {(None, 2, 7), ("a", 1, 7)}


def test_zvalue_rejects_over_64_bits(spark):
    import pytest

    from dbt_omnata_push_spark.ops.zorder import zvalue, zvalue_sql

    with pytest.raises(ValueError, match="64-bit"):
        zvalue([F.lit(1)] * 5, bits=16)
    with pytest.raises(ValueError, match="64-bit"):
        zvalue_sql(["a"] * 5, bits=16)


def test_avi_top_down_height_not_flipped():
    """A negative strf height marks top-down row order: frames must NOT
    be reversed on decode (review finding: they were flipped)."""
    import struct

    from dbt_omnata_push_spark.llmops.codecs import decode_avi, encode_avi

    # two-row frame with distinct rows, written bottom-up by encode_avi
    top = [(255, 0, 0)]
    bottom = [(0, 0, 255)]
    data = bytearray(encode_avi(1, 2, [[top, bottom]], fps=1))
    # find the strf BITMAPINFO height field and negate it; the pixel
    # data (bottom-up order: 'bottom' row first) is left as-is, so a
    # top-down reader must now yield rows in on-disk order.
    i = data.index(b"strf")
    h_off = i + 8 + 8  # fourcc + size + (hdr_size, width)
    (h,) = struct.unpack_from("<i", data, h_off)
    struct.pack_into("<i", data, h_off, -h)
    vid = decode_avi(bytes(data))
    # on-disk row 0 was 'bottom' (encode wrote bottom-up); top-down
    # decode returns it first, unflipped
    assert vid["frames"][0][0] == bottom
    assert vid["frames"][0][1] == top
