"""Scale-technique operators: salted aggregation, bucketed co-located
joins, compaction, custom stateful streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.compact import compact, n_files
from dbt_omnata_push_spark.ops.skew import salted_agg


def test_salted_agg_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r["event_type"]): (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s"))
        .collect()
    }
    salted = {
        (r["event_type"]): (r["n"], r["s"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {"n": ("count", F.count(F.lit(1))), "s": ("sum", F.sum("user_id"))},
        ).collect()
    }
    assert direct == salted


def test_compact_reduces_files(spark, tmp_path):
    store = TableStore(str(tmp_path))
    store.create(spark, "t", spark.range(0, 1000).repartition(8).toDF("k"))
    for _ in range(5):
        store.append(spark, "t", spark.range(0, 100).repartition(4).toDF("k"))
    before = n_files(store, "t")
    assert before >= 20
    after = compact(spark, store, "t")
    assert after == 1  # tiny table -> single target file
    assert store.read(spark, "t").count() == 1500


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both fact tables on the join key pre-shuffles them once
    at write time; the join then runs with NO Exchange on either side —
    the co-located join strategy for repeated large-fact joins at scale."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckets LOCATION '{tmp_path}'")
    # At test scale the planner would broadcast the small side (correct!);
    # disable broadcast so the plan shows the co-located SMJ that large
    # fact-fact joins get.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        load_table(spark, sf_dir, "orders").write.bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable("buckets.orders_b")
        load_table(spark, sf_dir, "lineitem").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("buckets.lineitem_b")
        joined = spark.table("buckets.orders_b").join(
            spark.table("buckets.lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS buckets.orders_b")
        spark.sql("DROP TABLE IF EXISTS buckets.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS buckets")


@pytest.mark.filterwarnings("ignore")
def test_stateful_user_profiles(spark, sf_dir):
    from dbt_omnata_push_spark.streaming.events import _events_stream, run_stream_once
    from dbt_omnata_push_spark.streaming.stateful import user_profile_stream

    out = run_stream_once(
        user_profile_stream(_events_stream(spark, sf_dir)), "t_profiles"
    )
    batch = load_table(spark, sf_dir, "events")
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {
        r["user_id"]: (r["n_events"], round(r["value_sum"], 6))
        for r in out.collect()
    }
    assert got == expected


def test_salted_join_matches_plain_join(spark, sf_dir):
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.ops.skew import salted_join
    from pyspark.sql import functions as F

    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = od.join(cu, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(od, cu, "o_custkey").groupBy("c_mktsegment").count()
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }

    # left join keeps unmatched big-side rows exactly once
    cu_half = cu.filter(F.col("o_custkey") % 2 == 0)
    plain_l = od.join(cu_half, "o_custkey", "left").count()
    salted_l = salted_join(od, cu_half, "o_custkey", how="left").count()
    assert plain_l == salted_l == od.count()


def test_partitioned_write_prunes_at_plan_time(spark, sf_dir, tmp_path):
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.ops.partitioning import (
        read_pruned,
        write_partitioned,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts").cast("string")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["day"])

    some_day = ev.select("day").first()["day"]
    pruned = read_pruned(spark, path, day=some_day)

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "isnotnull(day" in plan
    # pruned read touches exactly the one partition's rows
    expected = ev.filter(F.col("day") == some_day).count()
    assert pruned.count() == expected

    # small-file hygiene: each hive partition dir holds one data file
    import glob
    import os

    days = glob.glob(os.path.join(path, "day=*"))
    assert days
    for d in days:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d


def test_connected_components_deep_chain(spark):
    """A 12-node path graph needs multiple propagation rounds (diameter
    ~11) — guards the fused-init fast path against under-iterating on
    non-star graphs."""
    from dbt_omnata_push_spark.llmops.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)] + [(100, 101), (101, 102)],
        "doc_a long, doc_b long",
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert all(out[i] == 0 for i in range(12))
    assert all(out[i] == 100 for i in (100, 101, 102))


def test_connected_components_converges_without_max_iter_hit(spark):
    from dbt_omnata_push_spark.llmops.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (9, 3), (50, 60)], "doc_a long, doc_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 9: 1, 50: 50, 60: 50}


def test_connected_components_local_equals_distributed(spark):
    """r16: the size-gated driver-local CC path (numpy min-label +
    pointer jumping) must produce exactly the distributed rounds'
    fixpoint on a random mixed graph (chains, stars, singleton-free
    edges, string ids too)."""
    import random

    from dbt_omnata_push_spark.llmops.dedup import connected_components

    rng = random.Random(7)
    # chain depth stays under the distributed path's max_iter bound
    # (the local path is exact at any diameter)
    edges = [(i, i + 1) for i in range(0, 20)]  # one long chain
    edges += [(100, 100 + k) for k in range(1, 9)]  # star
    edges += [
        (rng.randrange(200, 260), rng.randrange(200, 260))
        for _ in range(80)
    ]  # random clumps (self-loops possible — both paths must agree)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(df, local_edge_limit=0).collect()
    }
    assert local == dist and len(local) > 0
    # string ids: sorted-rank mapping must match Spark's string min
    sdf = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("é", "z")],
        "doc_a string, doc_b string",
    )
    local_s = {
        (r["node"], r["component"])
        for r in connected_components(sdf).collect()
    }
    dist_s = {
        (r["node"], r["component"])
        for r in connected_components(sdf, local_edge_limit=0).collect()
    }
    assert local_s == dist_s


def test_pagerank_local_equals_distributed(spark):
    """r16: the size-gated driver-local PageRank (numpy int64) must be
    bit-identical to the distributed rounds — the recurrence is pure
    BIGINT arithmetic, so there is no tolerance, only equality."""
    import random

    from dbt_omnata_push_spark.llmops.dedup import pair_graph_pagerank

    rng = random.Random(3)
    edges = [(i, i + 1) for i in range(15)]
    edges += [(500, 500 + j) for j in range(1, 7)]
    edges += [
        (rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(60)
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = {
        (r["doc_id"], r["rank"])
        for r in pair_graph_pagerank(df, iters=3).collect()
    }
    import os as _os

    _os.environ["SPARK_GRAFT_CC_LOCAL_EDGES"] = "0"
    try:
        dist = {
            (r["doc_id"], r["rank"])
            for r in pair_graph_pagerank(df, iters=3).collect()
        }
    finally:
        del _os.environ["SPARK_GRAFT_CC_LOCAL_EDGES"]
    assert local == dist and len(local) > 0


def test_incremental_dedup_matches_full_rescan(spark, sf_dir):
    """The batch-vs-index path must find exactly the cross-split pairs a
    full-corpus near_duplicate_pairs run finds (same bands, same
    verification threshold)."""
    from dbt_omnata_push_spark.llmops import dedup as D

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0).repartition(8, "doc_id")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    index_sig = D.minhash_signatures(D.with_shingles(corpus), num_perm=8)
    inc = {
        (r["new_id"], r["corpus_id"]): round(r["jaccard"], 9)
        for r in D.incremental_dedup_against_index(index_sig, batch).collect()
    }
    full = D.near_duplicate_pairs(docs, threshold=0.3).collect()
    cross = {}
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if (a % 5 == 0) != (b % 5 == 0):
            new_id, corpus_id = (a, b) if a % 5 == 0 else (b, a)
            cross[(new_id, corpus_id)] = round(r["jaccard"], 9)
    assert inc == cross
    assert inc, "cross-split near-dup set must be non-empty to mean anything"


def test_incremental_dedup_never_shuffle_joins_corpus(spark, sf_dir):
    """Every join in the incremental path must be a BroadcastHashJoin
    with the batch-derived side broadcast — a SortMergeJoin or shuffled
    hash join would co-shuffle the (100 TB) corpus index."""
    from dbt_omnata_push_spark.llmops import dedup as D

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    index_sig = D.minhash_signatures(
        D.with_shingles(docs.filter(F.col("doc_id") % 5 != 0)), num_perm=8
    )
    out = D.incremental_dedup_against_index(
        index_sig, docs.filter(F.col("doc_id") % 5 == 0)
    )
    out.collect()  # let AQE finalize the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_pagerank_integer_recurrence_exact(spark):
    """Hand-computed 3-node path graph a-b-c: after one iteration the
    integer recurrence gives endpoints 150000 + (85 * 500000) div 100
    and the hub 150000 + (85 * 2000000) div 100."""
    from dbt_omnata_push_spark.llmops.dedup import pair_graph_pagerank

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    one = {r["doc_id"]: r["rank"] for r in pair_graph_pagerank(pairs, iters=1).collect()}
    assert one == {1: 575000, 2: 1850000, 3: 575000}
    # Ranks redistribute but total mass stays within damping bounds.
    three = {r["doc_id"]: r["rank"] for r in pair_graph_pagerank(pairs, iters=3).collect()}
    assert set(three) == {1, 2, 3}
    assert three[2] > three[1] == three[3]


def test_pagerank_empty_pairs(spark):
    from dbt_omnata_push_spark.llmops.dedup import pair_graph_pagerank

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert pair_graph_pagerank(pairs, iters=2).count() == 0


def test_token_budget_smaller_than_any_doc(spark):
    from dbt_omnata_push_spark.llmops.budget import token_budget_cap

    docs = spark.createDataFrame(
        [(1, "s", "a b c d e"), (2, "s", "f g h")], "doc_id long, source string, text string"
    )
    # budget 2 < every doc's token count -> nothing fits.
    assert token_budget_cap(docs, budget=2, key_col="source").count() == 0


def test_quantize_binds_amax_once_per_row(spark):
    """HOF-lambda re-eval guard for quantize_int8 (ADVICE r4): amax must
    be bound as a lambda-variable struct field, evaluated once per row —
    not re-derived per element / per output column. One array_max-over-
    transform binding in the optimized plan, behind a Generate that
    blocks CollapseProject from re-inlining the summary struct."""
    from dbt_omnata_push_spark.llmops.embeddings import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.1, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    plan = quantize_int8(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("array_max(transform(") == 1, plan[:600]
    assert "Generate" in plan


def test_pagerank_convergence_stops_by_graph_shape(spark):
    """Observation-based rank-delta stop (judge r4 #6): a regular
    triangle starts AT the stationary distribution (uniform rank is the
    fixpoint for a 2-regular graph) and stops after one verification
    round, while a star's bipartite oscillation needs tens of rounds —
    the converged variant adapts the iteration count to the graph
    instead of a caller guess, and its final ranks are bit-identical to
    the fixed-iter recurrence run for the same number of rounds."""
    from dbt_omnata_push_spark.llmops.dedup import (
        pair_graph_pagerank,
        pair_graph_pagerank_converged,
    )

    triangle = [(0, 1), (1, 2), (0, 2)]
    star = [(10, 10 + i) for i in range(1, 7)]
    mk = lambda pairs: spark.createDataFrame(pairs, "doc_a long, doc_b long")

    tri_df, tri_rounds = pair_graph_pagerank_converged(mk(triangle), max_iter=80)
    star_df, star_rounds = pair_graph_pagerank_converged(mk(star), max_iter=80)
    assert tri_rounds == 1  # uniform rank is already the 2-regular fixpoint
    assert tri_rounds < star_rounds < 80

    # converged result == fixed-iter oracle recurrence at the same count
    fixed = pair_graph_pagerank(mk(star), iters=star_rounds)
    conv = {r.doc_id: r.rank for r in star_df.collect()}
    assert conv == {r.doc_id: r.rank for r in fixed.collect()}


def test_pagerank_convergence_empty_graph(spark):
    from dbt_omnata_push_spark.llmops.dedup import pair_graph_pagerank_converged

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    df, rounds = pair_graph_pagerank_converged(empty, max_iter=10)
    assert df.count() == 0 and rounds == 1
