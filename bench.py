"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "staging_batches",
    "events_hourly",
    "events_sessionized",
    "events_json_extract",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_components",
    "text_stats",
    "text_tfidf_top_terms",
    "corpus_prep_pipeline",
    "similarity_topk_bruteforce",
    "events_asof_last_error",
    "events_range_join_error_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from dbt_omnata_push_spark.engine.session import get_spark
    from dbt_omnata_push_spark.queries import load_all

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    registry = load_all()

    # Warm up the JVM/codegen path once (not counted).
    registry["pricing_summary"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
