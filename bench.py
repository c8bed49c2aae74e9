#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is end-to-end per query (plan + execute + collect), after a one-query
JVM warmup. Queries cover every operator family: scan, joins, aggs, windows,
top-k, set ops, text, dedup (exact + MinHash LSH), vectors, and the Pandas
UDF path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadrodb_spark.queries import QUERIES
from hadrodb_spark.session import get_spark

HEADLINE = [
    "sql_tpch_q1_like",
    "scan_lineitem",
    "join_inner",
    "join_multiway",
    "agg_groupby",
    "agg_distinct",
    "window_running_sum",
    "topk_per_group",
    "setop_except",
    "scalar_json_props",
    "text_stats",
    "dedup_exact",
    "dedup_near",
    "vector_topk",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hadrodb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches + Python UDF worker pool (so the
    # pandas-path queries measure compute, not interpreter spawn)
    QUERIES["scan_lineitem"](spark, sf_dir).count()
    import pandas as _pd

    spark.range(8).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best, n = float("inf"), 0
        for _ in range(2):  # best-of-2: damps machine-load noise
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
