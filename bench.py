#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "turns_per_sec": ..., ...}

The headline is the flagship extraction job (the north-rule hot path:
salted repartition -> Arrow kernel -> ordering window) measured as
turns/sec, plus the relational surface (TPC-H shapes, dedup, windows).
Each query is forced with a cheap count/collect so the measured time is
plan execution, not driver materialization of wide rows.

Scaling-efficiency evidence (north rule: >=0.8 between N and 4N
executors, sandbox analogue local[8] vs local[32]) is produced by
``python bench.py --scaling`` and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pdf_parser_spark.dataops import DATAOPS_QUERIES
from pdf_parser_spark.pipeline import (
    extract_turns,
    get_spark,
    run_metrics,
    transcripts_from_documents,
)
from pdf_parser_spark.queries import QUERIES as _RELATIONAL_QUERIES

QUERIES = {**_RELATIONAL_QUERIES, **DATAOPS_QUERIES}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# relational queries worth timing at sf0.1 (all of QUERIES is cheap
# enough; keep the list explicit so bench stays stable across rounds)
BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "r1_dedup_hash",
    "r9_enrichment_join",
    "window_running_total",
    "sessionize_events",
    "minhash_near_dup",
    "simhash_dedup",
    "ngram_jaccard_dup",
    "ann_cosine_topk",
    "text_quality",
    "lang_id",
]


def _time_query(fn, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    return time.perf_counter() - t0, n


def run_bench(spark, sf_dir: str) -> dict:
    timings: dict[str, float] = {}

    # headline: extraction hot path over every document at this sf
    t0 = time.perf_counter()
    transcripts = transcripts_from_documents(spark, sf_dir, convs=200)
    extracted = extract_turns(transcripts)
    metrics_row = run_metrics(extracted).collect()[0].asDict()
    extract_sec = time.perf_counter() - t0
    timings["extract_turns"] = round(extract_sec, 3)
    turns = int(metrics_row["turns_parsed"])

    for name in BENCH_QUERIES:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        sec, _ = _time_query(fn, spark, sf_dir)
        timings[name] = round(sec, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns_parsed": turns,
        "turns_per_sec": round(turns / extract_sec, 1) if extract_sec > 0 else 0.0,
        "spans_emitted": int(metrics_row["spans_emitted"]),
        "cores": spark.sparkContext.defaultParallelism,
    }


def run_scaling(sf_dir: str) -> dict:
    """Same extraction job at two parallelism levels (N=8, 4N=32 local
    cores) on the same input; reports throughput at both + efficiency."""
    out = {}
    for cores in (8, 32):
        spark = get_spark(f"bench_scaling_{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores)
        try:
            # warm the JVM/Arrow path once, then measure
            transcripts = transcripts_from_documents(spark, sf_dir, convs=200)
            extract_turns(transcripts).count()
            t0 = time.perf_counter()
            extracted = extract_turns(transcripts)
            turns = int(run_metrics(extracted).collect()[0]["turns_parsed"])
            sec = time.perf_counter() - t0
            out[f"local[{cores}]"] = {
                "sec": round(sec, 3),
                "turns_per_sec": round(turns / sec, 1),
                "turns_per_sec_per_core": round(turns / sec / cores, 2),
            }
        finally:
            spark.stop()
    tps8 = out["local[8]"]["turns_per_sec"]
    tps32 = out["local[32]"]["turns_per_sec"]
    # efficiency = realized speedup / ideal speedup (4x)
    out["scaling_efficiency"] = round((tps32 / tps8) / 4.0, 3)
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
        return
    spark = get_spark("bench")
    try:
        print(json.dumps(run_bench(spark, SF_DIR)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
