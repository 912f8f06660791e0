#!/usr/bin/env python
"""One-shot mirror of the driver's correctness gate at ITS sf (0.01).

Runs every queries() entry on Spark and its oracle on DuckDB over the
same parquet, compares row count / column names / sorted values, prints
one line per query. Use before a round ends to preempt CORRECTNESS
failures that only appear at the driver's scale (tests/test_queries_
contract.py runs the same comparison at sf0.001 for speed).

Usage: python scripts/mirror_gate.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pdf_parser_spark.pipeline import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: spark_rows={len(spark_pdf)}")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
        problems = []
        if list(a.columns) != list(b.columns):
            problems.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            problems.append(f"rows {len(a)} vs {len(b)}")
        else:
            for c in a.columns:
                ka = "f" if a[c].dtype.kind == "f" else ("i" if a[c].dtype.kind in "iu" else "o")
                kb = "f" if b[c].dtype.kind == "f" else ("i" if b[c].dtype.kind in "iu" else "o")
                if ka != kb:
                    problems.append(f"dtype kind {c}: {a[c].dtype} vs {b[c].dtype}")
            if not problems:
                try:
                    pd.testing.assert_frame_equal(
                        a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
                    )
                except AssertionError as e:
                    problems.append(str(e).splitlines()[0])
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok   {name}: rows={len(a)}")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
