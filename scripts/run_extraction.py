#!/usr/bin/env python
"""spark-submit entry for the extraction job (north rule: launched via
``spark-submit --py-files``).

Local dev:
    python scripts/run_extraction.py --convs 50 --out /tmp/run_out --cpus 4

Cluster shape (package zipped as py-files; session config comes from
spark-submit, so get_spark's master/config is only a local fallback):
    zip -r /tmp/pps.zip pdf_parser_spark
    spark-submit --py-files /tmp/pps.zip scripts/run_extraction.py \
        --source synth --convs 1000 --out /out/extracted --buckets 64

Resume after a failure: re-run the same command — completed buckets are
skipped via the lineage table under <out>/_lineage.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")  # repo-root invocation; py-files covers cluster

from pdf_parser_spark.pipeline import (  # noqa: E402
    get_spark,
    synth_transcripts_df,
    transcripts_from_documents,
)
from pdf_parser_spark.runner import run_extraction, summarize  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=["synth", "documents"], default="synth")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--convs", type=int, default=50)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--salt-buckets", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = get_spark("run_extraction", master=master,
                      shuffle_partitions=args.cpus)
    try:
        if args.source == "synth":
            transcripts = synth_transcripts_df(spark, n_convs=args.convs)
        else:
            transcripts = transcripts_from_documents(
                spark, args.sf_dir, convs=args.convs
            )
        summary = run_extraction(
            spark,
            transcripts,
            args.out,
            n_buckets=args.buckets,
            salt_buckets=args.salt_buckets,
        )
        print(summarize(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
