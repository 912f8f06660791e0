#!/usr/bin/env python
"""Generate the pinned extraction goldens the DuckDB oracle reads.

The driver's correctness gate can only hash SQL-expressible results, so
the extraction family (regex/layout kernels) was rows-only in round 1.
This script closes that: it runs the PURE-PYTHON kernel (no Spark) over
the same documents->transcripts wrap the driver queries use, and pins
per-turn and per-chunk md5 checksums to parquet under tests/golden/.
The `extract_text_md5` / `extract_chunks_md5` oracle SQL then reads
these files with read_parquet(), giving the driver a hard value-hash
check of the distributed pipeline against an independently generated
(single-process, straight-line) artifact.

The kernel itself is verified against the reference's per-page logic by
the tests/test_kernels_* suites; this golden pins that behavior across
rounds and proves Spark's distribution layer reproduces it exactly.

Usage: python scripts/make_goldens.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 (the driver's correctness sf).
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections import defaultdict

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.kernels.chunker import build_chunks_for_turn  # noqa: E402
from pdf_parser_spark.kernels.extract import extract_turn  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)
CONVS = 50  # mirrors pipeline.transcripts_from_documents default


def _wrap_rows(sf_dir: str):
    """Mirror transcripts_from_documents: conv = doc_id % CONVS,
    turn_idx = row_number over (conv ordered by doc_id) - 1."""
    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).df()
    counters: dict[int, int] = defaultdict(int)
    for doc_id, text in zip(df["doc_id"], df["text"]):
        conv = int(doc_id) % CONVS
        turn = counters[conv]
        counters[conv] += 1
        yield f"conv_{conv:06d}", turn, text


def make(sf_dir: str) -> None:
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    turn_rows = {"conv_id": [], "turn_idx": [], "text_md5": []}
    chunk_rows = {"chunk_id": [], "text_md5": []}
    for conv_id, turn_idx, text in _wrap_rows(sf_dir):
        res = extract_turn(text, turn_idx, "")
        turn_rows["conv_id"].append(conv_id)
        turn_rows["turn_idx"].append(turn_idx)
        turn_rows["text_md5"].append(
            hashlib.md5(res["extracted_text"].encode("utf-8")).hexdigest()
        )
        for ch in build_chunks_for_turn(conv_id, turn_idx, res["blocks"]):
            chunk_rows["chunk_id"].append(ch["chunk_id"])
            chunk_rows["text_md5"].append(
                hashlib.md5(ch["text"].encode("utf-8")).hexdigest()
            )

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    turns = pa.table(
        {
            "conv_id": pa.array(turn_rows["conv_id"], pa.string()),
            "turn_idx": pa.array(turn_rows["turn_idx"], pa.int32()),
            "text_md5": pa.array(turn_rows["text_md5"], pa.string()),
        }
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    pq.write_table(turns, os.path.join(GOLDEN_DIR, f"extract_md5_{sf_name}.parquet"))
    chunks = pa.table(
        {
            "chunk_id": pa.array(chunk_rows["chunk_id"], pa.string()),
            "text_md5": pa.array(chunk_rows["text_md5"], pa.string()),
        }
    ).sort_by([("chunk_id", "ascending")])
    pq.write_table(chunks, os.path.join(GOLDEN_DIR, f"chunks_md5_{sf_name}.parquet"))
    print(f"{sf_name}: {turns.num_rows} turn checksums, {chunks.num_rows} chunk checksums")


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    for d in dirs:
        make(d)
