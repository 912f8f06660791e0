#!/usr/bin/env python
"""Generate the pinned extraction goldens the DuckDB oracle reads.

The driver's correctness gate can only hash SQL-expressible results, so
the extraction family (regex/layout kernels) was rows-only in round 1.
This script closes that: it runs the PURE-PYTHON kernel (no Spark) over
the same documents->transcripts wrap the driver queries use, and pins
the FULL per-turn table and per-chunk table to parquet under
tests/golden/. The extraction-family oracle SQL then reads these files
with read_parquet() (directly, or aggregated for the metrics/gapfill
queries), giving the driver hard value-hash checks of the distributed
pipeline against an independently generated (single-process,
straight-line) artifact.

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
from pdf_parser_spark.kernels.overlay import overlay_lines  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)
CONVS = 50  # mirrors pipeline.transcripts_from_documents default
ROLES = ["user", "assistant", "tool"]


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
    turn_rows: dict[str, list] = defaultdict(list)
    chunk_rows: dict[str, list] = defaultdict(list)
    for conv_id, turn_idx, text in _wrap_rows(sf_dir):
        res = extract_turn(text, turn_idx, "")
        t = turn_rows
        t["conv_id"].append(conv_id)
        t["turn_idx"].append(turn_idx)
        # the wrap's turn_idx is dense by construction -> turn_seq = idx+1
        t["turn_seq"].append(turn_idx + 1)
        t["role"].append(ROLES[turn_idx % 3])
        t["source"].append(res["source"])
        t["payload_type"].append(res["payload_type"])
        t["is_fallback"].append(res["is_fallback"])
        t["n_blocks"].append(len(res["blocks"]))
        t["n_tables"].append(sum(1 for b in res["blocks"] if b["type"] == "table"))
        t["n_spans"].append(len(res["spans"]))
        t["n_chars"].append(len(res["extracted_text"]))
        t["extracted_text"].append(res["extracted_text"])
        t["text_md5"].append(
            hashlib.md5(res["extracted_text"].encode("utf-8")).hexdigest()
        )
        # span-offset digest: the north-rule per-turn contract is text
        # AND span offsets; canonical rendering "block_id:start:end"
        # joined by ';' (empty span list -> md5("")), reproduced
        # Spark-side with transform+concat_ws (no Python UDF)
        t["spans_md5"].append(
            hashlib.md5(
                ";".join(
                    f"{s['block_id']}:{s['start']}:{s['end']}" for s in res["spans"]
                ).encode("utf-8")
            ).hexdigest()
        )
        # S4 overlay digest: positioned-text layer (kernels/overlay.py)
        # rendered as "block_id:line_no:text" — geometry itself is
        # pinned by the kernel-vs-Spark equality test; the digest makes
        # the route choices + line splitting driver-checkable
        ov = overlay_lines(res["blocks"])
        t["n_overlay_lines"].append(len(ov))
        t["overlay_md5"].append(
            hashlib.md5(
                ";".join(
                    f"{l['block_id']}:{l['line_no']}:{l['text']}" for l in ov
                ).encode("utf-8")
            ).hexdigest()
        )
        for ch in build_chunks_for_turn(conv_id, turn_idx, res["blocks"]):
            for k in (
                "chunk_id",
                "document_id",
                "source_file",
                "page_number",
                "block_id",
                "block_type",
                "text",
            ):
                chunk_rows[k].append(ch[k])
            chunk_rows["confidence"].append(float(ch["confidence"]))
            chunk_rows["text_md5"].append(
                hashlib.md5(ch["text"].encode("utf-8")).hexdigest()
            )

    # --- SFT pair golden (dataops.q_sft_pairs): straight-line replay
    # of the conversation wrap with a last-4 "role: text" context
    # window (4 mirrors dataops.SFT_CONTEXT_TURNS); per assistant turn
    # with context, pin md5(context), md5(response), context size ---
    sft_rows: dict[str, list] = defaultdict(list)
    ctxs: dict[str, list] = defaultdict(list)
    for conv_id, turn_idx, text in _wrap_rows(sf_dir):
        role = ROLES[turn_idx % 3]
        ctx = ctxs[conv_id]
        if role == "assistant" and ctx:
            joined = "\n".join(ctx)
            sft_rows["conv_id"].append(conv_id)
            sft_rows["turn_idx"].append(turn_idx)
            sft_rows["context_md5"].append(
                hashlib.md5(joined.encode("utf-8")).hexdigest()
            )
            sft_rows["response_md5"].append(
                hashlib.md5(text.encode("utf-8")).hexdigest()
            )
            sft_rows["n_context_turns"].append(len(ctx))
        ctx.append(f"{role}: {text}")
        if len(ctx) > 4:
            del ctx[:-4]

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    i32 = pa.int32()
    turns = pa.table(
        {
            "conv_id": pa.array(turn_rows["conv_id"], pa.string()),
            "turn_idx": pa.array(turn_rows["turn_idx"], i32),
            "turn_seq": pa.array(turn_rows["turn_seq"], i32),
            "role": pa.array(turn_rows["role"], pa.string()),
            "source": pa.array(turn_rows["source"], pa.string()),
            "payload_type": pa.array(turn_rows["payload_type"], pa.string()),
            "is_fallback": pa.array(turn_rows["is_fallback"], pa.bool_()),
            "n_blocks": pa.array(turn_rows["n_blocks"], i32),
            "n_tables": pa.array(turn_rows["n_tables"], i32),
            "n_spans": pa.array(turn_rows["n_spans"], i32),
            "n_chars": pa.array(turn_rows["n_chars"], i32),
            "extracted_text": pa.array(turn_rows["extracted_text"], pa.string()),
            "text_md5": pa.array(turn_rows["text_md5"], pa.string()),
            "spans_md5": pa.array(turn_rows["spans_md5"], pa.string()),
            "n_overlay_lines": pa.array(turn_rows["n_overlay_lines"], i32),
            "overlay_md5": pa.array(turn_rows["overlay_md5"], pa.string()),
        }
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    pq.write_table(turns, os.path.join(GOLDEN_DIR, f"extract_md5_{sf_name}.parquet"))
    chunks = pa.table(
        {
            "chunk_id": pa.array(chunk_rows["chunk_id"], pa.string()),
            "document_id": pa.array(chunk_rows["document_id"], pa.string()),
            "source_file": pa.array(chunk_rows["source_file"], pa.string()),
            "page_number": pa.array(chunk_rows["page_number"], i32),
            "block_id": pa.array(chunk_rows["block_id"], pa.string()),
            "block_type": pa.array(chunk_rows["block_type"], pa.string()),
            "text": pa.array(chunk_rows["text"], pa.string()),
            "confidence": pa.array(chunk_rows["confidence"], pa.float64()),
            "text_md5": pa.array(chunk_rows["text_md5"], pa.string()),
        }
    ).sort_by([("chunk_id", "ascending")])
    pq.write_table(chunks, os.path.join(GOLDEN_DIR, f"chunks_md5_{sf_name}.parquet"))
    sft = pa.table(
        {
            "conv_id": pa.array(sft_rows["conv_id"], pa.string()),
            "turn_idx": pa.array(sft_rows["turn_idx"], i32),
            "context_md5": pa.array(sft_rows["context_md5"], pa.string()),
            "response_md5": pa.array(sft_rows["response_md5"], pa.string()),
            "n_context_turns": pa.array(sft_rows["n_context_turns"], i32),
        }
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    pq.write_table(sft, os.path.join(GOLDEN_DIR, f"sft_md5_{sf_name}.parquet"))
    print(
        f"{sf_name}: {turns.num_rows} turn rows, {chunks.num_rows} chunk rows, "
        f"{sft.num_rows} sft rows"
    )


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    for d in dirs:
        make(d)
