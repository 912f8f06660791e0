"""JSON document-export sink (S3 analogue): per-conversation JSON with
pages in turn order, parseable and faithful to the extracted rows."""

import json

from pdf_parser_spark.pipeline import export_documents_json, extract_turns, synth_transcripts_df


def test_export_documents_json_roundtrip(spark):
    transcripts = synth_transcripts_df(spark, n_convs=6)
    extracted = extract_turns(transcripts)
    docs = export_documents_json(extracted).collect()
    assert len(docs) == 6
    by_conv = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in extracted.collect()
    }
    for row in docs:
        doc = json.loads(row["document_json"])
        assert doc["doc_id"] == row["conv_id"]
        assert doc["total_pages"] == len(doc["pages"])
        pages = doc["pages"]
        assert [p["page"] for p in pages] == sorted(p["page"] for p in pages)
        for p in pages:
            key = (row["conv_id"], p["page"])
            # to_json drops keys whose value is null (e.g. empty text)
            assert p.get("extracted_text", "") == by_conv[key]
            for b, s in zip(p.get("blocks", []), p.get("spans", [])):
                assert s["start"] <= s["end"]
