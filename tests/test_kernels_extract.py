"""Tests for OCR structural kernels (O3/O4/F12), HTML strip, payload
parsing, and the per-turn end-to-end extraction kernel."""

import json

from pdf_parser_spark.kernels.extract import assemble_turn_text, extract_turn
from pdf_parser_spark.kernels.htmlstrip import extract_html_blocks
from pdf_parser_spark.kernels.ocr_struct import (
    parse_doctr_result,
    parse_tesseract_result,
    postprocess_blocks,
)
from pdf_parser_spark.payload import (
    classify_payload,
    make_payload,
    parse_pdf_payload,
    synth_transcripts,
)


class TestTesseractParse:
    def _data(self):
        return {
            "text": ["Hello", "world", "", "Second", "block"],
            "conf": [90, 85, -1, 80, 70],
            "block_num": [1, 1, 1, 2, 2],
            "left": [10, 60, 0, 10, 60],
            "top": [100, 100, 0, 300, 300],
            "width": [40, 40, 0, 40, 40],
            "height": [12, 12, 0, 12, 12],
        }

    def test_groups_by_block_num(self):
        blocks = parse_tesseract_result(self._data(), 1, 595, 842)
        assert [b["text"] for b in blocks] == ["Hello world", "Second block"]
        assert blocks[0]["block_id"] == "p1_b1"
        assert abs(blocks[0]["confidence"] - 0.875) < 1e-9

    def test_low_conf_block_dropped(self):
        data = self._data()
        data["conf"] = [20, 25, -1, 80, 70]  # mean 0.225 < 0.3
        blocks = parse_tesseract_result(data, 1, 595, 842)
        assert [b["text"] for b in blocks] == ["Second block"]
        # counter still numbers surviving blocks sequentially
        assert blocks[0]["block_id"] == "p1_b1"

    def test_bbox_union_normalized(self):
        blocks = parse_tesseract_result(self._data(), 1, 595, 842)
        x1, y1, x2, y2 = blocks[0]["bbox"]
        assert abs(x1 - 10 / 595) < 1e-12 and abs(x2 - 100 / 595) < 1e-12
        assert abs(y1 - 100 / 842) < 1e-12 and abs(y2 - 112 / 842) < 1e-12


class TestDoctrParse:
    def _pages(self, conf=0.9):
        return [
            {
                "blocks": [
                    {
                        "lines": [
                            {
                                "words": [
                                    {"value": "line", "confidence": conf},
                                    {"value": "one", "confidence": conf},
                                ],
                                "geometry": [[0.1, 0.1], [0.5, 0.15]],
                            },
                            {
                                "words": [{"value": "two", "confidence": conf}],
                                "geometry": [[0.1, 0.16], [0.4, 0.2]],
                            },
                        ]
                    }
                ]
            }
        ]

    def test_lines_joined_by_newline(self):
        blocks = parse_doctr_result(self._pages(), 2)
        assert blocks[0]["text"] == "line one\ntwo"
        assert blocks[0]["block_id"] == "p2_b1"
        assert blocks[0]["bbox"] == [0.1, 0.1, 0.5, 0.2]
        assert len(blocks[0]["lines"]) == 2

    def test_low_confidence_dropped(self):
        assert parse_doctr_result(self._pages(conf=0.2), 1) == []


class TestPostprocessBlocks:
    def test_text_cleaned_and_short_dropped(self):
        blocks = [
            {"block_id": "b1", "text": "he1lo [world] valid text", "rows": None},
            {"block_id": "b2", "text": "==", "rows": None},
            {"block_id": "t1", "text": None, "rows": [["a", "b"]]},
        ]
        out = postprocess_blocks(blocks)
        assert [b["block_id"] for b in out] == ["b1", "t1"]
        assert out[0]["text"] == "hello world valid text"


class TestHtmlStrip:
    HTML = (
        "<html><body>"
        "<nav><a href='/'>home</a> <a href='/x'>about</a></nav>"
        "<h1>Main Title</h1>"
        "<p>This is the real article content with plenty of words to keep.</p>"
        "<div><a href='/s'>share</a> <a href='/l'>like</a> <a href='/f'>follow</a></div>"
        "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
        "<footer>© 2026 <a href='/tos'>terms</a></footer>"
        "</body></html>"
    )

    def test_boilerplate_dropped_content_kept(self):
        blocks = extract_html_blocks(self.HTML, 1)
        texts = [b["text"] for b in blocks if b["text"]]
        assert any("real article content" in t for t in texts)
        assert not any("home" in (t or "") for t in texts)
        assert not any("share" in (t or "") for t in texts)
        assert not any("terms" in (t or "") for t in texts)

    def test_header_type_and_table(self):
        blocks = extract_html_blocks(self.HTML, 1)
        assert blocks[0]["type"] == "header" and blocks[0]["text"] == "Main Title"
        tables = [b for b in blocks if b["type"] == "table"]
        assert len(tables) == 1 and tables[0]["rows"] == [["a", "b"], ["c", "d"]]
        assert tables[0]["block_id"] == "p1_t1"

    def test_hyphen_merge_applied(self):
        blocks = extract_html_blocks(
            "<p>an exam-\nple paragraph with enough words to keep around</p>", 1
        )
        assert "example" in blocks[0]["text"]

    def test_script_stripped(self):
        blocks = extract_html_blocks(
            "<p>keep this sentence of content</p><script>var x = 'drop me';</script>", 1
        )
        assert len(blocks) == 1 and "drop" not in blocks[0]["text"]


class TestPayload:
    def test_classify(self):
        assert classify_payload("%PDFW 595 842\n", "") == "pdf"
        assert classify_payload("  <html>", "") == "html"
        assert classify_payload("plain noisy text", "") == "ocr"
        assert classify_payload("%TESS {}", "") == "tess"
        assert classify_payload("%DOCTR []", "") == "doctr"
        assert classify_payload("anything", "opaque") == "opaque"
        assert classify_payload("", "") == "opaque"
        assert classify_payload("%BIN junk", "") == "opaque"

    def test_pdf_roundtrip(self):
        payload = make_payload("pdf", 7)
        words, tables, w, h, full, images = parse_pdf_payload(payload)
        assert w == 595.0 and h == 842.0
        assert len(words) > 5 and all("x0" in wd for wd in words)
        assert images == []  # synth pdf payloads carry no image regions

    def test_synth_deterministic(self):
        a = synth_transcripts(n_convs=5, seed=42)
        b = synth_transcripts(n_convs=5, seed=42)
        assert a == b
        c = synth_transcripts(n_convs=5, seed=43)
        assert a != c

    def test_synth_skew(self):
        rows = synth_transcripts(n_convs=50, seed=42, heavy_every=50, heavy_factor=40)
        counts = {}
        for r in rows:
            counts[r["conv_id"]] = counts.get(r["conv_id"], 0) + 1
        heavy = counts["conv_000049"]
        median = sorted(counts.values())[len(counts) // 2]
        assert heavy > 10 * median

    def test_synth_shuffled_not_ordered(self):
        rows = synth_transcripts(n_convs=5, seed=42)
        keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
        assert keys != sorted(keys)


class TestExtractTurn:
    def test_pdf_turn(self):
        res = extract_turn(make_payload("pdf", 3), 1, "")
        assert res["source"] == "digital" and res["payload_type"] == "pdf"
        assert res["blocks"] and res["extracted_text"]
        # spans index into extracted_text exactly
        for span in res["spans"]:
            seg = res["extracted_text"][span["start"]:span["end"]]
            assert len(seg) == span["end"] - span["start"] and seg.strip()

    def test_html_turn(self):
        res = extract_turn(make_payload("html", 3), 2, "")
        assert res["source"] == "digital" and res["blocks"]

    def test_ocr_turn_cleaned(self):
        res = extract_turn(make_payload("ocr", 3), 0, "")
        assert res["source"] == "ocr"
        assert "====" not in res["extracted_text"]

    def test_opaque_fallback(self):
        res = extract_turn(make_payload("opaque", 3), 0, "opaque")
        assert res["is_fallback"] and res["blocks"] == [] and res["extracted_text"] == ""

    def test_tess_doctr_turns(self):
        t = extract_turn(make_payload("tess", 3), 1, "")
        d = extract_turn(make_payload("doctr", 3), 1, "")
        assert t["blocks"] and d["blocks"]
        assert t["source"] == d["source"] == "ocr"

    def test_span_assembly_table_text(self):
        blocks = [
            {"block_id": "b1", "text": "para one", "rows": None},
            {"block_id": "t1", "text": None, "rows": [["a", "b"], ["c", "d"]]},
        ]
        text, spans = assemble_turn_text(blocks)
        assert text == "para one\n\na | b\nc | d"
        assert spans == [
            {"block_id": "b1", "start": 0, "end": 8},
            {"block_id": "t1", "start": 10, "end": 21},
        ]

    def test_malformed_payload_becomes_fallback_not_crash(self):
        # reference maps per-page exceptions to empty ocr Pages
        # (src/pipeline.py:142-143); one corrupt payload must never
        # kill a task at cluster scale
        for text in ["%TESS {not json", "%DOCTR [broken", "%PDFW abc def\nw\tx\ty\tz\tq"]:
            res = extract_turn(text, 1, "")
            assert res["is_fallback"] and res["blocks"] == []

    def test_pdf_table_overlap_dedup(self):
        # find a seed whose pdf payload includes a table; ghost line must be gone
        for seed in range(40):
            payload = make_payload("pdf", seed)
            if "%TABLE" in payload:
                res = extract_turn(payload, 1, "")
                assert "ghost" not in res["extracted_text"]
                assert any(b["type"] == "table" for b in res["blocks"])
                return
        raise AssertionError("no table payload found in seed range")
