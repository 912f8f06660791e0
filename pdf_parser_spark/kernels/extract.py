"""Per-turn end-to-end extraction kernel.

Pure-Python composition of the M0 kernels, mirroring the reference's
per-page lifecycle (src/pipeline.py:306-353: classify -> route ->
extract -> table merge -> postprocess). Runs identically in the golden
generator and inside the Spark ``mapInPandas`` stage, so per-turn text
equality is exact by construction; Spark owns only distribution.

Output per turn (FIXTURES.md §2):
    source          'digital' | 'ocr'
    payload_type    pdf|html|ocr|tess|doctr|opaque
    blocks          list of block dicts (block_id/type/text/bbox/
                    confidence/rows/lines)
    extracted_text  block texts joined in reading order by '\\n\\n'
                    (tables rendered as rows of ' | '-joined cells —
                    the reference's table text form, searchable_pdf.py:177-221)
    spans           (block_id, start, end) char offsets into extracted_text
    is_fallback     True for unparseable payloads (ocr_fallback_rate)
"""

from __future__ import annotations

import json
from typing import Any

from ..payload import classify_payload, parse_pdf_payload
from .bbox import remove_overlapping_text_blocks, sort_blocks_by_position
from .htmlstrip import extract_html_blocks
from .layout import extract_digital_blocks
from .ocr_struct import (
    parse_and_sort_doctr,
    parse_tesseract_result,
    postprocess_blocks,
)
from .tables import drop_empty_rows, merge_table_cells, normalize_table_data

BLOCK_SEPARATOR = "\n\n"
TABLE_CELL_SEPARATOR = " | "  # reference: src/exporters/searchable_pdf.py:177-221


def table_block_text(rows: list[list[str]] | None) -> str:
    if not rows:
        return ""
    return "\n".join(TABLE_CELL_SEPARATOR.join(row) for row in rows)


def assemble_turn_text(
    blocks: list[dict[str, Any]],
) -> tuple[str, list[dict[str, Any]]]:
    """Join block texts in reading order; emit char-offset spans.

    The graft's span requirement (BASELINE.json north_star): spans are
    (start, end) of each block's text within the assembled turn text —
    deterministic given block order. Blocks rendering to '' get no span.
    """
    parts: list[str] = []
    spans: list[dict[str, Any]] = []
    pos = 0
    for block in blocks:
        text = block["text"] if block.get("text") else table_block_text(block.get("rows"))
        if not text:
            continue
        spans.append({"block_id": block["block_id"], "start": pos, "end": pos + len(text)})
        parts.append(text)
        pos += len(text) + len(BLOCK_SEPARATOR)
    return BLOCK_SEPARATOR.join(parts), spans


def _extract_pdf(text: str, page_number: int) -> list[dict[str, Any]]:
    """Digital route — reference: src/pipeline.py:320-338 (extract,
    table overlap-dedup, extend, re-sort)."""
    words, table_regions, width, height, full_text = parse_pdf_payload(text)
    blocks = extract_digital_blocks(words, full_text, page_number, width, height)

    table_blocks: list[dict[str, Any]] = []
    for t_idx, (tbbox, raw_rows) in enumerate(table_regions):
        rows = normalize_table_data(merge_table_cells(drop_empty_rows(raw_rows)))
        if not rows:
            continue
        # table id convention p{N}_t{idx} — reference: src/extractors/tables.py:77-78
        table_blocks.append(
            {
                "block_id": f"p{page_number}_t{t_idx}",
                "type": "table",
                "text": None,
                "bbox": tbbox,
                "confidence": 1.0,
                "rows": rows,
                "lines": None,
            }
        )
    if table_blocks:
        blocks = remove_overlapping_text_blocks(blocks, table_blocks)
        blocks.extend(table_blocks)
        blocks = sort_blocks_by_position(blocks)
    return blocks


def _extract_ocr_text(text: str, page_number: int) -> list[dict[str, Any]]:
    """Noisy-plain-text route: blank-line groups become pseudo-blocks
    (detection order ids, synthetic ordered bboxes), then the F12
    postprocess wrapper — reference: src/pipeline.py:344-345, 365-394."""
    groups: list[list[str]] = []
    current: list[str] = []
    for line in text.split("\n"):
        if line.strip():
            current.append(line)
        elif current:
            groups.append(current)
            current = []
    if current:
        groups.append(current)

    n = max(len(groups), 1)
    blocks = []
    for i, group in enumerate(groups):
        blocks.append(
            {
                "block_id": f"p{page_number}_b{i + 1}",
                "type": "paragraph",
                "text": "\n".join(group),
                "bbox": [0.05, i / n, 0.95, (i + 0.8) / n],
                "confidence": 1.0,
                "rows": None,
                "lines": None,
            }
        )
    return postprocess_blocks(blocks)


def extract_turn(text: str | None, turn_idx: int, tool: str | None) -> dict[str, Any]:
    """Classify and extract one turn. page_number := turn_idx (FIXTURES.md §2)."""
    payload_type = classify_payload(text, tool)
    page_number = turn_idx
    is_fallback = False

    # Per-turn errors become an empty fallback turn rather than killing
    # the task — reference: src/pipeline.py:142-143 maps any per-page
    # exception to an empty ocr Page. At cluster scale one corrupt
    # payload must never fail a 100 TB job.
    try:
        if payload_type == "pdf":
            source = "digital"
            blocks = _extract_pdf(text, page_number)
        elif payload_type == "html":
            source = "digital"
            blocks = extract_html_blocks(text, page_number)
        elif payload_type == "ocr":
            source = "ocr"
            blocks = _extract_ocr_text(text, page_number)
        elif payload_type == "tess":
            source = "ocr"
            data = json.loads(text[len("%TESS "):])
            width = float(data.get("page_width", 595.0))
            height = float(data.get("page_height", 842.0))
            blocks = parse_tesseract_result(data, page_number, width, height)
            blocks = sort_blocks_by_position(blocks)  # ocr_tesseract.py:145
            blocks = postprocess_blocks(blocks)
        elif payload_type == "doctr":
            source = "ocr"
            pages = json.loads(text[len("%DOCTR "):])
            blocks = parse_and_sort_doctr(pages, page_number)
            blocks = postprocess_blocks(blocks)
        else:  # opaque / unparseable -> fallback branch, counted as a metric
            source = "ocr"
            blocks = []
            is_fallback = True
    except Exception:
        source = "ocr"
        blocks = []
        is_fallback = True

    extracted_text, spans = assemble_turn_text(blocks)
    return {
        "source": source,
        "payload_type": payload_type,
        "blocks": blocks,
        "extracted_text": extracted_text,
        "spans": spans,
        "is_fallback": is_fallback,
    }
