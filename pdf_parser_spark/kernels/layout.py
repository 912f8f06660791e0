"""Digital layout-analysis kernels (L1-L5 in SURVEY.md §2.3).

reference: src/extractors/digital.py:12-181. Operates on word dicts
``{"text", "x0", "x1", "top", "bottom"}`` (the pdfplumber
``extract_words`` shape) — in the transcript graft these come from the
payload tokenizer (payload.py), not from a PDF library. Grouping
thresholds (y_tolerance=3 absolute units, paragraph gap 0.03
normalized) match the reference exactly, including the greedy
iteration order.
"""

from __future__ import annotations

from typing import Any

from .bbox import merge_bboxes, normalize_bbox, sort_blocks_by_position
from .textnorm import normalize_text

Y_TOLERANCE_ABS = 3.0
PARAGRAPH_GAP_THRESHOLD = 0.03


def group_words_into_lines(
    words: list[dict[str, Any]],
    page_width: float,
    page_height: float,
    y_tolerance: float = Y_TOLERANCE_ABS,
) -> list[dict[str, Any]]:
    """L3 — reference: src/extractors/digital.py:82-112.

    Sort by (top, x0); greedy-merge a word into the current line while
    ``abs(top - line_anchor_top) <= y_tolerance`` (anchor = first word
    of the line, not a running mean — matches the reference).
    """
    if not words:
        return []
    sorted_words = sorted(words, key=lambda w: (w["top"], w["x0"]))
    lines = []
    current_line = [sorted_words[0]]
    current_y = sorted_words[0]["top"]
    for word in sorted_words[1:]:
        if abs(word["top"] - current_y) <= y_tolerance:
            current_line.append(word)
        else:
            lines.append(words_to_line(current_line, page_width, page_height))
            current_line = [word]
            current_y = word["top"]
    if current_line:
        lines.append(words_to_line(current_line, page_width, page_height))
    return lines


def words_to_line(
    words: list[dict[str, Any]], page_width: float, page_height: float
) -> dict[str, Any]:
    """L4 — reference: src/extractors/digital.py:115-133."""
    text = " ".join(w["text"] for w in words)
    x0 = min(w["x0"] for w in words)
    top = min(w["top"] for w in words)
    x1 = max(w["x1"] for w in words)
    bottom = max(w["bottom"] for w in words)
    bbox = normalize_bbox([x0, top, x1, bottom], page_width, page_height)
    return {"text": text, "bbox": bbox, "y": top}


def group_lines_into_paragraphs(
    lines: list[dict[str, Any]], gap_threshold: float = PARAGRAPH_GAP_THRESHOLD
) -> list[list[dict[str, Any]]]:
    """L5 — reference: src/extractors/digital.py:136-166.

    New paragraph when the normalized vertical gap
    ``curr.bbox[1] - prev.bbox[3]`` exceeds ``gap_threshold``.
    """
    if not lines:
        return []
    paragraphs = []
    current = [lines[0]]
    for i in range(1, len(lines)):
        gap = lines[i]["bbox"][1] - lines[i - 1]["bbox"][3]
        if gap > gap_threshold:
            paragraphs.append(current)
            current = [lines[i]]
        else:
            current.append(lines[i])
    if current:
        paragraphs.append(current)
    return paragraphs


def extract_digital_blocks(
    words: list[dict[str, Any]],
    full_text: str,
    page_number: int,
    page_width: float,
    page_height: float,
) -> list[dict[str, Any]]:
    """L1-L9 composition — reference: src/extractors/digital.py:12-79.

    Returns reading-order-sorted paragraph blocks. ``full_text`` drives
    the whole-page fallback (L2, digital.py:42-51): no words but
    non-empty text -> single block spanning the page.
    """
    if not full_text:
        return []
    if not words:
        return [
            {
                "block_id": f"p{page_number}_b1",
                "type": "paragraph",
                "text": normalize_text(full_text),
                "bbox": [0.0, 0.0, 1.0, 1.0],
                "confidence": 1.0,
                "rows": None,
                "lines": None,
            }
        ]

    lines = group_words_into_lines(words, page_width, page_height)
    paragraphs = group_lines_into_paragraphs(lines)

    blocks = []
    for idx, paragraph in enumerate(paragraphs):
        text = " ".join(line["text"] for line in paragraph)
        merged_bbox = merge_bboxes([line["bbox"] for line in paragraph])
        blocks.append(
            {
                "block_id": f"p{page_number}_b{idx + 1}",
                "type": "paragraph",
                "text": normalize_text(text),
                "bbox": merged_bbox,
                "confidence": 1.0,
                "rows": None,
                "lines": None,
            }
        )
    return sort_blocks_by_position(blocks)
