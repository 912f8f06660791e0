"""Structural OCR-result kernels (O3, O4, F12, C5 in SURVEY.md §2.5).

The reference's model-bound OCR engines (docTR/Tesseract binaries) are
out of scope (GPU + nondeterministic); what IS in scope — and tested —
is the deterministic parsing of their result structures into blocks:

- O4 tesseract-dict grouping: reference src/extractors/ocr_tesseract.py:150-278
- O3 doctr-tree parsing:      reference src/extractors/ocr.py:204-293
- F12 block postprocess:      reference src/pipeline.py:146-176, 365-394

In the transcript graft these run over synthetic word/line structures
carried in the turn payload (FIXTURES.md §4).
"""

from __future__ import annotations

from typing import Any

from .bbox import normalize_bbox, sort_blocks_by_position
from .ocrpost import postprocess_ocr_text
from .textnorm import normalize_text

MIN_CONFIDENCE = 0.3  # reference: config.py:89


def parse_tesseract_result(
    data: dict[str, list[Any]],
    page_number: int,
    page_width: float,
    page_height: float,
) -> list[dict[str, Any]]:
    """O4 — reference: src/extractors/ocr_tesseract.py:150-230.

    ``data`` has parallel arrays text/conf/block_num/left/top/width/
    height. Words with empty text or conf < 0 are skipped; consecutive
    runs of the same block_num form a block (NOT a global group-by —
    a block_num reappearing later starts a new block, matching the
    reference's streaming loop).
    """
    blocks: list[dict[str, Any]] = []
    current_block_num = -1
    words: list[str] = []
    boxes: list[dict[str, float]] = []
    confs: list[int] = []

    def _flush() -> None:
        if words:
            block = _block_from_tesseract_words(
                words, boxes, confs, page_number, len(blocks) + 1, page_width, page_height
            )
            if block:
                blocks.append(block)

    for i in range(len(data["text"])):
        text = str(data["text"][i]).strip()
        conf = int(data["conf"][i])
        block_num = data["block_num"][i]
        if not text or conf < 0:
            continue
        if block_num != current_block_num:
            _flush()
            current_block_num = block_num
            words, boxes, confs = [], [], []
        words.append(text)
        boxes.append(
            {
                "left": data["left"][i],
                "top": data["top"][i],
                "width": data["width"][i],
                "height": data["height"][i],
            }
        )
        confs.append(conf)
    _flush()
    return blocks


def _block_from_tesseract_words(
    words: list[str],
    boxes: list[dict[str, float]],
    confs: list[int],
    page_number: int,
    block_counter: int,
    page_width: float,
    page_height: float,
) -> dict[str, Any] | None:
    """reference: src/extractors/ocr_tesseract.py:233-278."""
    if not words:
        return None
    text = normalize_text(" ".join(words))
    if not text or len(text.strip()) < 2:
        return None
    x1 = min(b["left"] for b in boxes)
    y1 = min(b["top"] for b in boxes)
    x2 = max(b["left"] + b["width"] for b in boxes)
    y2 = max(b["top"] + b["height"] for b in boxes)
    bbox = normalize_bbox([x1, y1, x2, y2], page_width, page_height)
    confidence = sum(confs) / len(confs) / 100.0
    if confidence < MIN_CONFIDENCE:
        return None
    return {
        "block_id": f"p{page_number}_b{block_counter}",
        "type": "paragraph",
        "text": text,
        "bbox": bbox,
        "confidence": confidence,
        "rows": None,
        "lines": None,
    }


def parse_doctr_result(
    pages: list[dict[str, Any]], page_number: int
) -> list[dict[str, Any]]:
    """O3 — reference: src/extractors/ocr.py:204-293.

    ``pages`` is the doctr-shaped tree as plain dicts:
    ``[{"blocks": [{"lines": [{"words": [{"value", "confidence"}],
    "geometry": ((x1,y1),(x2,y2))}]}]}]`` with normalized geometry.
    Words joined by " ", lines by newline; union bbox; mean word
    confidence; conf < 0.3 drops the block; per-line payload kept.
    Block ids are assigned in detection order (ocr.py:281-291); the
    caller band-sorts afterwards (ocr.py:199), so ids do NOT follow
    reading order — matching the reference exactly.
    """
    blocks: list[dict[str, Any]] = []
    block_counter = 1
    for page in pages:
        for block_data in page["blocks"]:
            block_text: list[str] = []
            all_line_bboxes: list[list[float]] = []
            total_confidence = 0.0
            word_count = 0
            for line in block_data["lines"]:
                line_words = [w["value"] for w in line["words"]]
                for w in line["words"]:
                    total_confidence += w["confidence"]
                    word_count += 1
                block_text.append(" ".join(line_words))
                geom = line["geometry"]
                all_line_bboxes.append(
                    [geom[0][0], geom[0][1], geom[1][0], geom[1][1]]
                )
            if not block_text:
                continue
            text = normalize_text("\n".join(block_text))
            if not text:
                continue
            if all_line_bboxes:
                bbox = [
                    min(b[0] for b in all_line_bboxes),
                    min(b[1] for b in all_line_bboxes),
                    max(b[2] for b in all_line_bboxes),
                    max(b[3] for b in all_line_bboxes),
                ]
            else:
                bbox = [0.0, 0.0, 1.0, 1.0]
            confidence = total_confidence / word_count if word_count > 0 else 0.0
            if confidence < MIN_CONFIDENCE:
                continue
            lines_data = [
                {"text": line_text, "bbox": line_bbox}
                for line_text, line_bbox in zip(block_text, all_line_bboxes)
            ]
            blocks.append(
                {
                    "block_id": f"p{page_number}_b{block_counter}",
                    "type": "paragraph",
                    "text": text,
                    "bbox": bbox,
                    "confidence": confidence,
                    "rows": None,
                    "lines": lines_data,
                }
            )
            block_counter += 1
    return blocks


def parse_and_sort_doctr(
    pages: list[dict[str, Any]], page_number: int
) -> list[dict[str, Any]]:
    """O3 tail — reference: src/extractors/ocr.py:196-199 (band-sort after parse)."""
    return sort_blocks_by_position(parse_doctr_result(pages, page_number))


def postprocess_blocks(
    blocks: list[dict[str, Any]],
    fix_errors: bool = True,
    min_line_length: int = 3,
) -> list[dict[str, Any]]:
    """F12 — reference: src/pipeline.py:146-176 / 365-394.

    Text blocks get the F11 pipeline (clean=True, merge_words=False)
    and survive only if the cleaned stripped text is >= 2 chars;
    textless (table) blocks pass through untouched.
    """
    processed: list[dict[str, Any]] = []
    for block in blocks:
        if block.get("text"):
            cleaned = postprocess_ocr_text(
                block["text"],
                clean=True,
                fix_errors=fix_errors,
                merge_words=False,
                min_line_length=min_line_length,
            )
            if cleaned and len(cleaned.strip()) >= 2:
                new_block = dict(block)
                new_block["text"] = cleaned
                processed.append(new_block)
        else:
            processed.append(block)
    return processed
