"""Pure-Python reference for the S4 searchable-PDF text-overlay
geometry (reference: src/exporters/searchable_pdf.py:31-222).

The reference overlays render-mode-3 (invisible) text on the original
PDF; its deterministic core is WHERE each text line lands and at what
font size. This straight-line implementation is the oracle for the
Spark-side ``pipeline.export_text_overlay`` (higher-order array
functions) — both must produce identical rows.

Rules reproduced:
- table blocks with ``rows``: one line per row, cells joined " | "
  (empty cells dropped), blank rows skipped, distributed uniformly in
  the block bbox (searchable_pdf.py:180-222);
- blocks with empty text are skipped entirely (:56-59);
- blocks with per-line data: one line per (text, bbox), blank text or
  malformed bbox skipped (:127-137);
- otherwise the block text splits on newline, blank lines dropped,
  distributed uniformly in the block bbox (:140-176);
- lines with non-positive absolute width/height are skipped and
  font_size = clamp(line_height_pts * 0.80, 4, 72) (:18-23, :95-105).
"""

from __future__ import annotations

from typing import Any

FONT_FACTOR = 0.80
MIN_FONT = 4.0
MAX_FONT = 72.0
PAGE_W_PTS = 612.0
PAGE_H_PTS = 792.0


def overlay_lines(
    blocks: list[dict[str, Any]],
    page_w_pts: float = PAGE_W_PTS,
    page_h_pts: float = PAGE_H_PTS,
) -> list[dict[str, Any]]:
    """Overlay lines for one turn's blocks. ``line_no`` indexes the
    turn's candidate lines BEFORE the width/height filter (matching
    posexplode-then-filter on the Spark side)."""
    out: list[dict[str, Any]] = []
    line_no = 0

    def emit(block_id: str, text: str, bbox: list[float]) -> None:
        nonlocal line_no
        lw = (bbox[2] - bbox[0]) * page_w_pts
        lh = (bbox[3] - bbox[1]) * page_h_pts
        if lw > 0 and lh > 0:
            out.append(
                {
                    "block_id": block_id,
                    "line_no": line_no,
                    "text": text,
                    "bbox": list(bbox),
                    "font_size_pts": max(MIN_FONT, min(lh * FONT_FACTOR, MAX_FONT)),
                }
            )
        line_no += 1

    def distribute(block: dict[str, Any], texts: list[str]) -> None:
        x1, y1, x2, y2 = block["bbox"]
        n = len(texts)
        bh = y2 - y1
        for i, t in enumerate(texts):
            emit(
                block["block_id"],
                t,
                [x1, y1 + i * bh / n, x2, y1 + (i + 1) * bh / n],
            )

    for b in blocks:
        rows = b.get("rows")
        if rows is not None and len(rows) > 0:
            texts = [" | ".join(c for c in row if c) for row in rows]
            distribute(b, [t for t in texts if t.strip()])
        elif not (b.get("text") or ""):
            continue
        elif b.get("lines"):
            for line in b["lines"]:
                if line["text"].strip() and len(line["bbox"]) == 4:
                    emit(b["block_id"], line["text"], list(line["bbox"]))
        else:
            distribute(
                b, [t for t in (b.get("text") or "").split("\n") if t.strip()]
            )
    return out
