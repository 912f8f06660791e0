"""Bounding-box + reading-order kernels (L6-L13 in SURVEY.md §2.3).

reference: src/utils/bbox.py. Blocks are plain dicts with a ``bbox``
key ``[x1, y1, x2, y2]`` normalized 0-1 (Arrow/pandas friendly) —
otherwise the algorithms, thresholds, and float comparisons are
identical to the reference:

- band sort: overlap >= 30% of the smaller height OR 0 <= gap < y_tol
  (bbox.py:147-206)
- column detection: largest x-centre gap > 0.08 with minority side
  >= 20%, needs >= 4 blocks (bbox.py:214-262)
- multicolumn: full-width means width >= 0.60 (bbox.py:288 — the code
  constant, not the 70% comment), interleave by y1 (bbox.py:265-326)
"""

from __future__ import annotations

from typing import Any

DEFAULT_Y_TOLERANCE = 0.008
OVERLAP_BAND_THRESHOLD = 0.3
COLUMN_GAP_THRESHOLD = 0.08
FULL_WIDTH_THRESHOLD = 0.60


def normalize_bbox(
    bbox: list[float], page_width: float, page_height: float
) -> list[float]:
    """L7 — reference: src/utils/bbox.py:23-42."""
    return [
        bbox[0] / page_width,
        bbox[1] / page_height,
        bbox[2] / page_width,
        bbox[3] / page_height,
    ]


def denormalize_bbox(
    bbox: list[float], page_width: float, page_height: float
) -> list[float]:
    """L7 — reference: src/utils/bbox.py:45-56."""
    return [
        bbox[0] * page_width,
        bbox[1] * page_height,
        bbox[2] * page_width,
        bbox[3] * page_height,
    ]


def bbox_area(bbox: list[float]) -> float:
    """L8 — reference: src/utils/bbox.py:59-61."""
    return (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])


def bbox_overlap(bbox1: list[float], bbox2: list[float]) -> float:
    """L8 — reference: src/utils/bbox.py:64-76."""
    x1 = max(bbox1[0], bbox2[0])
    y1 = max(bbox1[1], bbox2[1])
    x2 = min(bbox1[2], bbox2[2])
    y2 = min(bbox1[3], bbox2[3])
    if x2 < x1 or y2 < y1:
        return 0.0
    return (x2 - x1) * (y2 - y1)


def merge_bboxes(bboxes: list[list[float]]) -> list[float]:
    """L6 — reference: src/extractors/digital.py:169-181."""
    if not bboxes:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        min(b[0] for b in bboxes),
        min(b[1] for b in bboxes),
        max(b[2] for b in bboxes),
        max(b[3] for b in bboxes),
    ]


def sort_blocks_by_position(
    blocks: list[dict[str, Any]],
    reading_order: str = "top-to-bottom",
    y_tolerance: float | None = None,
) -> list[dict[str, Any]]:
    """L9 — reference: src/utils/bbox.py:88-139."""
    if not blocks or len(blocks) <= 1:
        return blocks
    if reading_order == "left-to-right":
        return sorted(blocks, key=lambda b: (b["bbox"][0], b["bbox"][1]))
    if reading_order != "top-to-bottom":
        return blocks
    if y_tolerance is None:
        y_tolerance = DEFAULT_Y_TOLERANCE
    columns = _detect_columns(blocks)
    if columns is not None:
        return _sort_multicolumn(blocks, columns, y_tolerance)
    return _sort_by_reading_bands(blocks, y_tolerance)


def _sort_by_reading_bands(
    blocks: list[dict[str, Any]], y_tolerance: float = DEFAULT_Y_TOLERANCE
) -> list[dict[str, Any]]:
    """L10 — reference: src/utils/bbox.py:147-206 (greedy, order-dependent)."""
    sorted_blocks = sorted(blocks, key=lambda b: b["bbox"][1])

    bands: list[list[dict[str, Any]]] = []
    current_band = [sorted_blocks[0]]
    band_y_top = sorted_blocks[0]["bbox"][1]
    band_y_bottom = sorted_blocks[0]["bbox"][3]

    for block in sorted_blocks[1:]:
        b_y_top = block["bbox"][1]
        b_y_bottom = block["bbox"][3]
        b_height = max(b_y_bottom - b_y_top, 0.001)
        band_height = max(band_y_bottom - band_y_top, 0.001)
        overlap = max(0.0, min(band_y_bottom, b_y_bottom) - max(band_y_top, b_y_top))
        min_height = min(b_height, band_height)
        overlap_ratio = overlap / min_height if min_height > 0 else 0.0
        y_gap = b_y_top - band_y_bottom

        if overlap_ratio >= OVERLAP_BAND_THRESHOLD or (0 <= y_gap < y_tolerance):
            current_band.append(block)
            band_y_bottom = max(band_y_bottom, b_y_bottom)
        else:
            bands.append(current_band)
            current_band = [block]
            band_y_top = b_y_top
            band_y_bottom = b_y_bottom

    if current_band:
        bands.append(current_band)

    result: list[dict[str, Any]] = []
    for band in bands:
        band.sort(key=lambda b: b["bbox"][0])
        result.extend(band)
    return result


def _detect_columns(
    blocks: list[dict[str, Any]],
    min_blocks: int = 4,
    gap_threshold: float = COLUMN_GAP_THRESHOLD,
) -> list[tuple[float, float]] | None:
    """L11 — reference: src/utils/bbox.py:214-262."""
    if len(blocks) < min_blocks:
        return None
    x_centres = sorted((b["bbox"][0] + b["bbox"][2]) / 2 for b in blocks)
    best_gap = 0.0
    best_idx = -1
    for i in range(1, len(x_centres)):
        gap = x_centres[i] - x_centres[i - 1]
        if gap > best_gap:
            best_gap = gap
            best_idx = i
    if best_gap < gap_threshold:
        return None
    left_count = best_idx
    right_count = len(x_centres) - best_idx
    if min(left_count, right_count) / len(x_centres) < 0.2:
        return None
    col_boundary = (x_centres[best_idx - 1] + x_centres[best_idx]) / 2
    return [(0.0, col_boundary), (col_boundary, 1.0)]


def _sort_multicolumn(
    blocks: list[dict[str, Any]],
    columns: list[tuple[float, float]],
    y_tolerance: float,
) -> list[dict[str, Any]]:
    """L12 — reference: src/utils/bbox.py:265-326."""
    col_mid = columns[0][1]
    left_blocks: list[dict[str, Any]] = []
    right_blocks: list[dict[str, Any]] = []
    full_width: list[dict[str, Any]] = []

    for block in blocks:
        centre = (block["bbox"][0] + block["bbox"][2]) / 2
        width = block["bbox"][2] - block["bbox"][0]
        if width >= FULL_WIDTH_THRESHOLD:
            full_width.append(block)
        elif centre < col_mid:
            left_blocks.append(block)
        else:
            right_blocks.append(block)

    sorted_left = _sort_by_reading_bands(left_blocks, y_tolerance) if left_blocks else []
    sorted_right = (
        _sort_by_reading_bands(right_blocks, y_tolerance) if right_blocks else []
    )

    if not full_width:
        return sorted_left + sorted_right

    full_width.sort(key=lambda b: b["bbox"][1])
    result: list[dict[str, Any]] = []
    fw_idx = 0
    for block in sorted_left + sorted_right:
        while fw_idx < len(full_width) and full_width[fw_idx]["bbox"][1] <= block["bbox"][1]:
            result.append(full_width[fw_idx])
            fw_idx += 1
        result.append(block)
    while fw_idx < len(full_width):
        result.append(full_width[fw_idx])
        fw_idx += 1
    return result


def merge_nearby_boxes(
    boxes: list[list[float]], threshold: float = 0.01
) -> list[list[float]]:
    """L13 — reference: src/utils/bbox.py:334-373."""
    if not boxes:
        return []
    sorted_boxes = sorted(boxes, key=lambda b: (b[1], b[0]))
    merged = [sorted_boxes[0]]
    for current in sorted_boxes[1:]:
        last = merged[-1]
        y_distance = abs(current[1] - last[1])
        x_distance = current[0] - last[2]
        if y_distance < threshold and 0 <= x_distance < threshold:
            merged[-1] = [
                min(last[0], current[0]),
                min(last[1], current[1]),
                max(last[2], current[2]),
                max(last[3], current[3]),
            ]
        else:
            merged.append(current)
    return merged


def remove_overlapping_text_blocks(
    text_blocks: list[dict[str, Any]],
    table_blocks: list[dict[str, Any]],
    overlap_threshold: float = 0.5,
) -> list[dict[str, Any]]:
    """T2 — reference: src/pipeline.py:396-417.

    Drop a text block when its overlap with ANY table block exceeds
    ``overlap_threshold`` of the text block's own area.
    """
    filtered = []
    for text_block in text_blocks:
        keep = True
        for table_block in table_blocks:
            overlap = bbox_overlap(text_block["bbox"], table_block["bbox"])
            text_area = bbox_area(text_block["bbox"])
            if text_area > 0 and (overlap / text_area) > overlap_threshold:
                keep = False
                break
        if keep:
            filtered.append(text_block)
    return filtered
