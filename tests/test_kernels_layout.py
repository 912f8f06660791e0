"""Unit tests for bbox/layout kernels L1-L13 + T2 (reference semantics)."""

from pdf_parser_spark.kernels.bbox import (
    bbox_area,
    bbox_overlap,
    merge_bboxes,
    merge_nearby_boxes,
    normalize_bbox,
    remove_overlapping_text_blocks,
    sort_blocks_by_position,
    _detect_columns,
)
from pdf_parser_spark.kernels.layout import (
    extract_digital_blocks,
    group_lines_into_paragraphs,
    group_words_into_lines,
)


def _blk(x1, y1, x2, y2, tag=""):
    return {"bbox": [x1, y1, x2, y2], "tag": tag}


class TestBboxBasics:
    def test_normalize(self):
        assert normalize_bbox([59.5, 84.2, 119.0, 168.4], 595, 842) == [
            0.1,
            0.1,
            0.2,
            0.2,
        ]

    def test_area_overlap(self):
        assert bbox_area([0, 0, 2, 3]) == 6
        assert bbox_overlap([0, 0, 1, 1], [0.5, 0.5, 2, 2]) == 0.25
        assert bbox_overlap([0, 0, 1, 1], [2, 2, 3, 3]) == 0.0

    def test_merge(self):
        assert merge_bboxes([[0, 1, 2, 3], [1, 0, 3, 2]]) == [0, 0, 3, 3]
        assert merge_bboxes([]) == [0.0, 0.0, 0.0, 0.0]


class TestBandSort:
    def test_left_to_right_mode(self):
        blocks = [_blk(0.5, 0.1, 0.6, 0.2, "b"), _blk(0.1, 0.5, 0.2, 0.6, "a")]
        out = sort_blocks_by_position(blocks, reading_order="left-to-right")
        assert [b["tag"] for b in out] == ["a", "b"]

    def test_same_band_sorted_by_x(self):
        blocks = [
            _blk(0.6, 0.10, 0.9, 0.15, "right"),
            _blk(0.1, 0.11, 0.4, 0.16, "left"),
        ]
        out = sort_blocks_by_position(blocks)
        assert [b["tag"] for b in out] == ["left", "right"]

    def test_bands_top_to_bottom(self):
        blocks = [
            _blk(0.1, 0.5, 0.9, 0.6, "second"),
            _blk(0.1, 0.1, 0.9, 0.2, "first"),
            _blk(0.1, 0.8, 0.9, 0.9, "third"),
        ]
        out = sort_blocks_by_position(blocks)
        assert [b["tag"] for b in out] == ["first", "second", "third"]

    def test_gap_under_tolerance_same_band(self):
        # gap of 0.005 < y_tolerance 0.008 -> same band, x-order wins
        blocks = [
            _blk(0.6, 0.205, 0.9, 0.30, "b"),
            _blk(0.1, 0.10, 0.4, 0.20, "a"),
        ]
        out = sort_blocks_by_position(blocks)
        assert [b["tag"] for b in out] == ["a", "b"]


class TestColumns:
    def test_two_columns_detected(self):
        blocks = [
            _blk(0.05, y, 0.35, y + 0.05) for y in (0.1, 0.3, 0.5)
        ] + [_blk(0.6, y, 0.9, y + 0.05) for y in (0.1, 0.3, 0.5)]
        cols = _detect_columns(blocks)
        assert cols is not None and len(cols) == 2

    def test_too_few_blocks(self):
        assert _detect_columns([_blk(0, 0, 0.1, 0.1)] * 3) is None

    def test_multicolumn_reading_order(self):
        left = [_blk(0.05, 0.2, 0.35, 0.25, "L1"), _blk(0.05, 0.4, 0.35, 0.45, "L2")]
        right = [_blk(0.6, 0.2, 0.9, 0.25, "R1"), _blk(0.6, 0.4, 0.9, 0.45, "R2")]
        full = [_blk(0.05, 0.05, 0.95, 0.1, "FW")]  # width 0.9 >= 0.60
        out = sort_blocks_by_position(left + right + full)
        tags = [b["tag"] for b in out]
        # full-width block first (lowest y), then left column, then right
        assert tags == ["FW", "L1", "L2", "R1", "R2"]


class TestMergeNearby:
    def test_same_line_merge(self):
        out = merge_nearby_boxes([[0.0, 0.1, 0.1, 0.12], [0.105, 0.1, 0.2, 0.12]])
        assert out == [[0.0, 0.1, 0.2, 0.12]]

    def test_far_apart_kept(self):
        boxes = [[0.0, 0.1, 0.1, 0.12], [0.5, 0.1, 0.6, 0.12]]
        assert merge_nearby_boxes(boxes) == boxes


class TestOverlapDedup:
    def test_text_inside_table_dropped(self):
        text = [dict(_blk(0.2, 0.2, 0.4, 0.3, "t1"), block_id="b1")]
        table = [dict(_blk(0.1, 0.1, 0.9, 0.5), block_id="t")]
        assert remove_overlapping_text_blocks(text, table) == []

    def test_disjoint_kept(self):
        text = [dict(_blk(0.2, 0.6, 0.4, 0.7), block_id="b1")]
        table = [dict(_blk(0.1, 0.1, 0.9, 0.5), block_id="t")]
        assert len(remove_overlapping_text_blocks(text, table)) == 1


def _word(text, x0, top, width=30.0, height=10.0):
    return {"text": text, "x0": x0, "x1": x0 + width, "top": top, "bottom": top + height}


class TestWordGrouping:
    def test_words_same_line_keeps_top_x0_order(self):
        # reference sorts by (top, x0) and joins in that order — a word
        # 1pt lower but further left stays AFTER the higher word
        words = [_word("b", 50, 100), _word("a", 10, 101)]
        lines = group_words_into_lines(words, 595, 842)
        assert len(lines) == 1 and lines[0]["text"] == "b a"

    def test_words_same_top_sorted_by_x(self):
        words = [_word("b", 50, 100), _word("a", 10, 100)]
        lines = group_words_into_lines(words, 595, 842)
        assert len(lines) == 1 and lines[0]["text"] == "a b"

    def test_y_tolerance_boundary(self):
        # 3.0 exactly -> same line; 3.1 -> new line
        same = group_words_into_lines([_word("a", 10, 100), _word("b", 50, 103.0)], 595, 842)
        assert len(same) == 1
        split = group_words_into_lines([_word("a", 10, 100), _word("b", 50, 103.1)], 595, 842)
        assert len(split) == 2

    def test_paragraph_gap(self):
        lines = [
            {"text": "l1", "bbox": [0.1, 0.10, 0.9, 0.12], "y": 84.2},
            {"text": "l2", "bbox": [0.1, 0.125, 0.9, 0.145], "y": 105},  # gap 0.005
            {"text": "l3", "bbox": [0.1, 0.30, 0.9, 0.32], "y": 252},  # gap 0.155
        ]
        paras = group_lines_into_paragraphs(lines)
        assert [len(p) for p in paras] == [2, 1]


class TestExtractDigitalBlocks:
    def test_fallback_whole_page(self):
        blocks = extract_digital_blocks([], "raw page text", 3, 595, 842)
        assert len(blocks) == 1
        assert blocks[0]["block_id"] == "p3_b1"
        assert blocks[0]["bbox"] == [0.0, 0.0, 1.0, 1.0]
        assert blocks[0]["text"] == "raw page text"

    def test_empty_text_no_blocks(self):
        assert extract_digital_blocks([], "", 1, 595, 842) == []

    def test_two_paragraphs(self):
        words = [
            _word("alpha", 50, 100),
            _word("beta", 100, 100),
            _word("gamma", 50, 114),
            # paragraph gap: 0.03*842 = 25.26 normalized; next top at 200
            _word("delta", 50, 200),
        ]
        blocks = extract_digital_blocks(words, "alpha beta gamma delta", 1, 595, 842)
        assert [b["text"] for b in blocks] == ["alpha beta gamma", "delta"]
        assert [b["block_id"] for b in blocks] == ["p1_b1", "p1_b2"]
