"""Property-based tests (hypothesis) over the pure M0 kernels.

Complements tests/test_kernels_fuzz.py (which fuzzes extract_turn's
totality and span invariants end-to-end): these properties pin the
per-kernel invariants the Spark stages rely on — reading-order sort is
a non-mutating permutation, chunking never exceeds its budget or loses
non-whitespace content, bbox algebra is well-behaved, and text
normalization is idempotent. No Spark session needed — these run on
the kernel layer directly.
"""

import re

from hypothesis import given
from hypothesis import strategies as st

from pdf_parser_spark.kernels.bbox import (
    bbox_area,
    bbox_overlap,
    denormalize_bbox,
    merge_bboxes,
    normalize_bbox,
    sort_blocks_by_position,
)
from pdf_parser_spark.kernels.chunker import split_text_chunks
from pdf_parser_spark.kernels.textnorm import normalize_text

coord = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)
side = st.floats(min_value=1e-3, max_value=1.0, allow_nan=False)


@st.composite
def boxes(draw):
    x1, y1 = draw(coord), draw(coord)
    return [x1, y1, x1 + draw(side), y1 + draw(side)]


@given(boxes(), st.floats(1.0, 5000.0), st.floats(1.0, 5000.0))
def test_normalize_denormalize_roundtrip(b, w, h):
    out = normalize_bbox(denormalize_bbox(b, w, h), w, h)
    assert all(abs(a - c) < 1e-6 for a, c in zip(b, out))


@given(boxes(), boxes())
def test_overlap_symmetric_and_bounded(a, b):
    ov = bbox_overlap(a, b)
    assert ov == bbox_overlap(b, a)
    assert 0.0 <= ov <= min(bbox_area(a), bbox_area(b)) + 1e-9


@given(st.lists(boxes(), min_size=1, max_size=20))
def test_merge_bboxes_contains_all_and_idempotent(bs):
    m = merge_bboxes(bs)
    for b in bs:
        assert m[0] <= b[0] and m[1] <= b[1] and m[2] >= b[2] and m[3] >= b[3]
    assert merge_bboxes([m] + bs) == m


@given(st.lists(boxes(), max_size=25), st.sampled_from(["top-to-bottom", "left-to-right"]))
def test_reading_order_sort_is_a_permutation(bs, order):
    blocks = [{"block_id": i, "bbox": b} for i, b in enumerate(bs)]
    out = sort_blocks_by_position(blocks, reading_order=order)
    assert sorted(blk["block_id"] for blk in out) == list(range(len(bs)))
    # input order must be untouched (the kernel runs inside a shared
    # Arrow batch; in-place mutation would corrupt sibling columns)
    assert [blk["block_id"] for blk in blocks] == list(range(len(bs)))


@given(st.text(max_size=4000), st.integers(min_value=8, max_value=1200))
def test_split_text_chunks_budget_and_no_content_loss(text, max_chars):
    chunks = split_text_chunks(text, max_chars=max_chars)
    ws = re.compile(r"\s+")
    for c in chunks:
        assert len(c) <= max_chars
        assert c == c.strip() and c != ""
    assert ws.sub("", "".join(chunks)) == ws.sub("", text)


@given(st.text(max_size=2000))
def test_normalize_text_idempotent(text):
    once = normalize_text(text)
    assert normalize_text(once) == once
