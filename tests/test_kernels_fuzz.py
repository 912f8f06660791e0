"""Property/fuzz tests: the per-turn kernel must be TOTAL — any
payload, however malformed, yields a schema-shaped result (the
reference maps any per-page exception to an empty OCR page,
src/pipeline.py:142-143; at cluster scale one corrupt payload must
never fail a 100 TB job)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.kernels.extract import BLOCK_SEPARATOR, extract_turn
from pdf_parser_spark.payload import PAYLOAD_TYPES

# adversarial prefixes: every payload-format magic, truncated/garbled
_PREFIXES = st.sampled_from(
    [
        "", "%PDFW", "%PDFW 595 842\n", "%PDFW x y\n", "%TESS ", "%TESS {",
        "%TESS {\"text\": [1,2]}", "%DOCTR ", "%DOCTR [", "%DOCTR [{}]",
        "%BIN", "%TABLE 0.1 0.2", "%IMG ", "%IMG 0 1 2", "<", "<html><p>",
        "%PDFW 595 842\n%TABLE 0 0 1 1\na|b\n", "%PDFW 0 0\n",
        "%PDFW 595 842\n%IMG 0 595 0 842\n",
    ]
)


def _check_result(text, r):
    assert r["payload_type"] in PAYLOAD_TYPES
    assert r["source"] in ("digital", "ocr")
    assert isinstance(r["extracted_text"], str)
    assert isinstance(r["is_fallback"], bool)
    # span invariants: in-bounds, ordered, non-overlapping, and each
    # span's slice equals a rendered block text
    n = len(r["extracted_text"])
    prev_end = -len(BLOCK_SEPARATOR)
    for s in r["spans"]:
        assert 0 <= s["start"] < s["end"] <= n
        assert s["start"] >= prev_end + len(BLOCK_SEPARATOR)
        prev_end = s["end"]
    block_ids = {b["block_id"] for b in r["blocks"]}
    assert all(s["block_id"] in block_ids for s in r["spans"])


@given(prefix=_PREFIXES, body=st.text(max_size=500), idx=st.integers(0, 10_000),
       tool=st.sampled_from(["", "opaque", "x"]))
@settings(max_examples=300, deadline=None)
def test_extract_turn_total_on_fuzzed_payloads(prefix, body, idx, tool):
    text = prefix + body
    r = extract_turn(text, idx, tool)
    _check_result(text, r)


@given(body=st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_extract_turn_survives_binary_junk(body):
    text = "%BIN " + body.decode("latin-1")
    r = extract_turn(text, 1, "")
    assert r["payload_type"] == "opaque" and r["is_fallback"]


@given(
    rows=st.lists(
        st.lists(st.text(alphabet="abc|", max_size=8), min_size=1, max_size=4),
        min_size=0, max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_pdf_table_payloads_total(rows):
    lines = ["%PDFW 595 842", "word\t10\t50\t10\t20", "%TABLE 0.1 0.1 0.9 0.5"]
    for row in rows:
        lines.append("|".join(row))
    lines.append("%ENDTABLE")
    r = extract_turn("\n".join(lines), 2, "")
    _check_result("\n".join(lines), r)
    assert r["payload_type"] == "pdf"
