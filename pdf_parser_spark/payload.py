"""Transcript payload format, classifier, and deterministic synthesizer.

The graft input is a table ``transcripts(conv_id string, turn_idx int,
role string, text string, tool string, ts timestamp)`` (BASELINE.json
``input_hint``). Each turn's ``text`` carries one payload flavor
(FIXTURES.md §1), mirroring the reference's page types
(src/detector.py:17-64 routes digital/scan/hybrid):

- ``pdf``     positioned-word content stream  -> digital layout path (L1-L12, T1-T2)
- ``html``    markup with boilerplate          -> DOM-heuristic strip (htmlstrip)
- ``ocr``     noisy plain text                 -> OCR postprocess path (F6-F11)
- ``tess``    tesseract-shaped word dict JSON  -> structural grouping (O4)
- ``doctr``   doctr-shaped tree JSON           -> structural parse (O3)
- ``opaque``  unparseable                      -> fallback branch (ocr_fallback_rate)

Serialized formats
------------------
pdf:    "%PDFW <w> <h>" header; one word per line "text\\tx0\\tx1\\ttop\\tbottom";
        optional table region "%TABLE x1 y1 x2 y2" .. rows of "a|b|c" .. "%ENDTABLE"
        (camelot-analogue, bbox already normalized & top-origin — the
        reference flips camelot's Y on ingest at src/extractors/tables.py:70-75);
        optional image region "%IMG x0 x1 top bottom" (page units) — the
        embedded-scan analogue feeding the C2/C3 digital/scan/hybrid
        router (kernels/detector.py; reference src/detector.py:67-103).
tess:   "%TESS " + JSON parallel-array dict (FIXTURES.md §4)
doctr:  "%DOCTR " + JSON page tree (FIXTURES.md §4)
opaque: "%BIN " + junk (or tool == 'opaque')
html:   first non-space char is '<'
ocr:    anything else
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

PDF_HEADER = "%PDFW"
TABLE_MARK = "%TABLE"
TABLE_END = "%ENDTABLE"
IMG_MARK = "%IMG"
TESS_MARK = "%TESS "
DOCTR_MARK = "%DOCTR "
OPAQUE_MARK = "%BIN"

PAYLOAD_TYPES = ("pdf", "html", "ocr", "tess", "doctr", "opaque")


def classify_payload(text: str | None, tool: str | None) -> str:
    """C1 analogue — the digital/scan router (reference src/detector.py:46-64)
    re-based on payload features, same decision-tree shape."""
    if tool == "opaque":
        return "opaque"
    if not text or not text.strip():
        return "opaque"
    if text.startswith(PDF_HEADER):
        return "pdf"
    if text.startswith(TESS_MARK):
        return "tess"
    if text.startswith(DOCTR_MARK):
        return "doctr"
    if text.startswith(OPAQUE_MARK):
        return "opaque"
    if text.lstrip()[:1] == "<":
        return "html"
    return "ocr"


def parse_pdf_payload(
    text: str,
) -> tuple[
    list[dict[str, Any]],
    list[tuple[list[float], list[list[str]]]],
    float,
    float,
    str,
    list[list[float]],
]:
    """Parse a pdf-flavor payload into pdfplumber-shaped word dicts
    (L1 analogue) plus table regions and image regions. Returns
    (words, tables, width, height, full_text, images) where each table
    is (normalized bbox, rows) and each image is [x0, x1, top, bottom]
    in page units (the C2 detector input, reference detector.py:85-95)."""
    lines = text.split("\n")
    header = lines[0].split()
    width = float(header[1]) if len(header) > 2 else 595.0
    height = float(header[2]) if len(header) > 2 else 842.0

    words: list[dict[str, Any]] = []
    tables: list[tuple[list[float], list[list[str]]]] = []
    images: list[list[float]] = []
    full_parts: list[str] = []
    i = 1
    while i < len(lines):
        line = lines[i]
        if line.startswith(IMG_MARK + " "):
            parts = line.split()
            if len(parts) == 5:
                images.append([float(parts[1]), float(parts[2]), float(parts[3]), float(parts[4])])
        elif line.startswith(TABLE_MARK):
            parts = line.split()
            tbbox = [float(parts[1]), float(parts[2]), float(parts[3]), float(parts[4])]
            rows: list[list[str]] = []
            i += 1
            while i < len(lines) and not lines[i].startswith(TABLE_END):
                rows.append(lines[i].split("|"))
                i += 1
            tables.append((tbbox, rows))
        elif line.strip():
            f = line.split("\t")
            if len(f) == 5:
                words.append(
                    {
                        "text": f[0],
                        "x0": float(f[1]),
                        "x1": float(f[2]),
                        "top": float(f[3]),
                        "bottom": float(f[4]),
                    }
                )
                full_parts.append(f[0])
        i += 1
    return words, tables, width, height, " ".join(full_parts), images


# ---------------------------------------------------------------------------
# Deterministic synthesizer (seeded; no Date.now/randomness at call time)
# ---------------------------------------------------------------------------

_VOCAB = (
    "data spark shuffle partition column query plan batch arrow vector "
    "extract layout reading order block table chunk span text turn conv "
    "window join filter scan sort merge salt skew executor driver task "
    "parquet schema struct array nested golden fixture oracle metric"
).split()

_NOISY_LINES = [
    "N0ISY l1ne with c0nfusions",
    "==== ==== ====",
    "| bracketed [noise] {chars} <here> |",
    "A1berto sa1d he11o w0rld again",
    "x1",
    "valid sentence with enough alpha characters.",
    "Some MORE text , with bad spacing .",
    "trailing line of cleanish text here",
]

_BOILER_NAV = '<nav><a href="/">home</a> <a href="/a">one</a> <a href="/b">two</a></nav>'
_BOILER_FOOTER = "<footer>© site — <a href='/tos'>terms</a> <a href='/priv'>privacy</a></footer>"


def _h(*parts: Any) -> int:
    """Deterministic 64-bit hash for synthesis decisions (stable across
    runs/processes, unlike Python's salted ``hash``)."""
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(), "big")


def _word(seed: int, i: int) -> str:
    return _VOCAB[_h(seed, i) % len(_VOCAB)]


def _make_pdf_payload(seed: int) -> str:
    """Positioned words over 1-2 columns + paragraph gaps + optional table."""
    w, h = 595.0, 842.0
    two_col = _h(seed, "col") % 4 == 0
    n_paras = 2 + _h(seed, "np") % 3
    out = [f"{PDF_HEADER} {w} {h}"]
    y = 60.0
    for p in range(n_paras):
        col = p % 2 if two_col else 0
        x_base = 50.0 if col == 0 else 320.0
        n_lines = 2 + _h(seed, p, "nl") % 3
        for li in range(n_lines):
            x = x_base
            n_words = 3 + _h(seed, p, li, "nw") % 5
            for wi in range(n_words):
                word = _word(seed, p * 100 + li * 10 + wi)
                x1 = x + 8.0 * len(word)
                out.append(f"{word}\t{x}\t{x1}\t{y}\t{y + 10.0}")
                x = x1 + 4.0
            y += 14.0
        y += 40.0  # paragraph gap (> 0.03 * 842 = 25.3)
    if _h(seed, "tbl") % 3 == 0:
        ty0 = y / h
        ty1 = min((y + 80.0) / h, 0.99)
        out.append(f"{TABLE_MARK} 0.1 {ty0:.6f} 0.9 {ty1:.6f}")
        for r in range(3):
            out.append("|".join(_word(seed, 900 + r * 10 + c) for c in range(3)))
        out.append(TABLE_END)
        # a text line inside the table region to exercise T2 overlap dedup
        ty_abs = y + 20.0
        out.insert(
            len(out) - 5,
            f"ghost\t{0.2 * w}\t{0.6 * w}\t{ty_abs}\t{ty_abs + 10.0}",
        )
    return "\n".join(out)


def _make_html_payload(seed: int) -> str:
    paras = []
    for p in range(2 + _h(seed, "hp") % 3):
        words = " ".join(_word(seed, 500 + p * 20 + i) for i in range(12 + _h(seed, p) % 20))
        paras.append(f"<p>{words}.</p>")
    hyph = "<p>This is an exam-\nple of a hyphen-\nated paragraph with enough words here.</p>"
    table = ""
    if _h(seed, "ht") % 3 == 0:
        rows = "".join(
            "<tr>" + "".join(f"<td> {_word(seed, 800 + r * 5 + c)} </td>" for c in range(3)) + "</tr>"
            for r in range(4)
        )
        table = f"<table>{rows}</table>"
    linky = '<div><a href="/x">share</a> <a href="/y">like</a> <a href="/z">follow</a></div>'
    return (
        f"<html><body>{_BOILER_NAV}<h1>Title {_word(seed, 1)}</h1>"
        + "".join(paras)
        + hyph
        + table
        + linky
        + f"{_BOILER_FOOTER}</body></html>"
    )


def _make_ocr_payload(seed: int) -> str:
    n = 4 + _h(seed, "on") % 4
    lines = [_NOISY_LINES[_h(seed, "ol", i) % len(_NOISY_LINES)] for i in range(n)]
    extra = " ".join(_word(seed, 700 + i) for i in range(8))
    lines.append(f"closing words {extra} end.")
    # blank line splits into two pseudo-blocks
    lines.insert(n // 2, "")
    return "\n".join(lines)


def _make_tess_payload(seed: int) -> str:
    words, confs, blocks_, lefts, tops, widths, heights = [], [], [], [], [], [], []
    for b in range(2):
        for i in range(4):
            words.append(_word(seed, b * 10 + i))
            confs.append(55 + (_h(seed, b, i) % 40))
            blocks_.append(b + 1)
            lefts.append(40 + i * 90)
            tops.append(60 + b * 200)
            widths.append(80)
            heights.append(12)
    data = {
        "text": words,
        "conf": confs,
        "block_num": blocks_,
        "left": lefts,
        "top": tops,
        "width": widths,
        "height": heights,
        "page_width": 595.0,
        "page_height": 842.0,
    }
    return TESS_MARK + json.dumps(data, sort_keys=True)


def _make_doctr_payload(seed: int) -> str:
    pages = [
        {
            "blocks": [
                {
                    "lines": [
                        {
                            "words": [
                                {"value": _word(seed, b * 20 + li * 5 + wi), "confidence": 0.85}
                                for wi in range(3)
                            ],
                            "geometry": [
                                [0.1, 0.1 + b * 0.3 + li * 0.05],
                                [0.8, 0.13 + b * 0.3 + li * 0.05],
                            ],
                        }
                        for li in range(2)
                    ]
                }
                for b in range(2)
            ]
        }
    ]
    return DOCTR_MARK + json.dumps(pages, sort_keys=True)


def make_payload(flavor: str, seed: int) -> str:
    if flavor == "pdf":
        return _make_pdf_payload(seed)
    if flavor == "html":
        return _make_html_payload(seed)
    if flavor == "ocr":
        return _make_ocr_payload(seed)
    if flavor == "tess":
        return _make_tess_payload(seed)
    if flavor == "doctr":
        return _make_doctr_payload(seed)
    return f"{OPAQUE_MARK} \x89PNG-not-parseable {seed}"


def _pick_flavor(conv: int, turn: int, seed: int) -> str:
    r = _h(seed, conv, turn, "flavor") % 100
    if r < 45:
        return "pdf"
    if r < 70:
        return "html"
    if r < 88:
        return "ocr"
    if r < 92:
        return "tess"
    if r < 96:
        return "doctr"
    return "opaque"


def synth_transcripts(
    n_convs: int = 20,
    seed: int = 42,
    heavy_every: int = 50,
    heavy_factor: int = 40,
    base_epoch: int = 1_700_000_000,
):
    """Deterministic transcript rows (FIXTURES.md §1).

    Conversation lengths are skewed: every ``heavy_every``-th conv gets
    ``heavy_factor``x the median turns, to exercise salting. Rows come
    back in a deterministically *shuffled* order so the pipeline must
    restore stable (conv_id, turn_idx) ordering itself.

    Returns a list of row dicts (conv_id, turn_idx, role, text, tool, ts);
    ts is epoch seconds (int) — callers cast to timestamp.
    """
    roles = ["user", "assistant", "tool"]
    rows: list[dict[str, Any]] = []
    for c in range(n_convs):
        n_turns = 3 + _h(seed, c, "len") % 18
        if heavy_every and c % heavy_every == heavy_every - 1:
            n_turns *= heavy_factor
        for t in range(n_turns):
            flavor = _pick_flavor(c, t, seed)
            rows.append(
                {
                    "conv_id": f"conv_{c:06d}",
                    "turn_idx": t,
                    "role": roles[t % 3],
                    "text": make_payload(flavor, _h(seed, c, t, "pay") % (2**31)),
                    "tool": "opaque" if flavor == "opaque" and _h(seed, c, t) % 2 == 0 else "",
                    # day offset capped at 10 years: keeps ts within
                    # pandas' ns-timestamp range for any corpus size
                    "ts": base_epoch + (c % 3650) * 86_400 + t * 60,
                }
            )
    rows.sort(key=lambda r: _h(seed, r["conv_id"], r["turn_idx"], "shuffle"))
    return rows
