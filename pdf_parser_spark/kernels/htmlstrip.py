"""HTML main-content extraction (DOM-heuristic boilerplate strip).

Graft extension mandated by the north rule: the reference strips
boilerplate with a "score >= k => drop" pattern classifier
(services/search/chunk_builder.py:127-144, K5); this module applies the
same decision shape to HTML payloads using link-density and
text-block scoring (the classic Boilerpipe/Readability heuristics,
re-derived from their published descriptions — Kohlschütter et al.,
WSDM 2010 — not from any implementation).

Deterministic: stdlib ``html.parser`` only, no external libs.

Output block dicts share the schema of layout.extract_digital_blocks;
HTML has no geometry, so blocks get synthetic top-to-bottom bboxes
(block i of n occupies the [i/n, (i+0.8)/n] vertical slice), which
keeps every downstream geometric kernel (band sort, overlap dedup,
span assembly) well-defined and order-preserving.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any

from .chunker import is_low_value_chunk
from .tables import drop_empty_rows, merge_table_cells, normalize_table_data
from .textnorm import merge_hyphenated_words, normalize_text

# Elements that open a new candidate text block.
_BLOCK_TAGS = frozenset(
    ["p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "article", "section"]
)
# Whole subtrees that are boilerplate by construction.
_STRIP_TAGS = frozenset(["script", "style", "noscript", "template"])
# Structural containers scored as boilerplate context.
_BOILERPLATE_CONTEXT_TAGS = frozenset(["nav", "footer", "header", "aside"])

_HEADER_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

LINK_DENSITY_THRESHOLD = 0.5   # drop when > 50% of chars are anchor text
MIN_TEXT_BLOCK_CHARS = 2       # C6 analogue — reference: src/pipeline.py:162
SHORT_LINKY_CHARS = 80         # short + any links => nav-like
SHORT_LINKY_DENSITY = 0.2


class _BlockCollector(HTMLParser):
    """Single-pass DOM walk collecting text blocks + tables in order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.raw_blocks: list[dict[str, Any]] = []
        self._text_parts: list[str] = []
        self._link_chars = 0
        self._anchor_depth = 0
        self._strip_depth = 0
        self._boiler_depth = 0
        self._block_tag = "p"
        # table state
        self._table_depth = 0
        self._rows: list[list[str]] = []
        self._cells: list[str] = []
        self._cell_parts: list[str] = []
        self._in_cell = False

    def _flush_text_block(self) -> None:
        text = "".join(self._text_parts)
        if text.strip():
            self.raw_blocks.append(
                {
                    "kind": "text",
                    "tag": self._block_tag,
                    "text": text,
                    "link_chars": self._link_chars,
                    "in_boilerplate_context": self._boiler_depth > 0,
                }
            )
        self._text_parts = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in _STRIP_TAGS:
            self._strip_depth += 1
            return
        if self._strip_depth:
            return
        if tag == "table":
            self._flush_text_block()
            self._table_depth += 1
            if self._table_depth == 1:
                self._rows = []
            return
        if self._table_depth:
            if tag == "tr":
                self._cells = []
            elif tag in ("td", "th"):
                self._in_cell = True
                self._cell_parts = []
            return
        if tag in _BOILERPLATE_CONTEXT_TAGS:
            self._flush_text_block()
            self._boiler_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush_text_block()
            self._block_tag = tag
            return
        if tag == "a":
            self._anchor_depth += 1
        elif tag == "br":
            self._text_parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _STRIP_TAGS:
            self._strip_depth = max(0, self._strip_depth - 1)
            return
        if self._strip_depth:
            return
        if tag == "table":
            if self._table_depth == 1 and self._rows:
                self.raw_blocks.append({"kind": "table", "rows": self._rows})
            self._table_depth = max(0, self._table_depth - 1)
            return
        if self._table_depth:
            if tag in ("td", "th"):
                self._cells.append("".join(self._cell_parts))
                self._in_cell = False
            elif tag == "tr":
                if self._cells:
                    self._rows.append(self._cells)
                self._cells = []
            return
        if tag in _BOILERPLATE_CONTEXT_TAGS:
            self._flush_text_block()
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush_text_block()
            self._block_tag = "p"
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._strip_depth:
            return
        if self._table_depth:
            if self._in_cell:
                self._cell_parts.append(data)
            return
        self._text_parts.append(data)
        if self._anchor_depth:
            self._link_chars += len(data.strip())

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush_text_block()


def boilerplate_score(text: str, link_chars: int, in_boiler_context: bool) -> int:
    """Link-density / text-block score with the K5 'score >= 2 => drop'
    shape (reference: chunk_builder.py:130-137 uses >= 2 pattern hits).
    """
    stripped = text.strip()
    n = len(stripped)
    density = link_chars / n if n else 0.0
    score = 0
    if in_boiler_context:
        score += 2
    if density > LINK_DENSITY_THRESHOLD:
        score += 2
    elif density > SHORT_LINKY_DENSITY and n < SHORT_LINKY_CHARS:
        score += 1
    if n < SHORT_LINKY_CHARS and link_chars > 0:
        score += 1
    if is_low_value_chunk(stripped):
        score += 2
    return score


def extract_html_blocks(html: str, page_number: int) -> list[dict[str, Any]]:
    """Parse an HTML payload into main-content blocks + tables.

    Text blocks: id ``p{N}_b{M}``; table blocks: id ``p{N}_t{K}``
    (table-id convention from reference src/extractors/tables.py:77-78).
    Blocks keep document order; synthetic bboxes encode that order.
    """
    parser = _BlockCollector()
    parser.feed(html)
    parser.close()

    kept: list[dict[str, Any]] = []
    for raw in parser.raw_blocks:
        if raw["kind"] == "table":
            rows = normalize_table_data(merge_table_cells(drop_empty_rows(raw["rows"])))
            if rows:
                kept.append({"kind": "table", "rows": rows})
            continue
        score = boilerplate_score(raw["text"], raw["link_chars"], raw["in_boilerplate_context"])
        if score >= 2:
            continue
        text = normalize_text(merge_hyphenated_words(raw["text"]))
        if len(text.strip()) < MIN_TEXT_BLOCK_CHARS:
            continue
        btype = "header" if raw["tag"] in _HEADER_TAGS else ("list" if raw["tag"] == "li" else "paragraph")
        kept.append({"kind": "text", "text": text, "type": btype})

    n = max(len(kept), 1)
    blocks: list[dict[str, Any]] = []
    b_counter = 0
    t_counter = 0
    for i, item in enumerate(kept):
        y0 = i / n
        y1 = (i + 0.8) / n
        if item["kind"] == "table":
            t_counter += 1
            blocks.append(
                {
                    "block_id": f"p{page_number}_t{t_counter}",
                    "type": "table",
                    "text": None,
                    "bbox": [0.05, y0, 0.95, y1],
                    "confidence": 1.0,
                    "rows": item["rows"],
                    "lines": None,
                }
            )
        else:
            b_counter += 1
            blocks.append(
                {
                    "block_id": f"p{page_number}_b{b_counter}",
                    "type": item["type"],
                    "text": item["text"],
                    "bbox": [0.05, y0, 0.95, y1],
                    "confidence": 1.0,
                    "rows": None,
                    "lines": None,
                }
            )
    return blocks
