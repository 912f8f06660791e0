"""Chunking + boilerplate-strip kernels (K1-K5 in SURVEY.md §2.7).

reference: services/search/chunk_builder.py:28-186. Greedy packing
loops kept order-identical; all thresholds and regexes match.
"""

from __future__ import annotations

import re
from typing import Any

MIN_CHUNK_CHARS = 50
MAX_TEXT_CHUNK_CHARS = 1200
MAX_TABLE_CHUNK_CHARS = 1200
MAX_TABLE_CHUNK_ROWS = 40

_LEADING_NOISE_RE = re.compile(r"^\.[A-Za-z0-9]{6,12}\s+")
_BOILERPLATE_PATTERNS = (
    re.compile(r"certid[aã]o de (publica[cç][aã]o|remessa) de rela[cç][aã]o", re.I),
    re.compile(r"c[oó]digo da certid[aã]o", re.I),
    re.compile(r"para conferir o original, acesse o site", re.I),
    re.compile(r"este documento [ée] c[oó]pia do original", re.I),
    re.compile(r"assinad[oa] digitalmente", re.I),
    re.compile(r"odanissa etnemlatigid", re.I),
    re.compile(r"otnemucod o rirefnoc", re.I),
)
_CERTIDAO_URL_RE = re.compile(r"https?://comunicaapi\.pje\.jus\.br/.*/certidao", re.I)


def clean_chunk_text(text: str) -> str:
    """K4 — reference: services/search/chunk_builder.py:46-48."""
    return _LEADING_NOISE_RE.sub("", text)


def table_to_chunks(rows: list[list[str]] | None) -> list[str]:
    """K3 — reference: services/search/chunk_builder.py:51-79.

    Rows become space-joined lines packed into chunks of <= 40 rows and
    <= 1200 chars (row length counted with a +1 separator).
    """
    if not rows:
        return []
    chunks: list[str] = []
    current_rows: list[str] = []
    current_chars = 0
    for row in rows:
        row_text = " ".join(cell.strip() for cell in row if cell and cell.strip())
        if not row_text:
            continue
        row_len = len(row_text) + 1
        too_many_rows = len(current_rows) >= MAX_TABLE_CHUNK_ROWS
        too_many_chars = current_chars + row_len > MAX_TABLE_CHUNK_CHARS
        if current_rows and (too_many_rows or too_many_chars):
            chunks.append("\n".join(current_rows))
            current_rows = []
            current_chars = 0
        current_rows.append(row_text)
        current_chars += row_len
    if current_rows:
        chunks.append("\n".join(current_rows))
    return chunks


def split_text_chunks(text: str, max_chars: int = MAX_TEXT_CHUNK_CHARS) -> list[str]:
    """K2 — reference: services/search/chunk_builder.py:82-124.

    Non-empty stripped lines are the segments; over-long segments are
    hard-wrapped at the last space past the midpoint; remaining segments
    greedily packed into <= max_chars chunks.
    """
    stripped = text.strip()
    if not stripped:
        return []
    lines = [line.strip() for line in stripped.splitlines() if line.strip()]
    segments = lines or [stripped]

    chunks: list[str] = []
    current: list[str] = []
    current_chars = 0
    for segment in segments:
        while len(segment) > max_chars:
            head = segment[:max_chars]
            split_at = head.rfind(" ")
            if split_at < max_chars // 2:
                split_at = max_chars
            piece = segment[:split_at].strip()
            if current:
                chunks.append("\n".join(current))
                current = []
                current_chars = 0
            if piece:
                chunks.append(piece)
            segment = segment[split_at:].strip()

        seg_len = len(segment) + 1
        if current and (current_chars + seg_len > max_chars):
            chunks.append("\n".join(current))
            current = []
            current_chars = 0
        if segment:
            current.append(segment)
            current_chars += seg_len

    if current:
        chunks.append("\n".join(current))
    return chunks


def is_low_value_chunk(text: str) -> bool:
    """K5 — reference: services/search/chunk_builder.py:127-144.

    Boilerplate score: reversed-OCR marker is an instant drop; >= 2
    pattern hits drop; certidão-URL stub under 600 chars drops;
    ``fls. ``-prefixed signature stubs under 120 chars drop.
    """
    lowered = text.lower()
    match_count = sum(1 for pattern in _BOILERPLATE_PATTERNS if pattern.search(text))
    if "otnemucod o rirefnoc" in lowered:
        return True
    if match_count >= 2:
        return True
    if _CERTIDAO_URL_RE.search(text) and len(text) < 600:
        return True
    return lowered.startswith("fls. ") and len(text) < 120


def build_chunks_for_turn(
    conv_id: str,
    turn_idx: int,
    blocks: list[dict[str, Any]],
    source_file: str = "",
) -> list[dict[str, Any]]:
    """K1 — reference: services/search/chunk_builder.py:147-186.

    Graft mapping: document_id=conv_id, page_number=turn_idx. Returns
    flat chunk dicts matching the TextChunk shape
    (chunk_builder.py:13-26).
    """
    chunks: list[dict[str, Any]] = []
    for block in blocks:
        block_text = (block.get("text") or "").strip()
        if block_text:
            candidates = split_text_chunks(block_text)
        else:
            candidates = []
            for table_chunk in table_to_chunks(block.get("rows")):
                candidates.extend(split_text_chunks(table_chunk))

        total_parts = len(candidates)
        for idx, raw_text in enumerate(candidates, start=1):
            text = clean_chunk_text(raw_text.strip())
            if len(text) < MIN_CHUNK_CHARS:
                continue
            if is_low_value_chunk(text):
                continue
            part_suffix = f":part{idx}" if total_parts > 1 else ""
            chunks.append(
                {
                    "chunk_id": f"{conv_id}:{turn_idx}:{block['block_id']}{part_suffix}",
                    "document_id": conv_id,
                    "source_file": source_file,
                    "page_number": turn_idx,
                    "block_id": f"{block['block_id']}{part_suffix}",
                    "block_type": str(block.get("type", "paragraph")),
                    "text": text,
                    "confidence": float(block.get("confidence", 1.0)),
                }
            )
    return chunks
