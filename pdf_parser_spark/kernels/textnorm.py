"""Text normalization kernels (F1-F5 in SURVEY.md §2.6).

reference: src/utils/text_normalizer.py:8-128. Pure ``str -> str``
functions; byte-identical semantics to the reference (same regexes,
same stateful blank-line collapse).
"""

from __future__ import annotations

import re

_CONTROL_RE = re.compile(r"[\x00-\x08\x0B-\x0C\x0E-\x1F\x7F]")
_MULTI_SPACE_RE = re.compile(r" +")
_HYPHEN_BREAK_RE = re.compile(r"(\w+)-\s*\n\s*(\w+)")
_BULLET_RE = re.compile(r"\s[•·∙■□▪▫]\s")
_SPACE_BEFORE_PUNCT_RE = re.compile(r"\s+([.,;:!?])")
_MULTI_DOT_RE = re.compile(r"\.{3,}")
_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-ZÀ-Ú])")


def _collapse_blank_lines(lines: list[str]) -> list[str]:
    """Stateful collapse of runs of empty lines to a single empty line."""
    out: list[str] = []
    prev_empty = False
    for line in lines:
        if line:
            out.append(line)
            prev_empty = False
        elif not prev_empty:
            out.append("")
            prev_empty = True
    return out


def normalize_text(text: str, remove_extra_whitespace: bool = True) -> str:
    """F1 — reference: src/utils/text_normalizer.py:8-45."""
    if not text:
        return ""
    text = _CONTROL_RE.sub("", text)
    if remove_extra_whitespace:
        text = _MULTI_SPACE_RE.sub(" ", text)
        lines = [line.strip() for line in text.split("\n")]
        text = "\n".join(_collapse_blank_lines(lines))
    return text.strip()


def merge_hyphenated_words(text: str) -> str:
    """F2 — reference: src/utils/text_normalizer.py:48-57."""
    return _HYPHEN_BREAK_RE.sub(r"\1\2", text)


def remove_repeated_headers_footers(
    lines: list[str], min_repetitions: int = 3
) -> list[str]:
    """F3 — reference: src/utils/text_normalizer.py:60-103.

    Lines whose stripped form appears >= min_repetitions times anywhere
    AND shows up in the first/last 5 lines are dropped everywhere.
    """
    if len(lines) < min_repetitions * 2:
        return lines

    def _candidates(window: list[str]) -> list[str]:
        found = []
        for line in window:
            if line.strip():
                count = sum(1 for ln in lines if ln.strip() == line.strip())
                if count >= min_repetitions:
                    found.append(line.strip())
        return found

    header_candidates = _candidates(lines[:5])
    footer_candidates = _candidates(lines[-5:])
    return [
        line
        for line in lines
        if line.strip() not in header_candidates
        and line.strip() not in footer_candidates
    ]


def clean_ocr_artifacts(text: str) -> str:
    """F4 — reference: src/utils/text_normalizer.py:106-119."""
    text = _BULLET_RE.sub(" ", text)
    text = _SPACE_BEFORE_PUNCT_RE.sub(r"\1", text)
    text = _MULTI_DOT_RE.sub("...", text)
    return text


def split_into_sentences(text: str) -> list[str]:
    """F5 — reference: src/utils/text_normalizer.py:122-128."""
    sentences = _SENTENCE_SPLIT_RE.split(text)
    return [s.strip() for s in sentences if s.strip()]
