"""OCR post-processing kernels (F6-F11 in SURVEY.md §2.6).

reference: src/utils/ocr_postprocess.py:14-222. The ordered regex
chain in ``fix_common_ocr_errors`` is encoded as an explicit list —
iteration order is load-bearing (reference iterates an insertion-
ordered dict at ocr_postprocess.py:101-102).
"""

from __future__ import annotations

import re

_NOISE_CHARS_RE = re.compile(r"[|\\{}\[\]<>©®™°§¶†‡•◦▪▫●○◆◇★☆♦♠♣♥]")
_REPEAT_RUN_RE = re.compile(r"([=\-_*#~])\1{3,}")
_SPACE_PUNCT_RE = re.compile(r"\s+([.,;:!?)])")
_PUNCT_NO_SPACE_RE = re.compile(r"([.,;:!?])([A-ZÀ-Úa-zà-ú])")
_MULTI_BLANK_RE = re.compile(r"[ \t]+")
_ALPHA_RE = re.compile(r"[A-Za-zÀ-ú]")

# (pattern, replacement) in reference insertion order:
# src/utils/ocr_postprocess.py:82-99
_OCR_CORRECTIONS: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"\bRN\b"), "RN"),
    (re.compile(r"l<"), "k"),
    (re.compile(r"\bl\b(?=[A-Z])"), "I"),
    (re.compile(r"(?<=[a-z])O(?=[a-z])"), "o"),
    (re.compile(r"(?<=[A-Z])o(?=[A-Z])"), "O"),
    (re.compile(r"(?<=[A-Za-z])0(?=[A-Za-z])"), "O"),
    (re.compile(r"(?<=[0-9])O(?=[0-9])"), "0"),
    (re.compile(r"(?<=[A-Za-z])1(?=[A-Za-z])"), "l"),
    (re.compile(r"(?<=[0-9])l(?=[0-9])"), "1"),
    (re.compile(r"\bDl<\b"), "DK"),
    (re.compile(r"\bNQ\b"), "Nº"),
    (re.compile(r"\bn2\b"), "nº"),
    (re.compile(r"\bNR\b"), "NR"),
]


def clean_ocr_text(text: str) -> str:
    """F6 — reference: src/utils/ocr_postprocess.py:14-53.

    Noise-char strip, repeated-run strip, punctuation spacing fixes,
    space collapse, then drop lines with fewer than 2 alphabetic chars.
    """
    if not text:
        return ""
    text = _NOISE_CHARS_RE.sub("", text)
    text = _REPEAT_RUN_RE.sub("", text)
    text = _SPACE_PUNCT_RE.sub(r"\1", text)
    text = _PUNCT_NO_SPACE_RE.sub(r"\1 \2", text)
    text = _MULTI_BLANK_RE.sub(" ", text)
    kept = []
    for line in text.split("\n"):
        line = line.strip()
        if len(_ALPHA_RE.findall(line)) >= 2:
            kept.append(line)
    return "\n".join(kept).strip()


def remove_short_lines(text: str, min_length: int = 3) -> str:
    """F7 — reference: src/utils/ocr_postprocess.py:56-69."""
    lines = text.split("\n")
    return "\n".join(line for line in lines if len(line.strip()) >= min_length)


def fix_common_ocr_errors(text: str) -> str:
    """F8 — reference: src/utils/ocr_postprocess.py:72-104 (ordered)."""
    for pattern, replacement in _OCR_CORRECTIONS:
        text = pattern.sub(replacement, text)
    return text


def merge_broken_words(text: str, min_word_length: int = 4) -> str:
    """F9 — reference: src/utils/ocr_postprocess.py:107-155.

    Off by default in the reference main path (merge_words=False at
    src/pipeline.py:158,377); shipped for parity, kept off.
    """
    fixed_lines = []
    for line in text.split("\n"):
        words = line.split()
        if len(words) < 2:
            fixed_lines.append(line)
            continue
        merged: list[str] = []
        i = 0
        while i < len(words):
            word = words[i]
            if (
                len(word) <= 2
                and i + 1 < len(words)
                and len(words[i + 1]) >= 2
                and word.isupper() == words[i + 1].isupper()
            ):
                merged.append(word + words[i + 1])
                i += 2
            else:
                merged.append(word)
                i += 1
        fixed_lines.append(" ".join(merged))
    return "\n".join(fixed_lines)


def normalize_whitespace(text: str) -> str:
    """F10 — reference: src/utils/ocr_postprocess.py:158-182."""
    lines = [line.strip() for line in text.split("\n")]
    cleaned: list[str] = []
    prev_empty = False
    for line in lines:
        if line:
            cleaned.append(line)
            prev_empty = False
        elif not prev_empty:
            cleaned.append("")
            prev_empty = True
    return "\n".join(cleaned).strip()


def postprocess_ocr_text(
    text: str,
    clean: bool = True,
    fix_errors: bool = True,
    merge_words: bool = False,
    min_line_length: int = 3,
) -> str:
    """F11 — reference: src/utils/ocr_postprocess.py:185-222."""
    if not text:
        return ""
    if clean:
        text = clean_ocr_text(text)
    if fix_errors:
        text = fix_common_ocr_errors(text)
    if merge_words:
        text = merge_broken_words(text)
    if min_line_length > 0:
        text = remove_short_lines(text, min_line_length)
    return normalize_whitespace(text)
