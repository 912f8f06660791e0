"""C2/C3 page-type detector: image-area + text-coverage thresholds.

Graft of the reference's digital/scan/hybrid router
(/root/reference/src/detector.py:16-64 decision tree,
:67-103 image coverage, :106-139 text coverage; thresholds
/root/reference/config.py:145-146: IMAGE_AREA_THRESHOLD=0.3,
TEXT_COVERAGE_THRESHOLD=0.05). The transcript-domain analogue:
pdf-flavor payloads may carry "%IMG x0 x1 top bottom" region lines
(a rasterized/scanned region the payload embeds); words are the
positioned-word lines. Coverages are summed areas over the page area,
exactly as the reference computes them over pdfplumber images/words.

Routes:
    digital -> positioned-word layout path (L1-L12)
    scan    -> OCR path (the whole payload is an image)
    hybrid  -> OCR path (image with a text overlay, e.g. a stamp) —
               the reference treats hybrid as scan (detector.py:34)
"""

from __future__ import annotations

from typing import Any

# reference config.py:145-146
IMAGE_AREA_THRESHOLD = 0.3
TEXT_COVERAGE_THRESHOLD = 0.05
# reference detector.py:55 (image covering >80% of the page) and
# detector.py:61 (has-some-text floor)
FULL_PAGE_IMAGE_COVERAGE = 0.8
MIN_TEXT_COVERAGE = 0.01


def image_coverage(images: list[list[float]], width: float, height: float) -> float:
    """C2 — reference detector.py:67-103: sum of |x1-x0|*|bottom-top|
    over page area. Each image is [x0, x1, top, bottom] in page units."""
    page_area = width * height
    if not images or page_area == 0:
        return 0.0
    total = 0.0
    for x0, x1, top, bottom in images:
        total += abs(x1 - x0) * abs(bottom - top)
    return total / page_area


def text_coverage(words: list[dict[str, Any]], width: float, height: float) -> float:
    """C3 — reference detector.py:106-139: sum of word bbox areas over
    page area."""
    page_area = width * height
    if not words or page_area == 0:
        return 0.0
    total = 0.0
    for w in words:
        total += abs(w["x1"] - w["x0"]) * abs(w["bottom"] - w["top"])
    return total / page_area


def detect_page_route(
    words: list[dict[str, Any]],
    images: list[list[float]],
    width: float,
    height: float,
) -> str:
    """The reference decision tree, verbatim (detector.py:46-64):

    - large image (>30% coverage):
        - text coverage < 5%: 'hybrid' if any text else 'scan'
        - else: 'hybrid' if image covers >80% of the page else 'digital'
    - no large image: 'digital' if text coverage > 1% else 'scan'
    """
    img_cov = image_coverage(images, width, height)
    txt_cov = text_coverage(words, width, height)
    if img_cov > IMAGE_AREA_THRESHOLD:
        if txt_cov < TEXT_COVERAGE_THRESHOLD:
            return "hybrid" if txt_cov > 0 else "scan"
        if img_cov > FULL_PAGE_IMAGE_COVERAGE:
            return "hybrid"
        return "digital"
    return "digital" if txt_cov > MIN_TEXT_COVERAGE else "scan"
