"""C2/C3 detector tests: the digital/scan/hybrid decision tree
(reference src/detector.py:46-64; thresholds config.py:145-146) and
its wiring into the pdf extraction route via %IMG payload regions."""

from pdf_parser_spark.kernels.detector import (
    FULL_PAGE_IMAGE_COVERAGE,
    IMAGE_AREA_THRESHOLD,
    TEXT_COVERAGE_THRESHOLD,
    detect_page_route,
    image_coverage,
    text_coverage,
)
from pdf_parser_spark.kernels.extract import extract_turn

W, H = 595.0, 842.0
AREA = W * H


def _words_covering(frac: float):
    """One word whose bbox covers `frac` of the page."""
    if frac == 0:
        return []
    side = (frac * AREA) ** 0.5
    return [{"text": "w", "x0": 0.0, "x1": side, "top": 0.0, "bottom": side}]


def _img_covering(frac: float):
    if frac == 0:
        return []
    side = (frac * AREA) ** 0.5
    return [[0.0, side, 0.0, side]]


class TestCoverages:
    def test_image_coverage_sums_areas(self):
        imgs = [[0.0, 100.0, 0.0, 100.0], [100.0, 200.0, 0.0, 50.0]]
        assert abs(image_coverage(imgs, W, H) - (10000 + 5000) / AREA) < 1e-12

    def test_empty_and_zero_area(self):
        assert image_coverage([], W, H) == 0.0
        assert text_coverage([], W, H) == 0.0
        assert image_coverage([[0, 1, 0, 1]], 0.0, 0.0) == 0.0


class TestDecisionTree:
    def test_large_image_no_text_is_scan(self):
        assert detect_page_route([], _img_covering(0.5), W, H) == "scan"

    def test_large_image_little_text_is_hybrid(self):
        # text > 0 but below TEXT_COVERAGE_THRESHOLD -> stamp over scan
        words = _words_covering(TEXT_COVERAGE_THRESHOLD / 2)
        assert detect_page_route(words, _img_covering(0.5), W, H) == "hybrid"

    def test_large_image_much_text_is_digital(self):
        words = _words_covering(0.2)
        assert detect_page_route(words, _img_covering(0.5), W, H) == "digital"

    def test_full_page_image_with_text_is_hybrid(self):
        words = _words_covering(0.2)
        imgs = _img_covering(FULL_PAGE_IMAGE_COVERAGE + 0.05)
        assert detect_page_route(words, imgs, W, H) == "hybrid"

    def test_no_image_some_text_is_digital(self):
        assert detect_page_route(_words_covering(0.05), [], W, H) == "digital"

    def test_no_image_no_text_is_scan(self):
        assert detect_page_route([], [], W, H) == "scan"

    def test_small_image_below_threshold_ignored(self):
        imgs = _img_covering(IMAGE_AREA_THRESHOLD / 2)
        assert detect_page_route(_words_covering(0.05), imgs, W, H) == "digital"


def _pdf_payload(lines):
    return "\n".join([f"%PDFW {W} {H}"] + lines)


class TestExtractRouting:
    def test_scan_payload_routes_to_ocr(self):
        # one small word + a near-full-page image -> hybrid -> OCR path
        payload = _pdf_payload(
            [
                f"%IMG 0 {W} 0 {H}",
                "stamped\t10\t90\t10\t22",
            ]
        )
        res = extract_turn(payload, 3, "")
        assert res["payload_type"] == "pdf"
        assert res["source"] == "ocr"
        assert not res["is_fallback"]  # OCR route, not the error branch
        assert "stamped" in res["extracted_text"]

    def test_digital_payload_with_small_image_keeps_layout_path(self):
        words = [
            f"alpha\t50\t250\t{60 + i * 14}\t{70 + i * 14}" for i in range(30)
        ]
        payload = _pdf_payload([f"%IMG 0 100 0 100"] + words)
        res = extract_turn(payload, 3, "")
        assert res["source"] == "digital"
        assert res["n_blocks"] if "n_blocks" in res else res["blocks"]

    def test_imageless_payload_unchanged(self):
        from pdf_parser_spark.payload import make_payload

        payload = make_payload("pdf", 7)
        res = extract_turn(payload, 1, "")
        assert res["source"] == "digital"
