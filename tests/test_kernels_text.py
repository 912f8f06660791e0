"""Unit tests for text kernels F1-F11 (reference semantics cited in kernels)."""

from pdf_parser_spark.kernels.ocrpost import (
    clean_ocr_text,
    fix_common_ocr_errors,
    merge_broken_words,
    normalize_whitespace,
    postprocess_ocr_text,
    remove_short_lines,
)
from pdf_parser_spark.kernels.textnorm import (
    clean_ocr_artifacts,
    merge_hyphenated_words,
    normalize_text,
    remove_repeated_headers_footers,
    split_into_sentences,
)


class TestNormalizeText:
    def test_empty(self):
        assert normalize_text("") == ""
        assert normalize_text(None) == ""

    def test_control_chars_stripped_tabs_kept(self):
        assert normalize_text("a\x00b\x07c", remove_extra_whitespace=False) == "abc"
        assert normalize_text("a\tb", remove_extra_whitespace=False) == "a\tb"

    def test_multiple_spaces_collapsed(self):
        assert normalize_text("a   b    c") == "a b c"

    def test_blank_line_runs_collapse_to_one(self):
        assert normalize_text("a\n\n\n\nb") == "a\n\nb"

    def test_line_edges_stripped(self):
        assert normalize_text("  a  \n  b  ") == "a\nb"

    def test_no_whitespace_mode_still_strips_ends(self):
        assert normalize_text("  a   b  ", remove_extra_whitespace=False) == "a   b"


class TestMergeHyphenated:
    def test_docstring_example(self):
        assert merge_hyphenated_words("This is an exam-\nple") == "This is an example"

    def test_spaces_around_break(self):
        assert merge_hyphenated_words("exam- \n  ple") == "example"

    def test_non_word_not_merged(self):
        assert merge_hyphenated_words("a -\nb") == "a -\nb"


class TestHeadersFooters:
    def test_too_short_passthrough(self):
        lines = ["h", "a", "b"]
        assert remove_repeated_headers_footers(lines) == lines

    def test_repeated_header_dropped(self):
        lines = ["HDR", "a", "HDR", "b", "HDR", "c"]
        out = remove_repeated_headers_footers(lines)
        assert "HDR" not in out and out == ["a", "b", "c"]


class TestCleanOcrArtifacts:
    def test_bullets_and_punct(self):
        assert clean_ocr_artifacts("a • b") == "a b"
        assert clean_ocr_artifacts("word .") == "word."
        assert clean_ocr_artifacts("a.....b") == "a...b"


class TestSplitSentences:
    def test_split(self):
        assert split_into_sentences("One. Two! Three? four") == [
            "One.",
            "Two!",
            "Three? four",
        ]


class TestCleanOcrText:
    def test_noise_chars_removed(self):
        assert clean_ocr_text("he[llo] wo|rld stays") == "hello world stays"

    def test_repeat_runs_removed(self):
        assert clean_ocr_text("text here\n==== keep alpha") == "text here\nkeep alpha"

    def test_line_without_two_alpha_dropped(self):
        assert clean_ocr_text("good line here\n12 34 :;\nx") == "good line here"

    def test_punct_spacing(self):
        assert clean_ocr_text("word .Next word") == "word. Next word"


class TestFixCommonOcrErrors:
    def test_zero_between_letters(self):
        assert fix_common_ocr_errors("w0rld") == "wOrld"

    def test_o_between_digits(self):
        assert fix_common_ocr_errors("1O2") == "102"

    def test_one_between_letters(self):
        assert fix_common_ocr_errors("he1lo") == "hello"

    def test_l_between_digits(self):
        assert fix_common_ocr_errors("4l2") == "412"

    def test_order_matters_chain(self):
        # 'A1berto' -> 1 between letters -> l
        assert fix_common_ocr_errors("A1berto") == "Alberto"


class TestMergeBrokenWords:
    def test_merges_short_same_case(self):
        assert merge_broken_words("CO MARCA") == "COMARCA"

    def test_case_mismatch_not_merged(self):
        assert merge_broken_words("co MARCA") == "co MARCA"


class TestNormalizeWhitespace:
    def test_collapse(self):
        assert normalize_whitespace(" a \n\n\n b ") == "a\n\nb"


class TestPostprocessPipeline:
    def test_empty(self):
        assert postprocess_ocr_text("") == ""

    def test_composition(self):
        raw = "he1lo [world] here\n====\nx\nmore good text lines"
        out = postprocess_ocr_text(raw)
        assert out == "hello world here\nmore good text lines"

    def test_short_lines_dropped_by_min_length(self):
        assert remove_short_lines("abc\nab\nabcd", 3) == "abc\nabcd"
