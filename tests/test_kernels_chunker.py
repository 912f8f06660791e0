"""Chunker K1-K5 tests — fixtures mirror reference tests/test_chunk_builder.py semantics."""

from pdf_parser_spark.kernels.chunker import (
    build_chunks_for_turn,
    clean_chunk_text,
    is_low_value_chunk,
    split_text_chunks,
    table_to_chunks,
)


def _block(block_id="p1_b1", text=None, rows=None, btype="paragraph", conf=1.0):
    return {
        "block_id": block_id,
        "type": btype,
        "text": text,
        "bbox": [0.1, 0.1, 0.9, 0.2],
        "confidence": conf,
        "rows": rows,
        "lines": None,
    }


class TestSplitTextChunks:
    def test_short_single(self):
        assert split_text_chunks("hello world") == ["hello world"]

    def test_empty(self):
        assert split_text_chunks("   ") == []

    def test_long_text_splits_at_space(self):
        text = " ".join(["word"] * 400)  # ~2000 chars
        chunks = split_text_chunks(text)
        assert len(chunks) == 2
        assert all(len(c) <= 1200 for c in chunks)
        assert " ".join(chunks) == text

    def test_hard_wrap_no_space(self):
        text = "x" * 2500
        chunks = split_text_chunks(text)
        assert [len(c) for c in chunks] == [1200, 1200, 100]

    def test_lines_packed_greedily(self):
        lines = "\n".join(f"line number {i} with some padding text" for i in range(10))
        assert split_text_chunks(lines) == [lines]


class TestTableToChunks:
    def test_rows_joined(self):
        assert table_to_chunks([["a", "b"], ["c", "d"]]) == ["a b\nc d"]

    def test_empty_rows_skipped(self):
        assert table_to_chunks([["", " "], ["a", "b"]]) == ["a b"]

    def test_row_cap_40(self):
        rows = [[f"r{i}"] for i in range(85)]
        chunks = table_to_chunks(rows)
        assert len(chunks) == 3
        assert len(chunks[0].split("\n")) == 40

    def test_none(self):
        assert table_to_chunks(None) == []


class TestBoilerplate:
    def test_reversed_marker(self):
        assert is_low_value_chunk("xxx otnemucod o rirefnoc yyy" + "z" * 100)

    def test_two_patterns(self):
        text = "Código da Certidão: 123. assinado digitalmente por alguém" + "x" * 50
        assert is_low_value_chunk(text)

    def test_one_pattern_not_enough(self):
        assert not is_low_value_chunk("assinado digitalmente " + "conteúdo real " * 20)

    def test_certidao_url_short(self):
        assert is_low_value_chunk(
            "ver https://comunicaapi.pje.jus.br/api/v1/comunicacao/certidao aqui"
        )

    def test_fls_prefix_short(self):
        assert is_low_value_chunk("fls. 24 assinatura")

    def test_leading_hash_cleaned(self):
        assert clean_chunk_text(".dBmu9HEi CERTIDÃO conteúdo") == "CERTIDÃO conteúdo"


class TestBuildChunks:
    def test_min_chars_skip(self):
        blocks = [_block(text="fls. 24")]
        assert build_chunks_for_turn("conv_0", 1, blocks) == []

    def test_part_suffix_on_multi(self):
        text = " ".join(["word"] * 400)
        chunks = build_chunks_for_turn("conv_0", 2, [_block("p2_b1", text=text)])
        assert [c["chunk_id"] for c in chunks] == [
            "conv_0:2:p2_b1:part1",
            "conv_0:2:p2_b1:part2",
        ]
        assert chunks[0]["page_number"] == 2
        assert chunks[0]["block_id"] == "p2_b1:part1"

    def test_single_chunk_no_suffix(self):
        text = "a meaningful paragraph with quite enough characters in it yes"
        chunks = build_chunks_for_turn("c", 1, [_block(text=text)])
        assert chunks[0]["chunk_id"] == "c:1:p1_b1"

    def test_table_block_rows_path(self):
        rows = [[f"cell {i} alpha", f"cell {i} beta"] for i in range(6)]
        chunks = build_chunks_for_turn("c", 1, [_block("p1_t0", rows=rows, btype="table")])
        assert len(chunks) == 1
        assert chunks[0]["block_type"] == "table"
        assert "cell 0 alpha cell 0 beta" in chunks[0]["text"]
