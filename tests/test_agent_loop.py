"""Deterministic ReAct loop coverage (reference semantics:
services/agent/agent.py:221-308, config.py:219-220) with a scripted
stub LLM: budget exhaustion, iteration-cap forced answer, structured
and text-markup tool-call parsing, truncation, source dedup, and one
end-to-end run over the real Spark tool surface."""

from __future__ import annotations

import json

from pdf_parser_spark.agent import (
    AgentLoop,
    FORCE_ANSWER_ADDENDUM,
    ToolRegistry,
    estimate_chars,
    extract_sources,
    parse_text_tool_calls,
    strip_tool_markup,
)


class ScriptedLLM:
    """Returns queued responses; records every chat() call."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def chat(self, messages, tools):
        self.calls.append({"messages": [dict(m) for m in messages], "tools": tools})
        if self.responses:
            return self.responses.pop(0)
        return {"content": "fallback answer", "tool_calls": None}


def _reg(results=None):
    results = results or {}

    def echo_tool(**kw):
        return results.get("echo", json.dumps({"document_id": "d1", "chunk_id": "c1", "page": 1, "text": "hit"}))

    return ToolRegistry({"echo": echo_tool})


TEXT_CALL = (
    "let me look\n<tool_call><function=echo>"
    "<parameter=q>foo</parameter></function></tool_call>"
)


def test_parse_text_tool_calls_multi():
    content = (
        "<tool_call><function=search><parameter=query>a b</parameter>"
        "<parameter=k>5</parameter></function></tool_call> and "
        "<tool_call><function=get_doc><parameter=id>x</parameter>"
        "</function></tool_call>"
    )
    calls = parse_text_tool_calls(content)
    assert calls == [
        ("search", {"query": "a b", "k": "5"}),
        ("get_doc", {"id": "x"}),
    ]
    assert "tool_call" not in strip_tool_markup(content)


def test_text_markup_roundtrip_and_sources():
    llm = ScriptedLLM(
        [
            {"content": TEXT_CALL, "tool_calls": None},
            {"content": "final: found it", "tool_calls": None},
        ]
    )
    loop = AgentLoop(llm, _reg())
    res = loop.run("where is foo?")
    assert res.answer == "final: found it"
    assert res.iterations == 2
    assert not res.forced
    assert res.sources == [
        {"document_id": "d1", "chunk_id": "c1", "page": 1, "text": "hit"}
    ]
    # tool result was fed back as a user message
    fed = llm.calls[1]["messages"][-1]
    assert fed["role"] == "user" and "[Tool result: echo]" in fed["content"]


def test_structured_tool_calls():
    llm = ScriptedLLM(
        [
            {
                "content": "",
                "tool_calls": [
                    {
                        "id": "t1",
                        "function": {"name": "echo", "arguments": '{"q": "bar"}'},
                    }
                ],
            },
            {"content": "done", "tool_calls": None},
        ]
    )
    res = AgentLoop(llm, _reg()).run("q")
    assert res.answer == "done" and res.iterations == 2
    tool_msg = llm.calls[1]["messages"][-1]
    assert tool_msg["role"] == "tool" and tool_msg["tool_call_id"] == "t1"


def test_budget_exhaustion_forces_answer():
    # budget so small the very first check trips the <10% threshold
    llm = ScriptedLLM([{"content": "forced summary", "tool_calls": None}])
    loop = AgentLoop(llm, _reg(), context_budget=10)
    res = loop.run("a long question that blows the tiny budget")
    assert res.forced and res.iterations == 1
    assert res.answer == "forced summary"
    # the force-answer addendum was appended before the final call
    assert llm.calls[-1]["messages"][-1]["content"] == FORCE_ANSWER_ADDENDUM
    assert llm.calls[-1]["tools"] is None


def test_iteration_cap_forces_answer_and_last_round_has_no_tools():
    # the model keeps calling tools forever
    responses = [{"content": TEXT_CALL, "tool_calls": None} for _ in range(8)]
    responses.append({"content": "forced by cap", "tool_calls": None})
    llm = ScriptedLLM(responses)
    res = AgentLoop(llm, _reg()).run("q")
    assert res.forced and res.iterations == 8
    assert res.answer == "forced by cap"
    # iterations 1..7 offered tools; iteration 8 (the last) did not
    assert all(c["tools"] is not None for c in llm.calls[:7])
    assert llm.calls[7]["tools"] is None


def test_tool_result_truncation():
    big = "x" * 500_000

    def big_tool(**kw):
        return big

    llm = ScriptedLLM(
        [
            {"content": TEXT_CALL.replace("echo", "big"), "tool_calls": None},
            {"content": "ok", "tool_calls": None},
        ]
    )
    loop = AgentLoop(llm, ToolRegistry({"big": big_tool}), context_budget=50_000)
    res = loop.run("q")
    # the truncated-but-large result eats the budget -> forced answer
    assert res.answer == "ok" and res.forced
    fed = llm.calls[1]["messages"][-2]["content"]
    assert fed.startswith("[Tool result: big]")
    assert len(fed) < 60_000 and fed.endswith("...[truncated]")


def test_source_dedup_by_doc_chunk_page():
    lines = [
        json.dumps({"document_id": "d", "chunk_id": "c", "page": 2, "text": "a"}),
        json.dumps({"document_id": "d", "chunk_id": "c", "page": 2, "text": "dup"}),
        json.dumps({"document_id": "d", "chunk_id": "c2", "page": 2, "text": "b"}),
        "not json",
        json.dumps({"page": 9, "text": "no doc id"}),
    ]
    srcs = extract_sources(["\n".join(lines)])
    assert [s["chunk_id"] for s in srcs] == ["c", "c2"]
    assert srcs[0]["text"] == "a"  # first occurrence wins


def test_unknown_tool_and_bad_args_feed_back_errors():
    llm = ScriptedLLM(
        [
            {"content": TEXT_CALL.replace("echo", "nope"), "tool_calls": None},
            {"content": "fin", "tool_calls": None},
        ]
    )
    res = AgentLoop(llm, _reg()).run("q")
    assert res.answer == "fin"
    assert "unknown tool 'nope'" in llm.calls[1]["messages"][-1]["content"]


def test_estimate_chars_counts_tool_call_payloads():
    msgs = [
        {"role": "user", "content": "abc"},
        {
            "role": "assistant",
            "content": "",
            "tool_calls": [{"function": {"name": "fn", "arguments": '{"a":1}'}}],
        },
    ]
    assert estimate_chars(msgs) == 3 + len("fn") + len('{"a":1}')


def test_document_scoping_pins_args():
    """AgentLoop.run(document_id=...) must pin the scope onto every
    tool call (reference's forced doc scoping, agent.py:263-277)."""
    seen = []

    def scoped_tool(**kw):
        seen.append(kw)
        return "ok"

    llm = ScriptedLLM(
        [
            {"content": TEXT_CALL.replace("echo", "scoped"), "tool_calls": None},
            {"content": "done", "tool_calls": None},
        ]
    )
    res = AgentLoop(llm, ToolRegistry({"scoped": scoped_tool})).run(
        "q", document_id="conv-42"
    )
    assert res.answer == "done"
    assert seen == [{"q": "foo", "document_id": "conv-42"}]


def test_build_registry_binds_real_tools(spark):
    """build_registry wires the four engine tools; document scoping
    flows through to the per-tool scoping parameter."""
    from pdf_parser_spark.agent import build_registry
    from pdf_parser_spark.pipeline import extract_turns, synth_transcripts_df
    from pdf_parser_spark.search import doc_vectors

    extracted = extract_turns(
        synth_transcripts_df(spark, n_convs=3, seed=7), salt_buckets=4
    ).cache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    reg = build_registry(extracted, doc_vectors(docs), docs)
    assert set(reg.tools) == {
        "search_chunks", "get_document", "list_documents", "search_document_text",
    }
    conv = extracted.select("conv_id").first()["conv_id"]
    listing = reg.execute("list_documents", {}, 10_000)
    assert json.loads(listing.splitlines()[0])["document_id"]
    meta = reg.scoped(document_id=conv).execute("get_document", {}, 10_000)
    assert json.loads(meta)["document_id"] == conv
    kw = reg.scoped(document_id=conv).execute(
        "search_document_text", {"keyword": "the"}, 10_000
    )
    assert "Error" not in kw


def test_end_to_end_with_spark_tools(spark):
    """The full loop against the REAL engine tool surface: scripted LLM
    asks for a keyword search inside one conversation, the Spark plan
    runs, and the answer cites the doc."""
    from pdf_parser_spark.agent_tools import search_document_text
    from pdf_parser_spark.pipeline import extract_turns, synth_transcripts_df

    extracted = extract_turns(
        synth_transcripts_df(spark, n_convs=3, seed=7), salt_buckets=4
    )
    conv = extracted.select("conv_id").first()["conv_id"]

    def kw_tool(**kw):
        return search_document_text(
            extracted, conv_id=kw["conv_id"], keyword=kw.get("keyword", "")
        )

    call = (
        f"<tool_call><function=find><parameter=conv_id>{conv}</parameter>"
        f"<parameter=keyword>the</parameter></function></tool_call>"
    )
    llm = ScriptedLLM(
        [
            {"content": call, "tool_calls": None},
            {"content": f"answer about {conv}", "tool_calls": None},
        ]
    )
    res = AgentLoop(llm, ToolRegistry({"find": kw_tool})).run("find 'the'")
    assert res.iterations == 2
    assert conv in res.answer
    fed = llm.calls[1]["messages"][-1]["content"]
    assert fed.startswith("[Tool result: find]")


def test_extract_sources_presence_semantics():
    """Zero-valued ids are real: doc_id 0, chunk/block_id 0, page 0 all
    survive; empty text alone is not evidence; ranked hits count."""
    lines = [
        json.dumps({"rank": 1, "doc_id": 0, "similarity": 0.9}),
        json.dumps({"doc_id": 7, "block_id": 0, "page": 1}),
        json.dumps({"doc_id": 7, "page": 1}),          # distinct from block 0
        json.dumps({"document_id": "d", "page": 0, "text": "x"}),
        json.dumps({"document_id": "d1", "text": ""}),  # dropped: no evidence
    ]
    srcs = extract_sources(["\n".join(lines)])
    keys = [(s["document_id"], s["chunk_id"], s["page"]) for s in srcs]
    assert (0, "", 0) in keys          # ranked hit for doc 0
    assert (7, 0, 1) in keys           # block 0 kept...
    assert (7, "", 1) in keys          # ...and distinct from block-missing
    assert ("d", "", 0) in keys        # page 0 kept
    assert all(s["document_id"] != "d1" for s in srcs)


def test_registry_doc_id_coercion_and_empty_scoping(spark):
    """Markup-string document ids: strict ASCII integers coerce, '1_000'
    style separators pass through (loud error beats silently scoping to
    the wrong document), '' means unscoped and falls back to conv_id."""
    from pdf_parser_spark.agent import build_registry
    from pdf_parser_spark.pipeline import extract_turns, synth_transcripts_df
    from pdf_parser_spark.search import doc_vectors

    extracted = extract_turns(
        synth_transcripts_df(spark, n_convs=2, seed=7), salt_buckets=4
    ).cache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    reg = build_registry(extracted, doc_vectors(docs), docs)
    conv = extracted.select("conv_id").first()["conv_id"]
    # numeric string scopes the bigint doc_id filter TO that document
    hit = reg.execute("search_chunks", {"document_id": "3", "n_results": "2"}, 10_000)
    assert "Error" not in hit
    assert all(json.loads(l)["doc_id"] == 3 for l in hit.splitlines() if l.startswith("{"))
    # separator string is NOT silently coerced to 1000 (int('1_000')
    # would scope to the WRONG document); the tool errors loudly instead
    err = reg.execute("search_chunks", {"document_id": "1_000"}, 10_000)
    assert err.startswith("Error") or "No results" in err
    # empty markup value = unscoped: the DISCRIMINATING case — without
    # the ''->None coercion this is an ANSI cast error, with it an
    # unscoped search that succeeds
    unscoped = reg.execute("search_chunks", {"document_id": ""}, 10_000)
    assert "Error" not in unscoped and unscoped.strip().startswith("{")
    # empty markup value falls back to conv_id in the per-document tools
    meta = reg.execute(
        "get_document", {"conv_id": conv, "document_id": ""}, 10_000
    )
    assert json.loads(meta)["document_id"] == conv
