"""Deterministic ReAct agent loop over the §2.10 tool surface.

Re-expresses the reference's agent runner (reference:
services/agent/agent.py:221-308 loop; config.py:219-220 limits) as a
model-agnostic, fully testable control loop: every decision — iteration
cap, context-budget tracking, forced answer below 10% budget, tool-call
parsing (structured AND Qwen-style text markup), per-call result
truncation, source dedup by {doc}:{chunk}:{page} — is deterministic
given a scripted LLM, so the whole loop is covered by pytest with a
stub model (tests/test_agent_loop.py). Only the LLM itself is injected;
the engine side (the four tools in agent_tools.py) runs real Spark
plans.

Semantics mirrored from the reference:
- max 8 iterations, 400k-char context budget (config.py:219-220)
- budget is estimated in characters over all message content and
  tool-call payloads (agent.py:60-69), ~4 chars/token
- when remaining budget < 10%, append the force-answer addendum and
  ask for a final answer with no tools (agent.py:241-247)
- the final allowed iteration offers no tools (agent.py:252-255)
- tool calls may arrive structured (OpenAI-style ``tool_calls``) or as
  ``<tool_call><function=name><parameter=k>v</parameter></function>
  </tool_call>`` text markup (agent.py:22-44); a response with neither
  is the final answer, with markup stripped (agent.py:47-50)
- each tool result is truncated to its share of the remaining budget,
  never below 1000 chars (agent.py:161-170)
- sources are JSON lines accumulated from tool results, deduplicated
  by document:chunk:page (agent.py:71-107)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable

MAX_ITERATIONS = 8
CONTEXT_BUDGET_CHARS = 400_000
BUDGET_FORCE_FRACTION = 0.1
MIN_TOOL_RESULT_CHARS = 1_000

SYSTEM_PROMPT = (
    "You are a document-analysis agent. Use the available tools to "
    "gather evidence, then answer concisely citing document ids."
)
FORCE_ANSWER_ADDENDUM = (
    "Answer now with the information gathered so far. Do not call any "
    "more tools."
)

_CALL_BLOCK = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)
_CALL_FN = re.compile(r"<function=(\w+)>\s*(.*?)\s*</function>", re.DOTALL)
_CALL_PARAM = re.compile(r"<parameter=(\w+)>\s*(.*?)\s*</parameter>", re.DOTALL)


def parse_text_tool_calls(content: str) -> list[tuple[str, dict[str, str]]]:
    """Qwen-style text-markup tool calls -> [(name, {arg: val})]."""
    calls: list[tuple[str, dict[str, str]]] = []
    for block in _CALL_BLOCK.finditer(content):
        fn = _CALL_FN.search(block.group(1))
        if fn is None:
            continue
        args = {m.group(1): m.group(2).strip() for m in _CALL_PARAM.finditer(fn.group(2))}
        calls.append((fn.group(1), args))
    return calls


def strip_tool_markup(content: str) -> str:
    return re.sub(r"\n{3,}", "\n", _CALL_BLOCK.sub("", content)).strip()


def estimate_chars(messages: list[dict[str, Any]]) -> int:
    total = 0
    for m in messages:
        total += len(m.get("content") or "")
        for tc in m.get("tool_calls") or []:
            fn = tc.get("function", {})
            args = fn.get("arguments", "")
            if not isinstance(args, str):
                args = json.dumps(args)
            total += len(fn.get("name", "")) + len(args)
    return total


def extract_sources(tool_results: list[str]) -> list[dict[str, Any]]:
    """Collect JSON-line source records from tool output, first
    occurrence wins, deduplicated by document:chunk:page."""
    out: list[dict[str, Any]] = []
    seen: set[str] = set()
    for text in tool_results:
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            # presence, not truth, everywhere an id can be 0: doc_id,
            # chunk/block_id and page/turn 0 are all real values an
            # `or` chain would drop
            doc = rec.get("document_id")
            if doc is None:
                doc = rec.get("doc_id")
            chunk = rec.get("chunk_id")
            if chunk is None:
                chunk = rec.get("block_id")
            chunk = "" if chunk is None else chunk
            page = rec.get("page", rec.get("turn_idx"))
            # a source must locate within the doc (chunk or page) or
            # carry retrieval evidence (non-empty text, or a ranked
            # similarity hit from search_chunks); empty text is not
            # evidence
            if doc is None or doc == "" or not (
                chunk != "" or page is not None or rec.get("text") or "rank" in rec
            ):
                continue
            page = 0 if page is None else page
            key = f"{doc}:{chunk}:{page}"
            if key in seen:
                continue
            seen.add(key)
            out.append(
                {
                    "document_id": doc,
                    "chunk_id": chunk,
                    "page": page,
                    "text": rec.get("text", ""),
                }
            )
    return out


def build_registry(
    extracted: "Any", vecs: "Any", docs: "Any"
) -> "ToolRegistry":
    """Bind the four §2.10 engine tools (agent_tools.py) to their
    tables, yielding the registry the loop runs over. ``document_id``
    scoping (reference agent.py:263-277) is applied per-run via
    ``ToolRegistry.scoped`` / ``AgentLoop.run(document_id=...)`` — each
    tool maps it onto its own scoping parameter."""
    from .agent_tools import (
        get_document,
        list_documents,
        search_chunks,
        search_document_text,
    )

    def _coerce_doc_id(v: Any) -> Any:
        # text-markup tool calls deliver all args as strings; the
        # embeddings doc_id column is bigint, so numeric strings must
        # be coerced or the scoped filter fails at runtime (ANSI cast).
        # Strict ASCII-digit match, not isdigit()/bare int(): isdigit
        # accepts strings int() rejects (superscripts), and bare int()
        # accepts separators ("1_000" -> 1000), which would silently
        # scope to the WRONG document instead of erroring loudly. An
        # empty markup value (<parameter=document_id></parameter>)
        # means "not scoped".
        if isinstance(v, str):
            s = v.strip()
            if s == "":
                return None
            if re.fullmatch(r"-?\d+", s, re.ASCII):
                return int(s)
        return v

    def _search_chunks(
        document_id: Any | None = None, n_results: Any = 5, **kw: Any
    ) -> str:
        return search_chunks(
            vecs,
            docs,
            document_id=_coerce_doc_id(document_id),
            n_results=int(n_results),
            **kw,
        )

    def _get_document(conv_id: str = "", document_id: Any | None = None, **kw: Any) -> str:
        # explicit missing-test, not `or`: a scoped document_id of 0 is
        # real, while None/"" (absent or empty markup value) falls back
        # to the model-supplied conv_id
        target = conv_id if document_id in (None, "") else document_id
        return get_document(extracted, conv_id=str(target))

    def _list_documents(
        document_id: Any | None = None, limit: Any = 20, **kw: Any
    ) -> str:
        return list_documents(extracted, limit=int(limit), **kw)

    def _search_document_text(
        conv_id: str = "",
        keyword: str = "",
        document_id: Any | None = None,
        limit: Any = 20,
        **kw: Any,
    ) -> str:
        target = conv_id if document_id in (None, "") else document_id
        return search_document_text(
            extracted,
            conv_id=str(target),
            keyword=keyword,
            limit=int(limit),
        )

    return ToolRegistry(
        {
            "search_chunks": _search_chunks,
            "get_document": _get_document,
            "list_documents": _list_documents,
            "search_document_text": _search_document_text,
        }
    )


@dataclass
class AgentResult:
    answer: str
    sources: list[dict[str, Any]]
    iterations: int
    forced: bool = False


@dataclass
class ToolRegistry:
    """Name -> callable(**args) -> str. ``pinned`` args are forced onto
    every call (the reference's document scoping, agent.py:263-277)."""

    tools: dict[str, Callable[..., str]]
    pinned: dict[str, Any] = field(default_factory=dict)

    def scoped(self, **pinned: Any) -> "ToolRegistry":
        return ToolRegistry(self.tools, {**self.pinned, **pinned})

    def schemas(self) -> list[dict[str, Any]]:
        return [{"type": "function", "function": {"name": n}} for n in sorted(self.tools)]

    def execute(self, name: str, args: dict[str, Any], max_chars: int) -> str:
        fn = self.tools.get(name)
        if fn is None:
            return f"Error: unknown tool '{name}'."
        try:
            result = fn(**{**args, **self.pinned})
        except TypeError as exc:
            return f"Error: bad arguments for '{name}': {exc}"
        except Exception as exc:  # noqa: BLE001 — tool errors feed back to the model
            return f"Error: tool '{name}' failed: {exc}"
        if len(result) > max_chars:
            result = result[: max_chars - 15] + "\n...[truncated]"
        return result


@dataclass
class AgentLoop:
    """The ReAct control loop. ``llm`` is any object with
    ``chat(messages, tools) -> {"content": str, "tool_calls": [...]}``."""

    llm: Any
    registry: ToolRegistry
    max_iterations: int = MAX_ITERATIONS
    context_budget: int = CONTEXT_BUDGET_CHARS

    def run(self, query: str, document_id: Any | None = None) -> AgentResult:
        registry = (
            self.registry.scoped(document_id=document_id)
            if document_id is not None
            else self.registry
        )
        messages: list[dict[str, Any]] = [
            {"role": "system", "content": SYSTEM_PROMPT},
            {"role": "user", "content": query},
        ]
        tool_results: list[str] = []

        for iteration in range(1, self.max_iterations + 1):
            remaining = self.context_budget - estimate_chars(messages)
            if remaining < self.context_budget * BUDGET_FORCE_FRACTION:
                return self._force_answer(messages, tool_results, iteration, forced=True)

            is_last = iteration == self.max_iterations
            response = self.llm.chat(
                messages, tools=None if is_last else registry.schemas()
            )
            content = response.get("content") or ""
            structured = response.get("tool_calls") or []
            text_calls = parse_text_tool_calls(content) if content else []

            if not structured and not text_calls:
                return AgentResult(
                    answer=strip_tool_markup(content),
                    sources=extract_sources(tool_results),
                    iterations=iteration,
                )

            if structured:
                messages.append(response)
                calls = []
                for tc in structured:
                    fn = tc.get("function", {})
                    raw = fn.get("arguments", {})
                    if not isinstance(raw, dict):
                        try:
                            raw = json.loads(raw)
                        except ValueError:
                            raw = {}
                    calls.append((fn.get("name", ""), raw, tc.get("id", "")))
                per_call = max(remaining // max(len(calls), 1), MIN_TOOL_RESULT_CHARS)
                for name, args, call_id in calls:
                    result = registry.execute(name, args, per_call)
                    tool_results.append(result)
                    messages.append(
                        {"role": "tool", "tool_call_id": call_id, "content": result}
                    )
            else:
                messages.append({"role": "assistant", "content": content})
                per_call = max(
                    remaining // max(len(text_calls), 1), MIN_TOOL_RESULT_CHARS
                )
                for name, args in text_calls:
                    result = registry.execute(name, args, per_call)
                    tool_results.append(result)
                    messages.append(
                        {"role": "user", "content": f"[Tool result: {name}]\n{result}"}
                    )

        return self._force_answer(
            messages, tool_results, self.max_iterations, forced=True
        )

    def _force_answer(
        self,
        messages: list[dict[str, Any]],
        tool_results: list[str],
        iteration: int,
        forced: bool,
    ) -> AgentResult:
        messages.append({"role": "user", "content": FORCE_ANSWER_ADDENDUM})
        try:
            response = self.llm.chat(messages, tools=None)
            answer = strip_tool_markup(response.get("content") or "")
        except Exception:  # noqa: BLE001 — degrade to collected evidence
            answer = ""
        return AgentResult(
            answer=answer,
            sources=extract_sources(tool_results),
            iterations=iteration,
            forced=forced,
        )
