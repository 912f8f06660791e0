"""Mirror of the driver's correctness gate: every queries() entry runs
on Spark AND (when an oracle exists) on DuckDB at sf0.001; results must
match exactly under column-name sort + row sort, like the driver's
order-insensitive value-hash."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
# Queries whose oracle is a pinned golden generated at the DRIVER's
# correctness sf (0.01): the Spark side must run at that sf too.
QUERY_SF = {
    name: "/root/testdata/sf0.01"
    for name in (
        "extract_turns_docs",
        "extract_conv_metrics",
        "extract_chunks",
        "extract_digests",
    )
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


ORACLE_NAMES = sorted(entrymod.oracle_sql())
ALL_NAMES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    qs = entrymod.queries()
    spark_pdf = qs[name](spark, QUERY_SF.get(name, SF_DIR)).toPandas()
    oracle_pdf = ddb.execute(entrymod.oracle_sql()[name]).df()
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: column mismatch {a.columns} vs {b.columns}"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    # dtype KIND must agree (int vs float): the driver hashes rendered
    # values, so an oracle-side HUGEINT->float64 (4.0 vs 4) breaks the
    # hash even when every value is numerically equal — exactly the
    # round-1 sessionize_events failure mode.
    for c in a.columns:
        if a[c].dtype.kind in "iuf" or b[c].dtype.kind in "iuf":
            ka = "f" if a[c].dtype.kind == "f" else "i"
            kb = "f" if b[c].dtype.kind == "f" else "i"
            assert ka == kb, f"{name}.{c}: dtype kind {a[c].dtype} vs {b[c].dtype}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)


def test_every_query_has_an_oracle():
    # the rows-only fallback path is intentionally unused: every
    # registered query is value-hash-checked against a DuckDB oracle
    assert ALL_NAMES == ORACLE_NAMES
    assert entrymod.GATE_ORDER == list(entrymod.queries())
    assert len(entrymod.GATE_ORDER) == 50


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"conv_id", "n_turns", "ocr_fallback_rate"} <= set(df.columns)


# ---------------------------------------------------------------------------
# SCD2 semantic invariants (the oracle pins values; these pin the
# CONTRACT a snapshot consumer relies on).
# ---------------------------------------------------------------------------


def test_scd2_intervals_invariants(spark):
    from pdf_parser_spark.queries import QUERIES

    rows = QUERIES["scd2_intervals"](spark, SF_DIR).collect()
    latest = {
        r["user_id"]: r
        for r in QUERIES["latest_per_key"](spark, SF_DIR).collect()
    }
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(latest)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        # versions contiguous from 1
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        # chained intervals: each valid_to is the next valid_from;
        # exactly the last one is open ('')
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] <= a["valid_to"]
        assert ivs[-1]["valid_to"] == ""
        assert all(r["valid_to"] != "" for r in ivs[:-1])
        # adjacent intervals always change state
        for a, b in zip(ivs, ivs[1:]):
            assert a["event_type"] != b["event_type"]
        # the open interval is the user's current state
        assert ivs[-1]["event_type"] == latest[uid]["last_event_type"]
        assert ivs[-1]["valid_from"] <= latest[uid]["last_ts"]


# ---------------------------------------------------------------------------
# phrase_hits unit semantics: adjacency, ordering, overlap counting.
# ---------------------------------------------------------------------------


def test_phrase_hits_semantics(spark):
    from pdf_parser_spark.search import phrase_hits

    docs = spark.createDataFrame(
        [
            (1, "sort merge join beats hash sort merge here"),  # 2 hits
            (2, "merge sort is not the phrase"),  # reversed -> 0
            (3, "sort  Merge, with punctuation"),  # tokenizer normalizes
            (4, "sort then merge"),  # not adjacent -> 0
            (5, "sort sort merge"),  # hit at offset 1
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in phrase_hits(docs, ["sort", "merge"]).collect()}
    assert set(got) == {1, 3, 5}
    assert (got[1]["n_hits"], got[1]["first_pos"]) == (2, 0)
    assert (got[3]["n_hits"], got[3]["first_pos"]) == (1, 0)
    assert (got[5]["n_hits"], got[5]["first_pos"]) == (1, 1)


def test_phrase_hits_overlapping_terms(spark):
    from pdf_parser_spark.search import phrase_hits

    docs = spark.createDataFrame([(1, "a a a a")], "doc_id LONG, text STRING")
    got = phrase_hits(docs, ["a", "a"]).collect()
    assert (got[0]["n_hits"], got[0]["first_pos"]) == (3, 0)


def test_gate_count_guard_survives_python_O():
    """The 50-key invariant must hold under `python -O` (which strips
    bare asserts): the guard is an unconditional raise, and a
    subprocess import under -O still sees exactly 50 gate keys."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "__spark_entry__.py")).read()
    guard = src.split("if len(GATE_ORDER) != 50", 1)
    assert len(guard) == 2, "gate-count guard missing"
    assert "raise" in guard[1][:200], "guard must raise, not assert"
    out = subprocess.run(
        [sys.executable, "-O", "-c",
         "import __spark_entry__ as e; print(len(e.GATE_ORDER))"],
        capture_output=True, text=True, cwd=repo, timeout=120,
    )
    assert out.stdout.strip() == "50", out.stderr[-500:]
