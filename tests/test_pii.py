"""PII scrub (functions/pii.py) and repeated-line dedup
(operators/corpus.py:line_dedup): cross-engine regex parity on
adversarial strings, redaction-order contract, and boilerplate-removal
semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.functions import pii
from lab_1806_vec_db_spark.operators.corpus import line_dedup

EDGE_TEXTS = [
    "mail a.b+c@x-y.co or d@e.io ph 555-123-4567 ip 10.0.0.1 http://ex.com/a?b=1 end",
    "no pii here",
    # TLD-less email, 5-octet "IP" (both engines match the first 4),
    # comma-terminated URL, uppercase scheme (unmatched — patterns are
    # case-sensitive by contract)
    "edge 999-999-9999 1.2.3.4.5 x@y.z http://a.b,c see HTTPS://X.CO",
    "u30@example.com 10.0.30.210 555-030-1030 https://docs.example.org/p30?ref=30",
    # email embedded in a URL path: email pattern applies FIRST
    "see https://host.io/mail/me@host.io/inbox now",
    "",
    "555-123-45678 and 55-123-4567 miss the \\b-anchored phone shape",
]


def _duck_counts(con, t: str) -> dict[str, int]:
    return {
        name: con.execute(
            f"SELECT len(regexp_extract_all(?, '{pat}'))", [t]
        ).fetchone()[0]
        for name, pat in pii.PII_PATTERNS.items()
    }


def _duck_redact(con, t: str) -> str:
    return con.execute(f"SELECT {pii.pii_redact_sql('?')}", [t]).fetchone()[0]


def test_pii_cross_engine_parity(spark):
    sdf = spark.createDataFrame([(t,) for t in EDGE_TEXTS], ["t"])
    rows = sdf.select(
        "t", *pii.pii_counts("t"), pii.pii_redact("t").alias("red")
    ).collect()
    con = duckdb.connect()
    for r in rows:
        dc = _duck_counts(con, r["t"])
        assert {k: r[f"n_{k}"] for k in pii.PII_PATTERNS} == dc, r["t"]
        assert _duck_redact(con, r["t"]) == r["red"], r["t"]


def test_pii_redaction_order_email_inside_url(spark):
    # the email inside the URL path is consumed by the EMAIL pattern
    # first (PII_PATTERNS order), splitting the URL match around it
    row = (
        spark.createDataFrame([("go https://h.io/u/me@h.io/x now",)], ["t"])
        .select(pii.pii_redact("t").alias("red"))
        .collect()[0]
    )
    assert "<EMAIL>" in row["red"] and "<URL>" in row["red"]
    assert "me@h.io" not in row["red"]


def test_pii_counts_are_zero_on_clean_text(spark):
    row = (
        spark.createDataFrame([("just plain words",)], ["t"])
        .select(*pii.pii_counts("t"))
        .collect()[0]
    )
    assert all(row[f"n_{k}"] == 0 for k in pii.PII_PATTERNS)


@pytest.fixture(scope="module")
def line_docs(spark):
    # "HEAD" appears in 3 docs (> max_df=2 → boilerplate), "mid x"
    # in 2 (kept), unique lines kept; doc 4 is ALL boilerplate
    rows = [
        (1, "HEAD\nalpha one\nmid x\ntail a"),
        (2, "HEAD\nbeta two\nmid x"),
        (3, "HEAD\ngamma three"),
        (4, "HEAD"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_removes_high_df_lines(line_docs):
    out = {r["doc_id"]: r for r in line_dedup(line_docs, max_df=2).collect()}
    assert out[1]["clean_text"] == "alpha one\nmid x\ntail a"
    assert out[2]["clean_text"] == "beta two\nmid x"
    assert out[3]["clean_text"] == "gamma three"
    # fully-boilerplate doc keeps its row with an empty rebuild
    assert out[4]["n_lines"] == 1 and out[4]["n_kept"] == 0
    assert out[4]["clean_text"] == ""
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 3


def test_line_dedup_df_counts_distinct_docs(spark):
    # a line repeated INSIDE one doc counts once toward df
    rows = [(1, "dup\ndup\ndup\nu1"), (2, "dup\nu2")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_dedup(df, max_df=2).collect()}
    # df("dup") = 2 distinct docs <= max_df → kept everywhere
    assert out[1]["clean_text"] == "dup\ndup\ndup\nu1"
    assert out[2]["clean_text"] == "dup\nu2"
    out1 = {r["doc_id"]: r for r in line_dedup(df, max_df=1).collect()}
    assert out1[1]["clean_text"] == "u1" and out1[2]["clean_text"] == "u2"


def test_line_dedup_order_preserved_no_broadcast(line_docs):
    # same result with the broadcast hint off (AQE-chosen strategy)
    a = sorted(map(tuple, line_dedup(line_docs, max_df=2).collect()))
    b = sorted(
        map(tuple, line_dedup(line_docs, max_df=2, broadcast_boiler=False).collect())
    )
    assert a == b


def test_line_dedup_custom_regex_sep(spark):
    # regex split sep with an explicit literal join_sep
    df = spark.createDataFrame([(1, "a;b;;c")], ["doc_id", "text"])
    out = line_dedup(df, max_df=5, sep=";+", join_sep=";").collect()[0]
    assert out["clean_text"] == "a;b;c"
    assert out["n_lines"] == 3


def test_pii_scrub_stream_equals_batch(spark, tmp_path):
    """PII scrub is map-only, so it composes with Structured Streaming
    unchanged: the same select over readStream must emit exactly the
    batch rows — the unified-model contract that lets the scrub run
    inside an ingest stream at no extra cost."""
    rows = [
        (1, "mail me a.b@x-y.co today"),
        (2, "ip 10.0.0.7 url https://h.io/p?q=1"),
        (3, "clean row"),
        (4, "call 555-123-4567 or 555-999-0000 x"),
    ]
    src = str(tmp_path / "pii_src")
    schema = "doc_id long, text string"
    spark.createDataFrame(rows, schema).repartition(2).write.mode(
        "overwrite"
    ).parquet(src)

    def scrub(df):
        return df.select(
            "doc_id", *pii.pii_counts("text"), pii.pii_redact("text").alias("red")
        )

    batch_rows = sorted(tuple(r) for r in scrub(spark.read.parquet(src)).collect())
    q = (
        scrub(spark.readStream.schema(schema).parquet(src))
        .writeStream.format("memory")
        .queryName("pii_scrub_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM pii_scrub_test").collect()
    )
    assert stream_rows == batch_rows


def test_line_dedup_identity_when_threshold_exceeds_corpus(spark):
    # max_df >= number of docs → nothing is boilerplate → exact rebuild
    rows = [(i, f"common line\nuniq {i}\nshared {i % 2}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_dedup(df, max_df=6).collect()}
    for i, text in rows:
        assert out[i]["clean_text"] == text
        assert out[i]["n_kept"] == out[i]["n_lines"] == 3


def test_pii_randomized_corpus_parity(spark):
    """Randomized stress parity: 300 seeded strings over a PII-shaped
    alphabet (digits, dots, @, dashes, scheme fragments) — every count
    and the full redaction must agree between Spark's Java regex and
    DuckDB's RE2 on all of them. Catches dialect drift (greediness,
    \\b semantics, class edge cases) that the curated EDGE_TEXTS
    can't."""
    import random

    rng = random.Random(1806)
    frags = [
        "a", "bc", "x9", "10", "255", "999", "0", ".", "..", "@", "-", "--",
        " ", "  ", "http://", "https://", "://", "example", "com", "org",
        "555", "1234", "@.", ".@", "a@b", ".co", "0.0", "www.", "?q=1", "/p",
    ]
    texts = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 24)))
        for _ in range(300)
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], ["t"])
    rows = sdf.select(
        "t", *pii.pii_counts("t"), pii.pii_redact("t").alias("red")
    ).collect()
    con = duckdb.connect()
    bad = []
    for r in rows:
        dc = _duck_counts(con, r["t"])
        dr = _duck_redact(con, r["t"])
        if dc != {k: r[f"n_{k}"] for k in pii.PII_PATTERNS} or dr != r["red"]:
            bad.append((r["t"], dc, dr, r["red"]))
    assert not bad, bad[:3]
