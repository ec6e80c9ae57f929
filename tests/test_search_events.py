"""BM25 full-text search and events analytics (topN / retention /
quantiles): semantic gates on tiny hand-checkable frames plus
plan-shape gates for the 100 TB design."""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.operators.events import (
    hourly_retention,
    topn_per_window,
    value_quantiles,
)
from lab_1806_vec_db_spark.operators.search import bm25_topk


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "spark spark table"),
        (1, "spark join"),
        (2, "table join window window"),
        (3, "filler filler filler filler filler filler"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_hand_computed(tiny_docs):
    out = bm25_topk(tiny_docs, terms=("spark",), k=10).collect()
    # docs 0 and 1 contain 'spark' → df=2; doc 0's tf=2 saturation
    # still beats doc 1's shorter length
    assert [r["doc_id"] for r in out] == [0, 1]
    n, avgdl = 4, (3 + 2 + 4 + 6) / 4.0
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def w(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert out[0]["score"] == pytest.approx(round(w(2, 3), 4), abs=1e-9)
    assert out[1]["score"] == pytest.approx(round(w(1, 2), 4), abs=1e-9)
    assert all(r["n_terms_hit"] == 1 for r in out)


def test_bm25_multi_term_accumulates(tiny_docs):
    out = {r["doc_id"]: r for r in
           bm25_topk(tiny_docs, terms=("spark", "join"), k=10).collect()}
    assert out[1]["n_terms_hit"] == 2          # spark + join
    assert out[0]["n_terms_hit"] == 1
    assert 3 not in out                        # no query term → absent


def test_bm25_plan_shape(tiny_docs):
    plan = _plan(bm25_topk(tiny_docs, terms=("spark",), k=5))
    # k-bounded top-k, df/stats broadcast back — never a big-big join
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


@pytest.fixture(scope="module")
def tiny_events(spark):
    # two hour buckets; users 1,2 in h0; users 2,3 in h1
    h0, h1 = 3600 * 10**9, 7200 * 10**9
    rows = [
        (0, h0 + 1, 1, "a", 1.0),
        (1, h0 + 2, 2, "a", 2.0),
        (2, h0 + 3, 2, "b", 10.0),
        (3, h1 + 1, 2, "a", 5.0),
        (4, h1 + 2, 3, "c", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts bigint, user_id bigint, event_type string, value double"
    )


def test_topn_ranks_by_rounded_sum(tiny_events):
    out = topn_per_window(tiny_events, n=1).collect()
    by_w = {r["window_start"]: r for r in out}
    assert len(by_w) == 2
    first = by_w[min(by_w)]
    assert first["event_type"] == "b" and first["sum_value"] == 10.0
    assert first["rnk"] == 1


def test_retention_counts(tiny_events):
    out = {r["hour_id"]: r for r in hourly_retention(tiny_events).collect()}
    assert out[1]["n_users"] == 2 and out[1]["n_retained"] == 1
    assert out[1]["retention"] == 0.5
    assert out[2]["n_users"] == 2 and out[2]["n_retained"] == 0


def test_retention_timestamp_dtype(tiny_events):
    ts_df = tiny_events.withColumn(
        "ts", F.timestamp_seconds(F.expr("ts div 1000000000"))
    )
    a = sorted(map(tuple, hourly_retention(tiny_events).collect()))
    b = sorted(map(tuple, hourly_retention(ts_df).collect()))
    assert a == b


def test_quantiles_exact_interpolation(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)], "event_type string, value double"
    )
    row = value_quantiles(df).collect()[0]
    # percentile_cont over 1..5: p25=2.0, p50=3.0, p75=4.0, p95=4.8
    assert (row["p25"], row["p50"], row["p75"], row["p95"]) == (2.0, 3.0, 4.0, 4.8)
    assert row["n"] == 5


def test_topn_window_partition_is_post_agg(tiny_events):
    plan = _plan(topn_per_window(tiny_events, n=3))
    # the rank window runs over the rollup output (one row per
    # (window, type)), not over raw events: exactly two exchanges —
    # the rollup shuffle and the window repartition — and the rank
    # limit is pushed map-side (WindowGroupLimit Partial before the
    # second exchange)
    assert plan.count("+- Exchange") == 2
    assert "WindowGroupLimit" in plan


def test_text_index_matches_adhoc(spark, tiny_docs, tmp_path):
    from lab_1806_vec_db_spark.operators.search import TextIndex

    TextIndex.build(tiny_docs, str(tmp_path / "ti"), n_buckets=8)
    idx = TextIndex.load(str(tmp_path / "ti"))
    a = [tuple(r) for r in bm25_topk(tiny_docs, ("spark", "join"), k=10).collect()]
    b = [tuple(r) for r in idx.search(spark, ("spark", "join"), k=10).collect()]
    assert a == b


def test_text_index_prunes_partitions(spark, sf_correct, tmp_path):
    from lab_1806_vec_db_spark.session import read_table
    from lab_1806_vec_db_spark.operators.search import TextIndex

    TextIndex.build(read_table(spark, sf_correct, "documents"),
                    str(tmp_path / "ti"), n_buckets=16)
    idx = TextIndex.load(str(tmp_path / "ti"))
    plan = _plan(idx.search(spark, ("spark", "vector"), k=5))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    # the postings scan reads only the query terms' bucket directories
    assert pf and "bucket" in pf[0] and (" IN " in pf[0] or "in(" in pf[0].lower())
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "term" in pushed[0]


def test_text_index_unknown_term_absent(spark, tiny_docs, tmp_path):
    from lab_1806_vec_db_spark.operators.search import TextIndex

    TextIndex.build(tiny_docs, str(tmp_path / "ti"), n_buckets=8)
    idx = TextIndex.load(str(tmp_path / "ti"))
    out = idx.search(spark, ("spark", "zzz_not_a_term"), k=10).collect()
    assert {r["doc_id"] for r in out} == {0, 1}
    assert all(r["n_terms_hit"] == 1 for r in out)


def test_text_index_incremental_append(spark, tiny_docs, tmp_path):
    """Append parity: build on half the corpus, add_documents the
    rest → search equals bm25_topk over the FULL corpus, and equals a
    from-scratch index."""
    from lab_1806_vec_db_spark.operators.search import TextIndex

    first = tiny_docs.filter(F.col("doc_id") < 2)
    rest = tiny_docs.filter(F.col("doc_id") >= 2)
    TextIndex.build(first, str(tmp_path / "ti"), n_buckets=8)
    idx = TextIndex.load(str(tmp_path / "ti"))
    idx.add_documents(rest)
    terms = ("spark", "join", "window")
    got = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(tiny_docs, terms, k=10).collect()]
    assert got == want
    # reopen sees the appended state (meta committed atomically)
    idx2 = TextIndex.load(str(tmp_path / "ti"))
    assert idx2.n_docs == 4
    got2 = [tuple(r) for r in idx2.search(spark, terms, k=10).collect()]
    assert got2 == want


def test_text_index_append_crash_repair(spark, tiny_docs, tmp_path):
    """Crash simulation via the injection hook: postings appended but
    df/meta never committed (the pending marker is still on disk) →
    load() settles the batch from the marker and search matches the
    full-corpus ad-hoc BM25."""
    import os

    import pytest

    from lab_1806_vec_db_spark.operators.search import TextIndex

    path = str(tmp_path / "ti")
    first = tiny_docs.filter(F.col("doc_id") < 2)
    rest = tiny_docs.filter(F.col("doc_id") >= 2)
    TextIndex.build(first, path, n_buckets=8)
    idx0 = TextIndex.load(path)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx0.add_documents(rest, _fail_after_postings=True)
    assert os.path.exists(os.path.join(path, "pending_append.json"))

    idx = TextIndex.load(path)   # triggers repair
    assert not os.path.exists(os.path.join(path, "pending_append.json"))
    assert idx.n_docs == 4
    terms = ("spark", "join", "window")
    got = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(tiny_docs, terms, k=10).collect()]
    assert got == want


def test_text_index_legacy_marker_repair(spark, tiny_docs, tmp_path):
    """A pending marker from an older layout (no pre/delta payload)
    still repairs: stats recomputed best-effort from postings."""
    import json
    import os

    from lab_1806_vec_db_spark.operators.search import TextIndex, _textindex_tf

    path = str(tmp_path / "ti")
    first = tiny_docs.filter(F.col("doc_id") < 2)
    rest = tiny_docs.filter(F.col("doc_id") >= 2)
    TextIndex.build(first, path, n_buckets=8)
    with open(os.path.join(path, "pending_append.json"), "w") as f:
        json.dump({"reason": "append in flight"}, f)
    _textindex_tf(rest, "text", "doc_id", 8).write.mode("append").partitionBy(
        "bucket"
    ).parquet(os.path.join(path, "postings"))

    idx = TextIndex.load(path)
    assert not os.path.exists(os.path.join(path, "pending_append.json"))
    assert idx.n_docs == 4
    terms = ("spark", "join", "window")
    got = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(tiny_docs, terms, k=10).collect()]
    assert got == want


def test_quantile_labels_round_not_truncate(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)], "event_type string, value double"
    )
    out = value_quantiles(df, probs=(0.29, 0.975))
    assert out.columns == ["event_type", "n", "p29", "p97_5"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        value_quantiles(df, probs=(0.05, 0.05))


def test_bm25_batch_equals_single_query(spark, tiny_docs):
    from lab_1806_vec_db_spark.operators.search import bm25_topk_batch

    qdf = spark.createDataFrame(
        [(0, ["spark"]), (1, ["spark", "join"]), (2, ["window", "table"])],
        "query_id int, terms array<string>",
    )
    batch = bm25_topk_batch(tiny_docs, qdf, k=10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["n_terms_hit"])
        )
    for qid, terms in [(0, ("spark",)), (1, ("spark", "join")), (2, ("window", "table"))]:
        single = [(r["doc_id"], r["score"], r["n_terms_hit"])
                  for r in bm25_topk(tiny_docs, terms, k=10).collect()]
        got = sorted(by_q.get(qid, []), key=lambda t: (-t[1], t[0]))
        assert got == single, qid


def test_bm25_batch_local_queries_no_plan_build_job(spark, tiny_docs):
    """Round-14 (VERDICT r13 #4): when the caller supplies the term
    pool (it built the queries frame from local data), or the queries
    plan is a genuine LocalRelation (SQL VALUES), plan construction
    must submit NO Spark job — and every pool path must produce
    identical results to the job-based guard."""
    from lab_1806_vec_db_spark.operators.search import bm25_topk_batch

    qdata = [(0, ["spark"]), (1, ["spark", "join"]), (2, ["window", "table"])]
    qdf = spark.createDataFrame(qdata, "query_id int, terms array<string>")
    pool = sorted({t for _, terms in qdata for t in terms})
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    import uuid

    def assert_job_free(build):
        # unique group per invocation — getJobIdsForGroup accumulates
        # for the session, so a reused name would see earlier collects
        group = f"bm25_plan_build_probe_{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, "plan construction must be job-free")
        try:
            df = build()
            built = tracker.getJobIdsForGroup(group)
            assert not built, f"plan construction submitted job(s): {built}"
            rows = [tuple(r) for r in df.collect()]
            # sanity: execution inside the group IS recorded, so an
            # empty list above means job-free, not a broken probe
            assert tracker.getJobIdsForGroup(group)
            return rows
        finally:
            sc._jsc.clearJobGroup()

    # caller-supplied pool: zero plan-build jobs
    rows = assert_job_free(
        lambda: bm25_topk_batch(tiny_docs, qdf, k=10, term_pool=pool))
    # genuine LocalRelation (SQL VALUES): probe reads it job-free
    qlocal = spark.sql(
        "SELECT * FROM VALUES (0, array('spark')), "
        "(1, array('spark', 'join')), (2, array('window', 'table')) "
        "AS t(query_id, terms)"
    )
    assert (qlocal.select("terms")._jdf.queryExecution().optimizedPlan()
            .getClass().getSimpleName() == "LocalRelation")
    rows_local = assert_job_free(
        lambda: bm25_topk_batch(tiny_docs, qlocal, k=10))
    # job-based guard (PySpark-created frame, no pool given): identical
    rows_guard = [tuple(r) for r in
                  bm25_topk_batch(tiny_docs, qdf, k=10).collect()]
    assert sorted(rows) == sorted(rows_guard) == sorted(rows_local)


def test_text_index_compact_preserves_results(spark, tiny_docs, tmp_path):
    import glob
    import os

    from lab_1806_vec_db_spark.operators.search import TextIndex

    path = str(tmp_path / "ti")
    TextIndex.build(tiny_docs.filter(F.col("doc_id") < 2), path, n_buckets=4)
    idx = TextIndex.load(path)
    # several appends → many small files per bucket
    for lo, hi in [(2, 3), (3, 4)]:
        idx.add_documents(
            tiny_docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
    terms = ("spark", "join", "window")
    before = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    files_before = len(glob.glob(os.path.join(path, "postings", "bucket=*", "*.parquet")))
    n = idx.compact()
    files_after = len(glob.glob(os.path.join(path, "postings", "bucket=*", "*.parquet")))
    assert n >= 1 and files_after < files_before
    after = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    assert after == before
    # results also match the from-scratch ad-hoc computation
    assert after == [tuple(r) for r in bm25_topk(tiny_docs, terms, k=10).collect()]


def test_text_index_append_retry_is_idempotent(spark, tiny_docs, tmp_path):
    """Crash then RETRY of the same batch must not double-count: the
    marker's batch signature lands in meta's absorbed log, so the
    retry no-ops instead of re-appending — and it STILL no-ops after
    a different append has intervened (the log survives other
    appends, unlike a single marker file)."""
    import pytest

    from lab_1806_vec_db_spark.operators.search import TextIndex

    path = str(tmp_path / "ti")
    first = tiny_docs.filter(F.col("doc_id") < 1)
    mid = tiny_docs.filter((F.col("doc_id") >= 1) & (F.col("doc_id") < 3))
    last = tiny_docs.filter(F.col("doc_id") >= 3)
    TextIndex.build(first, path, n_buckets=8)
    idx0 = TextIndex.load(path)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx0.add_documents(mid, _fail_after_postings=True)

    idx = TextIndex.load(path)      # repair absorbs the batch
    idx.add_documents(mid)          # the caller's RETRY — must no-op
    assert idx.n_docs == 3
    idx.add_documents(last)         # an unrelated append intervenes
    idx.add_documents(mid)          # DELAYED retry — must still no-op
    terms = ("spark", "join", "window")
    got = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(tiny_docs, terms, k=10).collect()]
    assert got == want              # no doubled tf/df/scores
    assert idx.n_docs == 4


def test_text_index_crash_before_postings_retry_appends(spark, tiny_docs, tmp_path):
    """Crash BEFORE the postings job committed: repair restores the
    pre-append stats (nothing landed) and the retry performs the real
    append."""
    import pytest

    from lab_1806_vec_db_spark.operators.search import TextIndex

    path = str(tmp_path / "ti")
    first = tiny_docs.filter(F.col("doc_id") < 2)
    rest = tiny_docs.filter(F.col("doc_id") >= 2)
    TextIndex.build(first, path, n_buckets=8)
    idx0 = TextIndex.load(path)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx0.add_documents(rest, _fail_before_postings=True)

    idx = TextIndex.load(path)                # repair: batch never landed
    assert idx.n_docs == 2
    idx.add_documents(rest)                   # retry must REALLY append
    terms = ("spark", "join", "window")
    got = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(tiny_docs, terms, k=10).collect()]
    assert got == want and idx.n_docs == 4


def test_text_index_empty_doc_batch_crash_repair(spark, tmp_path):
    """The ADVICE scenario: a crashed batch whose FIRST ids (sorted)
    are all empty-text docs. Probe ids come only from docs with
    tokens, so the landed batch is detected; stats restore from the
    marker's pre+delta, so empty docs stay counted in n_docs/avgdl
    and search remains bit-identical with bm25_topk over the union."""
    import pytest

    from lab_1806_vec_db_spark.operators.search import TextIndex

    docs = spark.createDataFrame(
        [(0, "spark join window"), (1, "spark shuffle"),
         (2, ""), (3, "   "), (4, "join window spark")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "ti")
    first = docs.filter(F.col("doc_id") < 2)
    rest = docs.filter(F.col("doc_id") >= 2)   # ids 2,3 are empty-text
    TextIndex.build(first, path, n_buckets=8)
    idx0 = TextIndex.load(path)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx0.add_documents(rest, _fail_after_postings=True)

    idx = TextIndex.load(path)       # repair: must see the batch as landed
    assert idx.n_docs == 5           # empty docs still counted
    idx.add_documents(rest)          # retry must no-op (absorbed)
    assert idx.n_docs == 5
    terms = ("spark", "join")
    got = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
    assert got == want


def test_text_index_all_empty_corpus(spark, tmp_path):
    """Build over an all-empty-text corpus: the 0-row partitioned
    writes leave no parquet files, but search must return the
    contract-schema empty frame (not UNABLE_TO_INFER_SCHEMA), and a
    later real append onto it must work."""
    from lab_1806_vec_db_spark.operators.search import TextIndex

    empty_docs = spark.createDataFrame(
        [(0, ""), (1, "  ")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "ti")
    TextIndex.build(empty_docs, path, n_buckets=4)
    idx = TextIndex.load(path)
    assert idx.n_docs == 2 and idx.sum_dl == 0
    out = idx.search(spark, ("spark",), k=5)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "score", "n_terms_hit"]

    real = spark.createDataFrame(
        [(2, "spark join"), (3, "spark window")], "doc_id bigint, text string"
    )
    idx.add_documents(real)
    got = [tuple(r) for r in idx.search(spark, ("spark",), k=5).collect()]
    union = empty_docs.unionByName(real)
    want = [tuple(r) for r in bm25_topk(union, ("spark",), k=5).collect()]
    assert got == want


def test_text_index_string_id_empty_search_schema(spark, tmp_path):
    """Non-bigint id column: the empty-index search result must carry
    the id type recorded at build time, not a hardcoded bigint."""
    from lab_1806_vec_db_spark.operators.search import TextIndex

    docs = spark.createDataFrame(
        [("a", ""), ("b", "")], "doc_id string, text string"
    )
    path = str(tmp_path / "ti")
    TextIndex.build(docs, path, n_buckets=4)
    idx = TextIndex.load(path)
    out = idx.search(spark, ("spark",), k=5)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    assert out.collect() == []


@pytest.mark.parametrize("script", [
    # (batch_idx, crash_mode) per step; None = clean append.
    # Every crashed step is followed by load()-repair + clean retry.
    [(1, None), (2, "after"), (3, None)],
    [(1, "before"), (2, "after"), (3, "after")],
    [(1, "after"), (2, "before"), (3, None)],
    [(1, "after"), (2, None), (3, "before")],
])
def test_text_index_append_protocol_sequences(spark, tmp_path, script):
    """Protocol gauntlet: arbitrary interleavings of clean appends,
    crashes before/after the postings commit, repairs, and retries
    must always converge to every batch applied exactly once — with
    empty-text docs present in every batch, the exact scenario that
    used to skew n_docs/avgdl."""
    from lab_1806_vec_db_spark.operators.search import TextIndex

    rows = [
        (0, "spark join window"), (1, ""), (2, "spark shuffle join"),
        (3, "  "), (4, "window spark"), (5, "join join window"),
        (6, ""), (7, "shuffle window spark join"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    batches = [
        docs.filter(F.col("doc_id") < 2),
        docs.filter((F.col("doc_id") >= 2) & (F.col("doc_id") < 4)),
        docs.filter((F.col("doc_id") >= 4) & (F.col("doc_id") < 6)),
        docs.filter(F.col("doc_id") >= 6),
    ]
    path = str(tmp_path / "ti")
    TextIndex.build(batches[0], path, n_buckets=8)
    idx = TextIndex.load(path)
    for b, mode in script:
        if mode is None:
            idx.add_documents(batches[b])
            continue
        kw = {"_fail_before_postings": True} if mode == "before" else \
             {"_fail_after_postings": True}
        with pytest.raises(RuntimeError, match="injected crash"):
            idx.add_documents(batches[b], **kw)
        idx = TextIndex.load(path)          # repair
        idx.add_documents(batches[b])       # retry (no-op iff absorbed)
    assert idx.n_docs == 8
    terms = ("spark", "join", "window")
    got = [tuple(r) for r in idx.search(spark, terms, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
    assert got == want
    # reopen: committed state serves identically
    idx2 = TextIndex.load(path)
    assert idx2.n_docs == 8
    got2 = [tuple(r) for r in idx2.search(spark, terms, k=10).collect()]
    assert got2 == want
