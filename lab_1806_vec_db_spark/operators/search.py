"""Full-text relevance search: BM25 top-k over a document corpus.

The reference engine is vector-only (SURVEY §2.4: its read path is
kNN / range search); lexical relevance search is a north-star
extension — the retrieval twin of `operators/knn.py` for the text
modality, and the standard first-stage retriever in LLM data
pipelines (hard-negative mining, retrieval-augmented filtering,
benchmark contamination probes by query).

Plan shape (designed for the 100 TB corpus, verified in
tests/test_plans.py):

- tokenization is a map-only ``explode`` fused into the scan; the
  document length travels WITH each token row (computed as a map-only
  ``size(filter(split(...)))`` projection before the explode), so no
  separate doc-length shuffle or join against the full corpus exists;
- the query-term filter applies BEFORE the only wide shuffle, so the
  per-(doc, term) aggregation shuffles only rows whose token is one of
  the (few) query terms — shuffle volume is O(matching tokens), not
  O(corpus tokens);
- document frequencies are a ≤|terms|-row aggregate of that same
  frame, broadcast back (BroadcastHashJoin — never a big-big join);
- corpus stats (N, avgdl) are a 1-row aggregate cross-joined in;
- the final top-k is ``ORDER BY score LIMIT k`` → Catalyst plans
  TakeOrderedAndProject: per-partition bounded heaps, k-bounded driver
  merge, no global sort.

Determinism contract (driver oracle): avgdl is computed as
exact-integer ``sum(dl)/n_docs`` (not a float running mean), scores
are rounded half-up to 4 decimals before the ordering, and ties break
by doc_id — identical in the DuckDB oracle
(plans/pipeline_queries.py:text_bm25_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nonempty_toks(text_col: str):
    """Whitespace tokens with empties removed — THE tokenizer every
    BM25 path shares (single definition keeps the bit-identical
    contract between ad-hoc, indexed, and batch scoring)."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))


def _bm25_scored(tf_with_stats: DataFrame, group_cols: list, k1: float, b: float) -> DataFrame:
    """Shared scoring tail: input carries (tf, dl, df, n_docs, avgdl);
    output is (group_cols..., score, n_terms_hit) with the repo-wide
    rounding. ONE definition — the single-query, indexed, and batch
    paths all call this, so the formula cannot drift between them."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    w = (
        idf * F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf_with_stats.withColumn("__w", w)
        .groupBy(*group_cols)
        .agg(
            (F.round(F.sum("__w"), 4) + F.lit(0.0)).alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 relevance to the bag of query
    ``terms`` (Robertson idf: ``ln(1 + (N - df + .5)/(df + .5))``).

    Returns (id_col, score, n_terms_hit) ordered by rounded score
    descending, id ascending.
    """
    toks = _nonempty_toks(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )

    # corpus stats from the map-only (id, dl) projection — dl is a
    # per-document constant, so first() per doc == the projection
    dl_frame = docs.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = dl_frame.agg(
        F.count("*").alias("n_docs"),
        # exact integer sum, one double division — engine-portable
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    tf = (
        base.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    df_frame = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = _bm25_scored(
        tf.join(F.broadcast(df_frame), "term").crossJoin(F.broadcast(stats)),
        [id_col], k1, b,
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


class TextIndex:
    """Persisted inverted index for BM25: the postings table
    (doc, term, tf, dl) written ``partitionBy(bucket)`` where
    ``bucket = pmod(xxhash64(term), n_buckets)`` — so a query reads
    ONLY its terms' bucket directories (Spark partition pruning, the
    lexical twin of the IVF cluster layout in ``index/ivf.py``) and
    the term equality filter pushes into the parquet scan.

    Build cost: the same single (doc, term) shuffle the ad-hoc
    ``bm25_topk`` pays once per query, paid once ever; df (per-term
    document frequency) and the (n_docs, avgdl) stats persist beside
    the postings. Serving reads O(postings of the query terms) bytes
    regardless of corpus size.

    Results are bit-identical to ``bm25_topk`` on the same corpus
    (same formula, same exact-integer avgdl, same rounding and tie
    rule) — gated in tests/test_search_events.py.
    """

    def __init__(self, path: str, n_docs: int, sum_dl: int, n_buckets: int,
                 id_col: str = "doc_id"):
        self.path = path
        self.n_docs = n_docs
        self.sum_dl = sum_dl
        self.n_buckets = n_buckets
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_buckets: int = 64,
    ) -> "TextIndex":
        import json
        import os

        toks = _nonempty_toks(text_col)
        tf = _textindex_tf(docs, text_col, id_col, n_buckets)
        tf.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "postings")
        )
        spark = docs.sparkSession
        postings = spark.read.parquet(os.path.join(path, "postings"))
        df_frame = postings.groupBy("term", "bucket").agg(
            F.count("*").alias("df")
        )
        df_frame.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "df")
        )
        row = docs.select(
            F.count("*").alias("n"), F.sum(F.size(toks)).alias("s")
        ).first()
        meta = {"n_docs": int(row["n"] or 0), "sum_dl": int(row["s"] or 0),
                "n_buckets": n_buckets, "id_col": id_col}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(path, meta["n_docs"], meta["sum_dl"], n_buckets,
                   id_col=id_col)

    @classmethod
    def load(cls, path: str) -> "TextIndex":
        import json
        import os

        pending = os.path.join(path, "pending_append.json")
        if os.path.exists(pending):
            # a crashed add_documents left postings ahead of df/meta —
            # rebuild both from the postings table (the ground truth)
            cls._repair(path)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(path, meta["n_docs"], meta["sum_dl"], meta["n_buckets"],
                   id_col=meta["id_col"])

    @classmethod
    def _repair(cls, path: str) -> None:
        """Crash-window repair: df counts and (n_docs, sum_dl) are pure
        functions of the postings table, so recompute both from it and
        clear the pending marker. Requires an active SparkSession."""
        import json
        import os

        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "TextIndex repair needs an active SparkSession "
                f"(pending append marker at {path})"
            )
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        postings = spark.read.parquet(os.path.join(path, "postings"))
        df_frame = postings.groupBy("term", "bucket").agg(F.count("*").alias("df"))
        df_frame = df_frame.localCheckpoint(eager=True)
        df_frame.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "df")
        )
        # note: documents with zero non-empty tokens have no postings
        # row, so a repair undercounts them in n_docs (their dl is 0,
        # so avgdl's numerator is unaffected) — an accepted skew only
        # for empty documents
        stats = postings.groupBy(meta["id_col"]).agg(F.first("dl").alias("dl")).agg(
            F.count("*").alias("n"), F.sum("dl").alias("s")
        ).first()
        meta["n_docs"] = int(stats["n"] or 0)
        meta["sum_dl"] = int(stats["s"] or 0)
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
        # Decide the crashed batch's fate: the postings job commits
        # atomically, so ONE present batch id implies the whole batch
        # landed. If it landed, keep the id list as the ABSORBED
        # marker — a later retry of that same batch detects it and
        # no-ops instead of double-appending. If it never landed,
        # drop the marker so the retry re-appends normally.
        pending_path = os.path.join(path, "pending_append.json")
        with open(pending_path) as f:
            pend = json.load(f)
        probe_ids = (pend.get("batch_ids") or [])[:20]
        landed = bool(probe_ids) and (
            postings.filter(
                F.col(meta["id_col"]).isin(probe_ids)
            ).limit(1).count() > 0
        )
        if landed:
            os.replace(
                pending_path, os.path.join(path, "absorbed_append.json")
            )
        else:
            os.remove(pending_path)

    def search(
        self,
        spark,
        terms: tuple[str, ...],
        k: int = 20,
        k1: float = 1.2,
        b: float = 0.75,
        id_col: str | None = None,
    ) -> DataFrame:
        import os

        id_col = id_col or getattr(self, "id_col", "doc_id")
        term_list = list(terms)
        # bucket pruning predicate: Catalyst folds pmod(xxhash64(lit))
        # to constants, so the scan shows PartitionFilters: bucket IN (…)
        bucket_of = {
            t: r["b"]
            for t, r in zip(
                term_list,
                spark.createDataFrame([(t,) for t in term_list], "term string")
                .select(F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)).alias("b"))
                .collect(),
            )
        }
        buckets = sorted({int(b_) for b_ in bucket_of.values()})
        postings = (
            spark.read.parquet(os.path.join(self.path, "postings"))
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(term_list))
        )
        df_frame = (
            spark.read.parquet(os.path.join(self.path, "df"))
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(term_list))
            .select("term", "df")
        )
        if self.n_docs == 0:
            # empty index: no postings, no division — empty result with
            # the contract schema
            return spark.createDataFrame(
                [], f"`{id_col}` bigint, score double, n_terms_hit bigint"
            )
        avgdl = float(self.sum_dl) / self.n_docs
        scored = _bm25_scored(
            postings.join(F.broadcast(df_frame), "term")
            .withColumn("n_docs", F.lit(self.n_docs))
            .withColumn("avgdl", F.lit(avgdl)),
            [id_col], k1, b,
        )
        return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of k-bounded ranked lists: score(d) =
    Σ_systems 1/(c + rank_d) — the standard hybrid-search combiner
    (lexical + semantic retrieval). Each input frame must carry
    (id_col, rank) with rank already assigned 1..k_i by that system's
    own deterministic ordering; inputs are top-k cuts (tiny by
    construction), so the union + rollup here is driver-scale work no
    matter how large the corpus that produced them. Ties on the fused
    score break by id."""
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked input")
    tagged = None
    for f in ranked:
        part = f.select(F.col(id_col), F.col("rank"))
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = (
        tagged.withColumn("contrib", F.lit(1.0) / (F.lit(float(c)) + F.col("rank")))
        .groupBy(id_col)
        .agg(
            (F.round(F.sum("contrib"), 4) + F.lit(0.0)).alias("rrf_score"),
            F.count("*").alias("n_systems"),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)


def with_rank(df: DataFrame, order_cols: list, id_col: str = "doc_id") -> DataFrame:
    """Attach 1-based rank by the given ordering. Single-partition
    window — ONLY for k-bounded frames (top-k outputs), where the
    global sort is a handful of rows."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return df.withColumn("rank", F.row_number().over(w))


def _textindex_tf(docs: DataFrame, text_col: str, id_col: str,
                  n_buckets: int) -> DataFrame:
    toks = _nonempty_toks(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    return (
        base.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )


def textindex_add_documents(
    idx: "TextIndex",
    docs: DataFrame,
    text_col: str = "text",
) -> "TextIndex":
    """O(batch) incremental append to a persisted ``TextIndex`` — the
    lexical twin of the IVF+PQ partitioned append (`index/ivfpq.py:
    add_batch`): new postings APPEND into their bucket directories
    (no existing file is rewritten), per-term document frequencies
    merge for the TOUCHED buckets only (dynamic partition overwrite —
    untouched bucket directories are not written), and the (n_docs,
    sum_dl) stats update in meta.json. Caller contract (as with
    ``VecDB.batch_add``): new ids are distinct from indexed ones.

    After the append, ``search`` over the index is bit-identical to
    ``bm25_topk`` over the unioned corpus (gated in
    tests/test_search_events.py)."""
    import json
    import os

    id_col = getattr(idx, "id_col", "doc_id")
    spark = docs.sparkSession
    batch_ids = sorted(
        int(r[0]) for r in docs.select(id_col).distinct().collect()
    )
    # crash-window marker WITH the batch's ids: if we die between the
    # postings append and the meta commit, the next load() rebuilds
    # df + stats from the postings table (TextIndex._repair) — and a
    # RETRY of the same batch is detected here and becomes a no-op
    # repair instead of a double-append (the postings job commits
    # atomically, so after a crash the batch is either fully absent or
    # fully present; repair handles both).
    pending = os.path.join(idx.path, "pending_append.json")
    absorbed = os.path.join(idx.path, "absorbed_append.json")
    if os.path.exists(pending):
        # a prior append crashed and was never repaired: repair now
        # (renames the marker to absorbed_append.json) and refresh
        TextIndex._repair(idx.path)
        reloaded = TextIndex.load(idx.path)
        idx.n_docs, idx.sum_dl = reloaded.n_docs, reloaded.sum_dl
    if os.path.exists(absorbed):
        with open(absorbed) as f:
            prior = json.load(f)
        if prior.get("batch_ids") == batch_ids:
            # RETRY of the crashed-then-absorbed batch: its postings
            # are already in (the postings job commits atomically and
            # repair rebuilt df/meta over them) — appending again
            # would double-count, so no-op
            return idx
    with open(pending + ".tmp", "w") as f:
        json.dump({"batch_ids": batch_ids}, f)
    os.replace(pending + ".tmp", pending)

    # materialize ONCE: the same frame feeds the postings write, the
    # df delta, and the stats update — one tokenize pass, and no risk
    # of lineage recomputation diverging between the three uses
    new_tf = _textindex_tf(docs, text_col, id_col, idx.n_buckets)
    new_tf = new_tf.localCheckpoint(eager=True)
    new_tf.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(idx.path, "postings")
    )

    delta = new_tf.groupBy("term", "bucket").agg(F.count("*").alias("df_new"))
    touched = [int(r["bucket"]) for r in delta.select("bucket").distinct().collect()]
    old_df = (
        spark.read.parquet(os.path.join(idx.path, "df"))
        .filter(F.col("bucket").isin(touched))
    )
    merged = (
        old_df.join(delta, ["term", "bucket"], "full_outer")
        .select(
            "term", "bucket",
            (F.coalesce(F.col("df"), F.lit(0))
             + F.coalesce(F.col("df_new"), F.lit(0))).alias("df"),
        )
    )
    # localCheckpoint: the merged frame READS the df table it is
    # about to overwrite — materialize before the write truncates.
    # The dynamic-overwrite mode is a PER-WRITE option, not a session
    # conf mutation, so concurrent writers keep their own semantics.
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("bucket").parquet(os.path.join(idx.path, "df"))

    # stats over the raw batch (not new_tf): docs with zero non-empty
    # tokens have no postings row but MUST count in n_docs to stay
    # bit-identical with the ad-hoc bm25_topk over the union corpus.
    # This is a cheap map-only size(filter(split)) pass, not a second
    # explode.
    toks = _nonempty_toks(text_col)
    row = docs.select(
        F.count("*").alias("n"), F.sum(F.size(toks)).alias("s")
    ).first()
    idx.n_docs += int(row["n"] or 0)
    idx.sum_dl += int(row["s"] or 0)
    meta = {"n_docs": idx.n_docs, "sum_dl": idx.sum_dl,
            "n_buckets": idx.n_buckets, "id_col": id_col}
    tmp = os.path.join(idx.path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(idx.path, "meta.json"))
    os.remove(pending)
    if os.path.exists(absorbed):
        os.remove(absorbed)  # a NEW batch landed — the old memory is stale
    return idx


TextIndex.add_documents = textindex_add_documents


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qterms_col: str = "terms",
) -> DataFrame:
    """Batch BM25: many queries share ONE corpus pass — the lexical
    twin of ``operators/knn.py:knn_batch``. ``queries`` carries
    (query_id, terms array<string>).

    Plan: the query set explodes to (query_id, term) rows and
    BROADCASTS into the token stream (queries are small by contract,
    like the vector batch's query block), so the corpus-side explode
    is filtered to the union of all query terms before the single
    (doc, term) shuffle; df/stats come back as broadcasts exactly as
    in the single-query path; per-(query, doc) scores roll up in the
    same aggregation, and the final cut is a rank window partitioned
    by query — k-bounded rows per query out of the shuffle.

    Determinism matches ``bm25_topk`` exactly (same formula, rounding,
    (score desc, id) tie rule), so per-query results equal the
    single-query operator's — gated in tests/test_search_events.py.
    """
    toks = _nonempty_toks(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    qterms = queries.select(
        F.col(qid_col), F.explode(F.col(qterms_col)).alias("term")
    ).distinct()

    dl_frame = docs.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = dl_frame.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    # corpus tokens ⋈ broadcast query terms: keeps only matching tokens
    # (and fans a token out to every query using it), then ONE keyed
    # shuffle on (query, doc, term)
    tf = (
        base.join(F.broadcast(qterms), "term")
        .groupBy(qid_col, id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    # df is per (term) over the whole corpus — independent of query;
    # derive from the distinct (doc, term) pairs to avoid counting a
    # term once per query using it
    df_frame = (
        tf.select(id_col, "term").distinct()
        .groupBy("term").agg(F.count("*").alias("df"))
    )

    scored = _bm25_scored(
        tf.join(F.broadcast(df_frame), "term").crossJoin(F.broadcast(stats)),
        [qid_col, id_col], k1, b,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def textindex_compact(idx: "TextIndex", buckets: list[int] | None = None) -> int:
    """Compact the small files repeated appends leave in the postings
    bucket directories: rewrite each (given or all) bucket partition
    as one file via dynamic partition overwrite — one bucket at a
    time, so concurrent readers of OTHER buckets are untouched and
    the unit of work is bounded by a single bucket's postings.
    Returns the number of buckets rewritten. Results are unchanged
    (pure file-layout maintenance); df/meta are not touched."""
    import os

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("textindex_compact needs an active SparkSession")
    root = os.path.join(idx.path, "postings")
    if buckets is None:
        buckets = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(root)
            if d.startswith("bucket=")
        )
    for b in buckets:
        part = (
            spark.read.parquet(root)
            .filter(F.col("bucket") == b)
            .localCheckpoint(eager=True)  # materialize before overwrite
        )
        # dynamic overwrite as a PER-WRITE option — only this bucket's
        # partition is replaced, and no session conf is mutated
        part.coalesce(1).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("bucket").parquet(root)
    return len(buckets)


TextIndex.compact = textindex_compact
