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
    # Materialize the token array ONCE (a non-cheap alias consumed by
    # both dl and the explode stays un-inlined by CollapseProject),
    # and filter to the query terms INSIDE the array before exploding:
    # explode(filter(toks, isin)) ≡ explode(toks) then filter (order
    # and duplicates preserved), but only matching occurrences ever
    # become rows — the non-matching ~99% of tokens never leave the
    # array cell (guide §2.3: project/filter before fan-out).
    term_list = list(terms)
    base = docs.select(F.col(id_col), toks.alias("__toks")).select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode(
            F.filter(F.col("__toks"), lambda t: t.isin(term_list))
        ).alias("term"),
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
        base
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
                 id_col: str = "doc_id", id_type: str = "bigint"):
        self.path = path
        self.n_docs = n_docs
        self.sum_dl = sum_dl
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.id_type = id_type

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
        # materialize ONCE and derive both postings and df from the
        # same frame — no re-read of the just-written postings, so an
        # all-empty (zero-postings) corpus builds cleanly even though
        # a 0-row partitioned write leaves no parquet files to infer
        # a schema from
        tf = _textindex_tf(docs, text_col, id_col, n_buckets)
        tf = tf.localCheckpoint(eager=True)
        tf.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "postings")
        )
        df_frame = tf.groupBy("term", "bucket").agg(
            F.count("*").alias("df")
        )
        df_frame.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "df")
        )
        row = docs.select(
            F.count("*").alias("n"), F.sum(F.size(toks)).alias("s")
        ).first()
        id_type = docs.schema[id_col].dataType.simpleString()
        meta = {"n_docs": int(row["n"] or 0), "sum_dl": int(row["s"] or 0),
                "n_buckets": n_buckets, "id_col": id_col,
                "id_type": id_type, "absorbed": []}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(path, meta["n_docs"], meta["sum_dl"], n_buckets,
                   id_col=id_col, id_type=id_type)

    @classmethod
    def load(cls, path: str) -> "TextIndex":
        import json
        import os

        pending = os.path.join(path, "pending_append.json")
        if os.path.exists(pending):
            # a crashed add_documents left postings ahead of df/meta —
            # settle the crashed batch and rebuild df/meta
            cls._repair(path)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(path, meta["n_docs"], meta["sum_dl"], meta["n_buckets"],
                   id_col=meta["id_col"],
                   id_type=meta.get("id_type", "bigint"))

    @classmethod
    def _repair(cls, path: str) -> None:
        """Crash-window repair. The pending marker written by
        ``add_documents`` carries the batch signature (count + xor of
        per-id hashes), probe ids (ids of batch docs that HAVE ≥1
        token — empty-text docs write no postings rows, so probing
        them would misread a landed batch as lost), and the exact
        pre-append / batch-delta (n_docs, sum_dl) stats. Repair:

        - df counts are a pure function of the postings table →
          recompute and rewrite them;
        - (n_docs, sum_dl) are NOT derivable from postings (empty
          docs have no rows there but count toward n_docs/avgdl) →
          restore them as marker.pre (+ marker.delta when the batch
          landed), preserving bit-identity with ``bm25_topk`` even
          when empty documents exist;
        - the postings job commits atomically, so ANY probe id
          present ⇒ the whole batch landed. A batch with no probe
          ids (all docs empty-text) appends zero postings rows, so
          "landed" and "lost" are physically identical — treat it as
          landed and absorb it, which keeps the retry path a no-op.
        - a landed batch's signature is appended to the (capped)
          ``absorbed`` log in meta.json, so a DELAYED retry — even
          after other appends have intervened — is still detected.

        Markers from older layouts (no pre/delta) fall back to
        recomputing stats from postings (undercounts empty docs; the
        current writer always records pre/delta).
        Requires an active SparkSession."""
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
        pending_path = os.path.join(path, "pending_append.json")
        with open(pending_path) as f:
            pend = json.load(f)

        postings = None
        try:
            postings = spark.read.parquet(os.path.join(path, "postings"))
            postings.schema  # force schema inference now
        except Exception:
            # no parquet files at all (index built on an all-empty
            # corpus, crashed batch never landed): nothing to rebuild
            postings = None
        if postings is not None:
            df_frame = postings.groupBy("term", "bucket").agg(
                F.count("*").alias("df")
            )
            df_frame = df_frame.localCheckpoint(eager=True)
            df_frame.write.mode("overwrite").partitionBy("bucket").parquet(
                os.path.join(path, "df")
            )

        if "pre" in pend and "delta" in pend:
            probe_ids = pend.get("probe_ids") or []
            if probe_ids:
                landed = postings is not None and (
                    postings.filter(
                        F.col(meta["id_col"]).isin(probe_ids)
                    ).limit(1).count() > 0
                )
            else:
                # all-empty-text batch: a zero-row append leaves no
                # trace either way — absorb it (the retry no-ops, and
                # pre+delta is then the correct committed state)
                landed = True
            if landed:
                meta["n_docs"] = int(pend["pre"]["n_docs"]) + int(pend["delta"]["n_docs"])
                meta["sum_dl"] = int(pend["pre"]["sum_dl"]) + int(pend["delta"]["sum_dl"])
                sig = pend.get("sig")
                if sig is not None:
                    log = [s for s in meta.get("absorbed", []) if s != sig]
                    log.append(sig)
                    meta["absorbed"] = log[-64:]
            else:
                meta["n_docs"] = int(pend["pre"]["n_docs"])
                meta["sum_dl"] = int(pend["pre"]["sum_dl"])
        else:
            # legacy marker: best effort from postings (documented
            # empty-doc undercount); unknown batch → not absorbed
            if postings is not None:
                stats = (
                    postings.groupBy(meta["id_col"])
                    .agg(F.first("dl").alias("dl"))
                    .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
                    .first()
                )
                meta["n_docs"] = int(stats["n"] or 0)
                meta["sum_dl"] = int(stats["s"] or 0)
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
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
        if self.n_docs == 0 or self.sum_dl == 0:
            # empty index OR no postings at all (every doc empty-text):
            # a 0-row partitioned write leaves no parquet part files,
            # so the reads below could not even infer a schema — return
            # the contract-schema empty frame BEFORE touching disk, with
            # the id type recorded at build time (not hardcoded)
            id_type = getattr(self, "id_type", "bigint")
            return spark.createDataFrame(
                [], f"`{id_col}` {id_type}, score double, n_terms_hit bigint"
            )
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
    _fail_after_postings: bool = False,
    _fail_before_postings: bool = False,
) -> "TextIndex":
    """O(batch) incremental append to a persisted ``TextIndex`` — the
    lexical twin of the IVF+PQ partitioned append (`index/ivfpq.py:
    add_batch`): new postings APPEND into their bucket directories
    (no existing file is rewritten), per-term document frequencies
    merge for the TOUCHED buckets only (dynamic partition overwrite —
    untouched bucket directories are not written), and the (n_docs,
    sum_dl) stats update in meta.json. Caller contract (as with
    ``VecDB.batch_add``): new ids are distinct from indexed ones.

    Crash protocol: a pending marker holds (a) the batch SIGNATURE —
    row count + order-independent xor of per-id hashes, O(1) bytes no
    matter the batch size, (b) up to 20 PROBE ids drawn only from docs
    with ≥1 token (empty-text docs write no postings rows and would
    misread a landed batch as lost), and (c) the exact pre-append and
    batch-delta (n_docs, sum_dl). ``TextIndex._repair`` settles a
    crashed batch from that marker; landed-batch signatures persist in
    meta.json's capped ``absorbed`` log, so a retry of a crashed-then-
    absorbed batch no-ops even after OTHER appends have intervened.

    ``_fail_before_postings`` / ``_fail_after_postings`` are crash-
    injection hooks for the protocol tests — they raise at the two
    interesting crash points.

    After the append, ``search`` over the index is bit-identical to
    ``bm25_topk`` over the unioned corpus (gated in
    tests/test_search_events.py)."""
    import json
    import os

    id_col = getattr(idx, "id_col", "doc_id")
    spark = docs.sparkSession
    toks = _nonempty_toks(text_col)
    # ONE pass for the batch delta stats + signature (xor never
    # overflows and is order/partitioning-independent)
    sig_row = docs.select(
        F.col(id_col), F.size(toks).alias("__dl")
    ).agg(
        F.count("*").alias("n"),
        F.sum("__dl").alias("s"),
        F.bit_xor(F.xxhash64(F.col(id_col).cast("string"))).alias("h"),
    ).first()
    delta = {"n_docs": int(sig_row["n"] or 0), "sum_dl": int(sig_row["s"] or 0)}
    sig = {"n": delta["n_docs"], "h": int(sig_row["h"] or 0)}
    probe_ids = [
        r[0]
        for r in docs.filter(F.size(toks) > 0).select(id_col).limit(20).collect()
    ]

    pending = os.path.join(idx.path, "pending_append.json")
    if os.path.exists(pending):
        # a prior append crashed and was never repaired: settle it
        # first, then refresh our view of the committed state
        TextIndex._repair(idx.path)
        reloaded = TextIndex.load(idx.path)
        idx.n_docs, idx.sum_dl = reloaded.n_docs, reloaded.sum_dl
    with open(os.path.join(idx.path, "meta.json")) as f:
        meta = json.load(f)
    if sig in meta.get("absorbed", []):
        # RETRY of a crashed-then-absorbed batch: its postings are
        # already in (the postings job commits atomically and repair
        # rebuilt df/meta over them) — appending again would
        # double-count, so no-op
        return idx
    marker = {"sig": sig, "probe_ids": probe_ids,
              "pre": {"n_docs": idx.n_docs, "sum_dl": idx.sum_dl},
              "delta": delta}
    with open(pending + ".tmp", "w") as f:
        json.dump(marker, f)
    os.replace(pending + ".tmp", pending)
    if _fail_before_postings:
        raise RuntimeError("injected crash before postings append")

    # materialize ONCE: the same frame feeds the postings write and the
    # df delta — one tokenize pass, and no risk of lineage
    # recomputation diverging between the uses
    new_tf = _textindex_tf(docs, text_col, id_col, idx.n_buckets)
    new_tf = new_tf.localCheckpoint(eager=True)
    new_tf.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(idx.path, "postings")
    )
    if _fail_after_postings:
        raise RuntimeError("injected crash after postings append")

    df_delta = new_tf.groupBy("term", "bucket").agg(F.count("*").alias("df_new"))
    touched = [int(r["bucket"]) for r in df_delta.select("bucket").distinct().collect()]
    try:
        old_df = (
            spark.read.parquet(os.path.join(idx.path, "df"))
            .filter(F.col("bucket").isin(touched))
        )
        old_df.schema  # force schema inference now
    except Exception:
        # base index built on an all-empty corpus: its 0-row df write
        # left no parquet files to infer a schema from
        old_df = spark.createDataFrame([], "term string, bucket bigint, df bigint")
    merged = (
        old_df.join(df_delta, ["term", "bucket"], "full_outer")
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

    # stats delta came from the raw batch (computed above, BEFORE the
    # marker): docs with zero non-empty tokens have no postings row but
    # MUST count in n_docs to stay bit-identical with the ad-hoc
    # bm25_topk over the union corpus
    idx.n_docs += delta["n_docs"]
    idx.sum_dl += delta["sum_dl"]
    meta["n_docs"] = idx.n_docs
    meta["sum_dl"] = idx.sum_dl
    tmp = os.path.join(idx.path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(idx.path, "meta.json"))
    os.remove(pending)
    return idx


TextIndex.add_documents = textindex_add_documents


def _local_relation_rows(df: DataFrame) -> list | None:
    """Rows of a DataFrame whose optimized plan is a ``LocalRelation``
    (driver-created data, e.g. ``spark.createDataFrame``), fetched
    WITHOUT submitting a Spark job — ``LocalTableScanExec`` answers
    ``collect()`` driver-side. Returns None when the plan is not local
    (a real distributed frame) or the probe fails; callers then use a
    job-based path."""
    try:
        if df.isStreaming:
            return None
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() != "LocalRelation":
            return None
        return df.collect()
    except Exception:
        return None


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
    term_pool: "Sequence[str] | None" = None,
) -> DataFrame:
    """Batch BM25: many queries share ONE corpus pass — the lexical
    twin of ``operators/knn.py:knn_batch``. ``queries`` carries
    (query_id, terms array<string>).

    ``term_pool``: the union of all query terms, when the caller
    already has it driver-side (it built the queries frame from local
    data) — skips the plan-build pool probe entirely. Must cover every
    term in ``queries`` (it prunes the corpus-side explode; a missing
    term would silently drop its matches).

    Plan: the query set explodes to (query_id, term) rows and
    BROADCASTS into the token stream (queries are small by contract,
    like the vector batch's query block), so the corpus-side explode
    is filtered to the union of all query terms before the single
    (doc, term) shuffle; df/stats come back as broadcasts exactly as
    in the single-query path; per-(query, doc) scores roll up in the
    same aggregation, and the final cut is a rank window partitioned
    by query — k-bounded rows per query out of the shuffle.

    EAGER-EVALUATION NOTE: building this plan needs the distinct query
    term pool (to pre-filter corpus tokens before the explode). For a
    driver-created ``queries`` frame (``spark.createDataFrame`` —
    optimizes to a LocalRelation) the pool is read driver-side with NO
    Spark job; for a genuinely distributed ``queries`` frame ONE
    bounded job (distinct terms, limit 100k+1) runs at composition
    time and the queries lineage is evaluated again by the broadcast
    join — pass a cached/localCheckpointed frame if that lineage is
    expensive or non-deterministic.

    Determinism matches ``bm25_topk`` exactly (same formula, rounding,
    (score desc, id) tie rule), so per-query results equal the
    single-query operator's — gated in tests/test_search_events.py.
    """
    toks = _nonempty_toks(text_col)
    qterms = queries.select(
        F.col(qid_col), F.explode(F.col(qterms_col)).alias("term")
    ).distinct()

    # The query batch is small by contract (the lexical twin of the
    # vector query block), so its distinct term pool is collectable;
    # pre-filtering the token array to that pool BEFORE the explode
    # keeps the ~99% non-matching token occurrences from ever becoming
    # rows (guide §2.3). Guarded: an adversarially huge term pool
    # falls back to the explode-then-broadcast-join plan unchanged.
    _POOL_CAP = 100_000
    if term_pool is not None:
        term_pool = list(term_pool)
    else:
        # LocalRelation fast-path: a genuinely local queries plan
        # yields its rows with no Spark job at plan-build time. Same
        # distinct set the explode produces (explode skips null/empty
        # arrays and keeps null elements); isin() is order-insensitive.
        # NOTE: PySpark's createDataFrame parallelizes local data into
        # a LogicalRDD, which this probe deliberately does NOT match
        # (collecting it would run a job) — callers holding the data
        # pass ``term_pool`` instead.
        local_rows = _local_relation_rows(queries.select(qterms_col))
        if local_rows is not None:
            pool: set = set()
            for r in local_rows:
                terms_cell = r[0]
                if terms_cell is None:
                    continue
                pool.update(terms_cell)
                if len(pool) > _POOL_CAP:
                    break
            term_pool = list(pool)
        else:
            pool_rows = (
                qterms.select("term").distinct().limit(_POOL_CAP + 1).collect()
            )
            term_pool = [r.term for r in pool_rows]
    if len(term_pool) <= _POOL_CAP:
        base = docs.select(F.col(id_col), toks.alias("__toks")).select(
            F.col(id_col),
            F.size("__toks").alias("dl"),
            F.explode(
                F.filter(F.col("__toks"), lambda t: t.isin(term_pool))
            ).alias("term"),
        )
    else:
        base = docs.select(
            F.col(id_col),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )

    dl_frame = docs.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = dl_frame.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    # (pre-filtered) corpus tokens ⋈ broadcast query terms: fans a
    # token out to every query using it, then ONE keyed shuffle on
    # (query, doc, term)
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
