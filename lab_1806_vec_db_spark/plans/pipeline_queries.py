"""Driver-contract entries for the LLM-pipeline operators: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
text analysis, typed u8 vectors, and event-time windowed aggregation.

Every hash below is the md5-prefix 32-bit form, identical in Spark
(``conv(substring(md5(x),1,8),16,10)``) and DuckDB
(``('0x' || substr(md5(x),1,8))::BIGINT``) — verified bit-equal — so
MinHash signatures, LSH buckets, SimHash fingerprints, and rolling
fingerprints are all exactly SQL-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.functions import text as T
from lab_1806_vec_db_spark.functions.distance import cast_vec_expr
from lab_1806_vec_db_spark.operators import dedup as D
from lab_1806_vec_db_spark.operators import knn as knn_ops
from lab_1806_vec_db_spark.plans.entry_queries import _U8_SQL, _dd, register
from lab_1806_vec_db_spark.session import read_table
from lab_1806_vec_db_spark.streaming.windows import tumbling_agg


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # defensive: the driver may hand us a session without our defaults;
    # both are runtime-settable SQL confs (session.py sets them too)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events.ts is TIMESTAMP(NANOS)
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # window_start strings must be TZ-stable
    return read_table(spark, sf_dir, "events")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


# ---- DuckDB SQL fragment generators (mirror functions/text.py) -------------

def _hash32_sql(x: str) -> str:
    return f"CAST(('0x' || substr(md5({x}),1,8)) AS BIGINT)"


_TOKS = "string_split(text, ' ')"


def _shingles_sql(n: int = 3) -> str:
    """list_distinct word n-grams of _TOKS (mirrors dedup.word_shingles)."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({_TOKS}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({_TOKS}, i, i + {n - 1}), ' ')))"
    )


def _minhash_sig_sql(n: int, num_hashes: int, sh: str = "sh") -> str:
    """[sig_0, ..., sig_{p-1}] (mirrors dedup.minhash_signatures:
    sig_j = min (A_j·hash32(s) + B_j) mod P — affine permutations of
    one md5-prefix hash per shingle; exact in BIGINT on both engines)."""
    from lab_1806_vec_db_spark.operators.dedup import MINHASH_P, minhash_perm_consts

    parts = []
    for j in range(num_hashes):
        a_j, b_j = minhash_perm_consts(j)
        parts.append(
            f"coalesce(list_min(list_transform({sh}, "
            f"s -> ({a_j} * {_hash32_sql('s')} + {b_j}) % {MINHASH_P})), CAST(-1 AS BIGINT))"
        )
    return "[" + ", ".join(parts) + "]"


# ---- exact dedup -----------------------------------------------------------


@register(
    "dedup_exact_groups",
    """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1""",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: one hash-groupBy shuffle, min-id canonical."""
    return D.exact_dedup_groups(_docs(spark, sf_dir)).orderBy("content_hash")


# ---- n-gram Jaccard --------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    f"""WITH sh AS (
  SELECT doc_id, {_shingles_sql(3)} AS sh FROM documents WHERE doc_id < 40)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
         THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh)))
         ELSE 0.0 END, 4) + 0.0 AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
ORDER BY id_a, id_b""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-gram Jaccard on a bounded subset (the verify
    metric of the MinHash pipeline)."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 40)
    return D.ngram_jaccard_pairs(docs, n=3).orderBy("id_a", "id_b")


# ---- MinHash ---------------------------------------------------------------


@register(
    "dedup_minhash_sig",
    f"""WITH sh AS (
  SELECT doc_id, {_shingles_sql(3)} AS sh FROM documents WHERE doc_id < 100)
SELECT doc_id, md5(array_to_string({_minhash_sig_sql(3, 8)}, ',')) AS sig_hash
FROM sh ORDER BY doc_id""",
)
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 permutations over 3-gram shingles),
    hashed to one hex string per doc for stable comparison."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    sig = D.minhash_signatures(docs, n=3, num_hashes=8)
    return sig.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.transform(F.col("sig"), lambda x: x.cast("string")))).alias("sig_hash"),
    ).orderBy("doc_id")


@register(
    "dedup_lsh_pairs",
    f"""WITH sh AS (
  SELECT doc_id, {_shingles_sql(3)} AS sh FROM documents WHERE doc_id < 200),
sig AS (SELECT doc_id, {_minhash_sig_sql(3, 16)} AS sig FROM sh),
banded AS (
  SELECT doc_id, b.band_id,
         md5(array_to_string(list_slice(sig, b.band_id*4 + 1, b.band_id*4 + 4), ',')) AS bucket
  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band_id) b
  /* no shingles -> no bucket (dedup.py:lsh_candidate_pairs) */
  WHERE sig[1] != -1)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 ORDER BY 1, 2""",
)
def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs (16 hashes × 4 bands): the
    shuffle key is (band, bucket) — never an all-pairs product."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=4).orderBy("id_a", "id_b")


@register(
    "dedup_components",
    f"""WITH sh AS (
  SELECT doc_id, {_shingles_sql(3)} AS sh FROM documents WHERE doc_id < 200),
sig AS (SELECT doc_id, {_minhash_sig_sql(3, 16)} AS sig FROM sh),
banded AS (
  SELECT doc_id, b.band_id,
         md5(array_to_string(list_slice(sig, b.band_id*4 + 1, b.band_id*4 + 4), ',')) AS bucket
  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band_id) b
  /* no shingles -> no bucket (dedup.py:lsh_candidate_pairs) */
  WHERE sig[1] != -1),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach AS (
  -- transitive closure over the (tiny) near-dup graph
  WITH RECURSIVE r(a, b) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src)
  SELECT * FROM r)
SELECT d.doc_id,
       CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS BIGINT) AS component
FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id ORDER BY d.doc_id""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: LSH candidate pairs → connected components →
    per-doc canonical component id (min reachable doc_id). Singletons
    map to themselves."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    pairs = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=4)
    return D.connected_components(docs, pairs, id_col="doc_id").orderBy("doc_id")


# ---- SimHash ---------------------------------------------------------------

_SIMHASH_BITS_SQL = " + ".join(
    f"CASE WHEN list_sum(list_transform(hs, h -> ((h >> {b}) & 1)*2 - 1)) > 0 "
    f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(32)
)


@register(
    "dedup_simhash",
    f"""WITH h AS (
  SELECT doc_id, list_transform({_TOKS}, x -> {_hash32_sql('x')}) AS hs
  FROM documents)
SELECT doc_id, CAST({_SIMHASH_BITS_SQL} AS BIGINT) AS simhash
FROM h ORDER BY doc_id""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints for every document."""
    return D.simhash_signatures(_docs(spark, sf_dir)).orderBy("doc_id")


# ---- embedding near-dup ----------------------------------------------------

def _cos_pair_sql(a: str, b: str) -> str:
    return (
        f"round(1 - list_dot_product({a},{b}) / greatest("
        f"sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b})), 1e-10), 4) + 0.0"
    )


@register(
    "embedding_neardup",
    f"""WITH v AS (SELECT vec_id, {_dd('embedding')} AS ev FROM embeddings WHERE vec_id < 150)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos_pair_sql('a.ev', 'b.ev')} AS dist
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_cos_pair_sql('a.ev', 'b.ev')} <= 0.95
ORDER BY id_a, id_b""",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs on a bounded subset. n_blocks=2
    (3 tile groups): the 150-row input fits one vectorized tile, so the
    core-count-derived default grid would be pure scheduling overhead —
    the emitted pairs are identical for any n_blocks."""
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 150)
    return D.embedding_neardup_pairs(
        emb, threshold=0.95, n_blocks=2
    ).orderBy("id_a", "id_b")


@register(
    "embedding_lsh_neardup",
    f"""WITH p AS (SELECT vec_id AS pid, {_dd('embedding')} AS pv FROM embeddings WHERE vec_id < 4),
b AS (
  SELECT e.vec_id, {_dd('e.embedding')} AS ev,
         string_agg(CASE WHEN list_dot_product({_dd('e.embedding')}, p.pv) >= 0
                    THEN '1' ELSE '0' END, '' ORDER BY p.pid) AS bucket
  FROM embeddings e, p GROUP BY e.vec_id, ev)
SELECT a.vec_id AS id_a, b2.vec_id AS id_b, {_cos_pair_sql('a.ev', 'b2.ev')} AS dist
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE {_cos_pair_sql('a.ev', 'b2.ev')} <= 0.95
ORDER BY id_a, id_b""",
)
def embedding_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane-bucketed near-dup: the scale path — verify
    distance only within buckets. Planes = first 4 embeddings
    (deterministic, SQL-reproducible)."""
    emb = _emb(spark, sf_dir)
    planes = [
        [float(x) for x in r[0]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").select("embedding").collect()
    ]
    return D.embedding_neardup_lsh(emb, planes, threshold=0.95).orderBy("id_a", "id_b")


@register(
    "embedding_neardup_probe",
    f"""WITH a AS (SELECT vec_id AS id, {_dd('embedding')} AS va FROM embeddings WHERE label = 0),
b AS (SELECT {_dd('embedding')} AS vb FROM embeddings WHERE label <> 0),
d AS (SELECT a.id, {_cos_pair_sql('a.va', 'b.vb')} AS dist FROM a, b),
h AS (SELECT id, count(*) AS n_matches, min(dist) AS min_dist
      FROM d WHERE dist <= 0.7 GROUP BY id)
SELECT a.id AS id, CAST(coalesce(h.n_matches, 0) AS BIGINT) AS n_matches,
       coalesce(h.min_dist, -1.0) + 0.0 AS min_dist
FROM a LEFT JOIN h USING (id) ORDER BY id""",
)
def embedding_neardup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time near-dup screen (operators/dedup.py:
    embedding_neardup_probe): the label-0 rows play an incoming batch,
    the rest the existing corpus; each new vector reports how many
    corpus near-dups it has and its closest distance (-1 = novel). The
    oracle runs the bounded exact path; the ``planes`` argument is the
    bucketed scale path (tested in test_dedup_text.py)."""
    emb = _emb(spark, sf_dir)
    new = emb.filter(F.col("label") == 0)
    corpus = emb.filter(F.col("label") != 0)
    return D.embedding_neardup_probe(new, corpus, threshold=0.7).orderBy("id")


# ---- text analysis ---------------------------------------------------------

_SW = "['the','a','of','and','to','in','is','that']"


@register(
    "text_stats",
    f"""SELECT doc_id,
  len({_TOKS}) AS n_tokens,
  length(text) AS n_chars,
  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_letters,
  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
  length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS n_punct,
  round(CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}), 4) + 0.0 AS mean_token_len,
  round(CAST(len(list_filter({_TOKS}, t -> list_contains({_SW}, t))) AS DOUBLE) / len({_TOKS}), 4) + 0.0 AS stopword_ratio
FROM documents ORDER BY doc_id""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char-class statistics — one map-only pass,
    with the token array split once (char-class stats stay on the raw
    text; the three token statistics share the materialized array) and
    the doc_id sort applied to the narrow scan BEFORE the statistics
    projection (a trailing orderBy samples — i.e. re-executes — its
    whole child for range partitioning)."""
    docs = _docs(spark, sf_dir)
    stats = T.char_stats("text")
    toked = docs.orderBy("doc_id").select(
        "doc_id",
        T.tokens("text").alias("__toks"),
        stats["n_chars"].alias("n_chars"),
        stats["n_letters"].alias("n_letters"),
        stats["n_digits"].alias("n_digits"),
        stats["n_punct"].alias("n_punct"),
    )
    tk = F.col("__toks")
    return toked.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        "n_chars", "n_letters", "n_digits", "n_punct",
        (F.round(T.mean_token_len_from_tokens(tk), 4) + F.lit(0.0)).alias("mean_token_len"),
        (F.round(T.stopword_ratio_from_tokens(tk), 4) + F.lit(0.0)).alias("stopword_ratio"),
    )


def _hits_sql(words: tuple[str, ...]) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({_TOKS}, t -> list_contains({arr}, t)))"


_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN hits_{lang} >= greatest({', '.join('hits_' + o for o in sorted(T.LANG_STOPWORDS) if o < lang)}) THEN '{lang}'"
        if any(o < lang for o in T.LANG_STOPWORDS)
        else f"ELSE '{lang}' END"
        for lang in sorted(T.LANG_STOPWORDS, reverse=True)
    )
)


@register(
    "text_lang_quality",
    f"""WITH h AS (
  SELECT doc_id, text,
    {', '.join(f'{_hits_sql(T.LANG_STOPWORDS[lang])} AS hits_{lang}' for lang in sorted(T.LANG_STOPWORDS))}
  FROM documents),
s AS (
  SELECT doc_id, text, {_LANG_CASE} AS lang_pred,
    CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
    CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}) AS mtl,
    CAST(len(list_filter({_TOKS}, t -> list_contains({_SW}, t))) AS DOUBLE) / len({_TOKS}) AS swr
  FROM h)
SELECT doc_id, lang_pred,
  round((least(n_tok/50.0, 1.0)
         + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
         + least(swr*5.0, 1.0)) / 3.0, 4) + 0.0 AS quality,
  list_reduce(
    list_concat([CAST(0 AS BIGINT)],
                list_transform({_TOKS}, x -> {_hash32_sql('x')} % 1000000007)),
    (acc, h) -> (acc*31 + h) % 1000000007) AS fingerprint
FROM s ORDER BY doc_id""",
)
def text_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + composite quality score + rolling
    content fingerprint. The token array is materialized once in its
    own projection (non-cheap multi-consumer alias, kept un-inlined) —
    the before-plan re-split the text ~13x per row across the three
    statistics' higher-order folds. The sort runs FIRST on the narrow
    scan: a trailing orderBy's range-exchange sampling pass re-executes
    its child, i.e. the whole statistics projection, twice (guide §1.4
    measured: 1.23s -> 0.64s); projecting after the sort preserves the
    doc_id order and computes each statistic once."""
    docs = _docs(spark, sf_dir)
    toked = docs.orderBy("doc_id").select("doc_id", T.tokens("text").alias("__toks"))
    tk = F.col("__toks")
    return toked.select(
        "doc_id",
        T.lang_id_from_tokens(tk).alias("lang_pred"),
        T.quality_score_from_tokens(tk).alias("quality"),
        T.fingerprint_from_tokens(tk).alias("fingerprint"),
    )


# ---- u8 typed vectors (S2/F7 in query form) --------------------------------



@register(
    "knn_flat_u8",
    f"""WITH u AS (SELECT vec_id, CAST({_U8_SQL} AS DOUBLE[]) AS uv FROM embeddings),
q AS (SELECT uv AS qv FROM u WHERE vec_id = 0)
SELECT u.vec_id AS vec_id,
       round(list_dot_product(u.uv,u.uv) + list_dot_product(q.qv,q.qv)
             - 2*list_dot_product(u.uv,q.qv), 4) + 0.0 AS dist
FROM u, q ORDER BY dist, vec_id LIMIT 10""",
)
def knn_flat_u8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force kNN over a u8-quantized table (scalar.rs:117-119 u8
    vectors; cast semantics scalar.rs:20-37) — integer-exact distances."""
    emb = _emb(spark, sf_dir)
    scaled = F.transform(F.col("embedding"), lambda x: x.cast("double") * 100.0 + 128.0)
    u8 = emb.select("vec_id", cast_vec_expr(scaled, "u8").alias("uv"))
    qrow = u8.filter(F.col("vec_id") == 0).first()
    q = [float(x) for x in qrow["uv"]]
    return knn_ops.knn(u8, q, k=10, metric="l2sqr", vec_col="uv", id_col="vec_id")


# ---- multimodal binary-column plumbing -------------------------------------


@register(
    "multimodal_byte_stats",
    """SELECT doc_id AS id, CAST(length(text) AS BIGINT) AS n_bytes,
  round(CAST(list_sum(list_transform(range(1, length(text)+1),
        i -> unicode(substr(text, i, 1)))) AS DOUBLE) / length(text), 4) + 0.0 AS mean_byte,
  CAST(unicode(substr(text, 1, 1)) AS INT) AS first_byte
FROM documents ORDER BY id""",
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing probe: documents.text treated as an opaque
    BINARY media column, pushed through the Arrow-batched byte-stats
    extractor (multimodal/binary_ops.py). ASCII corpus → bytes ==
    code points, so DuckDB reproduces it exactly."""
    from lab_1806_vec_db_spark.multimodal.binary_ops import byte_stats, media_table

    docs = _docs(spark, sf_dir)
    media = media_table(docs, content_col="text", id_col="doc_id", media_type="text/plain")
    return byte_stats(media).orderBy("id")


_FEAT_BYTE_SQL = ", ".join(
    f"CASE WHEN length(text) >= {j} THEN CAST(unicode(substr(text, {j}, 1)) AS DOUBLE) "
    "ELSE 0.0 END"
    for j in range(1, 9)
)


@register(
    "multimodal_features",
    f"""SELECT doc_id AS id,
  array_to_string(list_transform(
   [CAST(length(text) AS DOUBLE),
    floor(CAST(list_sum(list_transform(range(1, length(text)+1),
          i -> unicode(substr(text, i, 1)))) AS DOUBLE)
          / CAST(length(text) AS DOUBLE) * 10000 + 0.5) / 10000 + 0.0,
    {_FEAT_BYTE_SQL}], x -> CAST(round(x * 10000) AS BIGINT)), ',') AS features_x1e4
FROM documents ORDER BY id""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode→featurize plumbing (the shape of image/audio feature
    extraction — reference has no media path; this is a pipeline
    extension): blobs flow through the Arrow-batched ``extract_features``
    ``mapInPandas`` stage (multimodal/binary_ops.py:60-95) with the
    deterministic stand-in codec, yielding ``ARRAY<DOUBLE>`` feature
    vectors. The codec is content-deterministic ([n_bytes, mean_byte,
    first 8 bytes]) so DuckDB reproduces the exact feature arrays;
    integer byte sums keep the mean IEEE-identical on both engines.
    Oracle caveat (same as multimodal_byte_stats): DuckDB indexes
    CHARACTERS, the Spark side indexes UTF-8 BYTES — equal only
    because the documents corpus is pure ASCII."""
    import numpy as np

    from lab_1806_vec_db_spark.multimodal.binary_ops import extract_features, media_table
    from lab_1806_vec_db_spark.operators.knn import np_round_half_up

    def decoder(content: bytes) -> np.ndarray:
        buf = np.frombuffer(content, dtype=np.uint8)
        size = float(buf.size)
        mean = float(int(buf.sum())) / buf.size if buf.size else 0.0
        mean = float(np_round_half_up(np.float64(mean)))
        head = np.zeros(8, dtype=np.float64)
        head[: min(8, buf.size)] = buf[:8].astype(np.float64)
        return np.concatenate([[size, mean], head])

    docs = _docs(spark, sf_dir)
    media = media_table(docs, content_col="text", id_col="doc_id", media_type="text/plain")
    feats = extract_features(media, decoder=decoder, feature_dim=10)
    # Driver contract: its pandas canonicalizer cannot sort ARRAY columns
    # (unhashable list), so project the vector to scaled-int CSV — the
    # values are already deterministic to 4 decimals on both engines.
    flat = F.concat_ws(
        ",", F.transform("features", lambda x: F.round(x * 10000).cast("bigint").cast("string"))
    )
    return feats.select("id", flat.alias("features_x1e4")).orderBy("id")


@register(
    "multimodal_frame_index",
    """WITH e AS (
  SELECT doc_id AS id,
         unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i,
         text
  FROM documents),
f AS (
  SELECT id, CAST(i AS INT) AS frame_no,
         substr(text, CAST(i AS INT) * 64 + 1, 16) AS frame
  FROM e)
SELECT id, frame_no, CAST(length(frame) AS INT) AS frame_len,
       CAST(unicode(substr(frame, 1, 1)) AS INT) AS first_byte
FROM f ORDER BY id, frame_no""",
)
def multimodal_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (the shape of video keyframe extraction):
    one 16-byte 'frame' every 64 bytes via the exploding ``mapInPandas``
    sampler (multimodal/binary_ops.py:97-124), then frame length and
    first byte computed JVM-side (hex/conv on BINARY) so the oracle can
    compare without shipping raw bytes through the hash. Oracle caveat:
    the SQL side slices CHARACTERS — byte-equal only on the pure-ASCII
    documents corpus (multimodal_byte_stats has the same contract)."""
    from lab_1806_vec_db_spark.multimodal.binary_ops import frame_sample, media_table

    docs = _docs(spark, sf_dir)
    media = media_table(docs, content_col="text", id_col="doc_id", media_type="text/plain")
    frames = frame_sample(media, every_n_bytes=64, frame_bytes=16)
    return frames.select(
        "id",
        "frame_no",
        F.length("frame").cast("int").alias("frame_len"),
        F.conv(F.hex(F.expr("substring(frame, 1, 1)")), 16, 10).cast("int").alias("first_byte"),
    ).orderBy("id", "frame_no")


@register(
    "multimodal_resize",
    """WITH r AS (
  SELECT doc_id AS id,
    list_transform(range(0, 32),
      i -> unicode(substr(text, CAST(i * length(text) // 32 AS INT) + 1, 1))) AS bytes
  FROM documents)
SELECT id, CAST(32 AS INT) AS n_bytes,
  CAST(list_sum(bytes) AS BIGINT) AS byte_sum,
  CAST(bytes[1] AS INT) AS first_byte
FROM r ORDER BY id""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (the shape of image resize / audio resample):
    nearest-sample each blob to 32 bytes through the map-only
    ``mapInPandas`` resizer (multimodal/binary_ops.py:resize_bytes),
    then re-extract byte stats through the SAME downstream extractor —
    the resized blob stays a first-class MEDIA column. Oracle mirrors
    the index arithmetic (i·n // 32) exactly; ASCII-corpus caveat as
    in multimodal_byte_stats."""
    from lab_1806_vec_db_spark.multimodal.binary_ops import (
        byte_stats, media_table, resize_bytes,
    )

    docs = _docs(spark, sf_dir)
    media = media_table(docs, content_col="text", id_col="doc_id", media_type="text/plain")
    resized = resize_bytes(media, target_bytes=32)
    stats = byte_stats(resized)
    return stats.select(
        "id", "n_bytes",
        # mean_byte is 4dp-rounded: x32 is within 0.0016 of the true
        # integer sum, so round (not truncate) recovers it exactly
        F.round(F.col("mean_byte") * 32, 0).cast("bigint").alias("byte_sum"),
        "first_byte",
    ).orderBy("id")


# ---- event-time windowed aggregation ---------------------------------------


@register(
    "events_tumbling_agg",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*) AS n_events,
  round(sum(value), 4) + 0.0 AS sum_value,
  floor((round(sum(value), 4) + 0.0) / count(*) * 10000.0 + 0.5) / 10000.0 + 0.0 AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
)
def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time rollup per event type — the same
    transformation runs unchanged on ``readStream`` (streaming/
    windows.py)."""
    return tumbling_agg(_events(spark, sf_dir), ts_col="ts", unit="hour").orderBy(
        "window_start", "event_type"
    )


@register(
    "events_sessionize",
    """WITH s AS (
  SELECT user_id, event_id,
    CASE WHEN lag(epoch(ts)) OVER w IS NULL THEN 1
         WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1
         ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) rolled up per user — the
    classic lag/running-count construction (streaming/windows.py)."""
    ev = _events(spark, sf_dir)
    # ts may be epoch-nanos long (parquet TIMESTAMP(NANOS) via
    # nanosAsLong) or a real timestamp / timestamp_ntz, depending on
    # the writer; gate the conversion on dtype exactly as tumbling_agg
    # does (streaming/windows.py:50-53). TIMESTAMP_NTZ can't cast to
    # BIGINT directly, so go via TIMESTAMP — session gaps depend only
    # on differences, so the tz offset of that cast cancels out.
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts_sec", F.expr("ts div 1000000000"))
    else:
        ev = ev.withColumn("ts_sec", F.col("ts").cast("timestamp").cast("long"))
    from lab_1806_vec_db_spark.streaming.windows import sessionize

    out = sessionize(ev, ts_col="ts_sec", user_col="user_id",
                     gap_minutes=30, tiebreak_cols=("event_id",))
    return (
        out.groupBy("user_id")
        .agg(F.max("session_seq").cast("bigint").alias("n_sessions"),
             F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


@register(
    "events_session_agg",
    """WITH s AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
         ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (
  SELECT user_id, ts, value,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM s)
SELECT user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
  count(*) AS n_events,
  round(sum(value), 4) + 0.0 AS sum_value
FROM t GROUP BY user_id, sid ORDER BY user_id, session_start""",
)
def events_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup via NATIVE Spark session windows
    (``F.session_window`` — streaming/windows.py:session_agg); the
    oracle reconstructs the identical sessions with the portable
    lag/running-count SQL (strict ``>`` gap test and
    ``end = last_event + gap``, the session_window semantics verified
    in tests/test_streaming.py)."""
    from lab_1806_vec_db_spark.streaming.windows import session_agg

    return session_agg(
        _events(spark, sf_dir), ts_col="ts", user_col="user_id",
        gap_minutes=30, value_col="value",
    ).orderBy("user_id", "session_start")


@register(
    "events_hopping_agg",
    """SELECT strftime(date_trunc('hour', ts) - to_hours(r), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*) AS n_events,
  round(sum(value), 4) + 0.0 AS sum_value,
  floor((round(sum(value), 4) + 0.0) / count(*) * 10000.0 + 0.5) / 10000.0 + 0.0 AS avg_value
FROM events, range(2) t(r)
GROUP BY 1, 2 ORDER BY 1, 2""",
)
def events_hopping_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 2-hour/1-hour-slide rollup per event type
    (streaming/windows.py:hopping_agg — same code on ``readStream``).
    Every event lands in exactly window/slide = 2 hour-aligned windows,
    which is what the oracle's ``range(2)`` shift reproduces: the
    windows starting at trunc(ts) and trunc(ts) − 1 h."""
    from lab_1806_vec_db_spark.streaming.windows import hopping_agg

    return hopping_agg(
        _events(spark, sf_dir), ts_col="ts", window="2 hours", slide="1 hour",
        keys=("event_type",), value_col="value",
    ).orderBy("window_start", "event_type")


# ---- end-to-end corpus cleaning (the flagship pipeline composition) --------


def _corpus_clean_oracle() -> str:
    return f"""WITH h AS (
  SELECT doc_id, text,
    {', '.join(f'{_hits_sql(T.LANG_STOPWORDS[lang])} AS hits_{lang}' for lang in sorted(T.LANG_STOPWORDS))}
  FROM documents),
s AS (
  SELECT doc_id, text, {_LANG_CASE} AS lang_pred,
    round((least(CAST(len({_TOKS}) AS DOUBLE)/50.0, 1.0)
           + (CASE WHEN CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}) >= 3.0
                    AND CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}) <= 10.0
              THEN 1.0 ELSE 0.5 END)
           + least(CAST(len(list_filter({_TOKS}, t -> list_contains({_SW}, t))) AS DOUBLE) / len({_TOKS}) * 5.0, 1.0)
          ) / 3.0, 4) + 0.0 AS quality
  FROM h),
kept AS (
  SELECT doc_id, text, quality FROM s
  WHERE lang_pred = 'en' AND quality >= 0.5),
g AS (
  SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
         count(*) AS n_copies
  FROM kept GROUP BY 1)
SELECT k.doc_id AS doc_id, g.n_copies AS n_copies, k.quality AS quality
FROM g JOIN kept k ON g.doc_id = k.doc_id
ORDER BY doc_id"""


@register("corpus_clean", _corpus_clean_oracle())
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus cleaning pipeline in ONE
    declarative plan — the composition every LLM data pipeline runs:

      score (lang-ID + quality, map-only Catalyst)
        → filter (keep English docs above the quality floor —
          predicate applies before any shuffle)
        → exact dedup (one md5-keyed shuffle, map-side combine)
        → canonical selection (min doc_id per content group).

    Plan shape at 100 TB: one map-only scoring pass fused with the
    filter into the scan stage, then a single content-hash shuffle;
    the canonical join is a self-join on the k-bounded group table.
    Every stage reuses an operator that already has its own oracle
    (text_lang_quality, dedup_exact_groups) — this entry gates the
    COMPOSITION end-to-end."""
    from lab_1806_vec_db_spark.operators.corpus import clean_corpus

    return clean_corpus(
        _docs(spark, sf_dir), text_col="text", id_col="doc_id",
        lang="en", min_quality=0.5,
    ).orderBy("doc_id")


@register(
    "corpus_decontaminate",
    """WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, source, unnest(list_distinct(list_transform(
    range(0, greatest(len(toks) - 2, 0)),
    i -> array_to_string(toks[i+1:i+3], ' ')))) AS gram
  FROM tok),
train AS (SELECT DISTINCT gram FROM g WHERE source <> 'src0'),
ev AS (SELECT doc_id, gram FROM g WHERE source = 'src0'),
agg AS (
  SELECT ev.doc_id AS doc_id, count(*) AS n_grams,
    CAST(sum(CASE WHEN train.gram IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit,
    round(CAST(sum(CASE WHEN train.gram IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
          / count(*), 4) + 0.0 AS ratio
  FROM ev LEFT JOIN train USING (gram)
  GROUP BY ev.doc_id)
SELECT d.doc_id AS doc_id,
  coalesce(a.n_grams, 0) AS n_grams,
  CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_hit,
  coalesce(a.ratio, 0.0) + 0.0 AS ratio
FROM (SELECT doc_id FROM documents WHERE source = 'src0') d
LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id""",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination screen (benchmark-leakage check):
    ``source = 'src0'`` plays the held-out eval split; every eval doc
    gets the fraction of its distinct word 3-grams that appear anywhere
    in the train split (operators/corpus.py:decontaminate). Map-only
    n-gram expansion, one distinct shuffle, one gram-keyed probe join
    — no all-pairs anywhere; ``hash_join=True`` narrows the shuffle
    key at cluster scale."""
    from lab_1806_vec_db_spark.operators.corpus import decontaminate

    docs = _docs(spark, sf_dir)
    out = decontaminate(docs, F.col("source") == "src0", n=3)
    return out.withColumn("ratio", F.col("ratio") + F.lit(0.0)).orderBy("doc_id")


_HASH_EMB_SQL = """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
v AS (SELECT doc_id, list_transform(range(0, 16),
        i -> CAST(len(list_filter(toks,
               s -> CAST(('0x' || substr(md5(s),1,8)) AS BIGINT) % 16 = i)) AS DOUBLE)) AS raw
      FROM t),
e AS (SELECT doc_id, list_transform(raw,
        x -> round(x / greatest(sqrt(list_dot_product(raw, raw)), 1e-10), 4) + 0.0) AS embedding
      FROM v)"""


@register(
    "text_hash_embedding",
    f"""{_HASH_EMB_SQL}
SELECT doc_id, array_to_string(list_transform(embedding,
  x -> CAST(round(x * 10000) AS BIGINT)), ',') AS embedding_x1e4
FROM e ORDER BY doc_id""",
)
def text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text embeddings (operators/corpus.py:
    hashing_embeddings, dim=16): vocabulary-free hashing-trick
    vectorizer, L2-normalized, bit-identical across engines — the
    plumbing twin of a model-embedding UDF (same schema, same
    downstream ANN/near-dup operators)."""
    from lab_1806_vec_db_spark.operators.corpus import hashing_embeddings

    emb = hashing_embeddings(_docs(spark, sf_dir), dim=16)
    # Driver contract: ARRAY columns break the driver's pandas
    # canonicalizer — emit the L2-normalized vector as scaled-int CSV
    # (elements are rounded to 4 decimals on both engines already).
    flat = F.concat_ws(
        ",", F.transform("embedding", lambda x: F.round(x * 10000).cast("bigint").cast("string"))
    )
    return emb.select("doc_id", flat.alias("embedding_x1e4")).orderBy("doc_id")


@register(
    "corpus_semantic_neardup",
    f"""{_HASH_EMB_SQL}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(1 - list_dot_product(a.embedding, b.embedding) / greatest(
    sqrt(list_dot_product(a.embedding, a.embedding))
    * sqrt(list_dot_product(b.embedding, b.embedding)), 1e-10), 4) + 0.0 AS dist
FROM e a JOIN e b ON a.doc_id < b.doc_id
WHERE round(1 - list_dot_product(a.embedding, b.embedding) / greatest(
    sqrt(list_dot_product(a.embedding, a.embedding))
    * sqrt(list_dot_product(b.embedding, b.embedding)), 1e-10), 4) + 0.0 <= 0.005
ORDER BY id_a, id_b""",
)
def corpus_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup, text-to-pairs in ONE composed plan: hash
    embeddings (two keyed shuffles) → exact cosine pairs at 0.005
    (bounded; the hyperplane-LSH path in embedding_neardup_lsh is the
    scale form) — the end-to-end shape of embedding-based dedup when
    no model embeddings exist."""
    from lab_1806_vec_db_spark.operators.corpus import hashing_embeddings
    from lab_1806_vec_db_spark.operators.dedup import embedding_neardup_pairs

    emb = hashing_embeddings(_docs(spark, sf_dir), dim=16)
    return embedding_neardup_pairs(
        emb, threshold=0.005, vec_col="embedding", id_col="doc_id"
    ).orderBy("id_a", "id_b")


@register(
    "corpus_pack_sequences",
    """WITH t AS (
  SELECT source AS part, doc_id,
    len(string_split(text, ' ')) AS n_tokens,
    sum(len(string_split(text, ' '))) OVER (
      PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      - len(string_split(text, ' ')) AS off
  FROM documents)
SELECT part, CAST(floor(off / 256.0) AS BIGINT) AS seq_id,
  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM t GROUP BY part, seq_id ORDER BY part, seq_id""",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk sequence packing into 256-token context
    windows, per source shard (operators/corpus.py:pack_sequences) —
    how pretraining batches are laid out. One shard-keyed window pass +
    one shard-keyed rollup; no global sort anywhere."""
    from lab_1806_vec_db_spark.operators.corpus import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), budget=256, part_col="source"
    ).orderBy("part", "seq_id")


@register(
    "corpus_mix_sample",
    """SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      < CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 75 ELSE 30 END
ORDER BY doc_id""",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture sampling (operators/corpus.py:
    mix_sample): even-numbered sources keep 75%, odd keep 30%, gated by
    a content-keyed md5 hash — reproducible across engines (seeded RNG
    is not), map-only, predicate fused into the scan."""
    from lab_1806_vec_db_spark.operators.corpus import mix_sample

    docs = _docs(spark, sf_dir)
    srcs = [r[0] for r in docs.select("source").distinct().collect()]
    rates = {s: 75 if int(s[3:]) % 2 == 0 else 30 for s in srcs}
    return mix_sample(docs, rates).select("doc_id", "source").orderBy("doc_id")


@register(
    "text_term_freq",
    f"""WITH tok AS (
  SELECT unnest({_TOKS}) AS token FROM documents)
SELECT token, count(*) AS n
FROM tok WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token LIMIT 50""",
)
def text_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-50 tokens by frequency — the
    building block of vocab construction / BPE corpus scans. Plan:
    map-side explode fused into the scan, ONE hash-aggregate shuffle
    (partial counts combine map-side, so the shuffle carries one row
    per distinct token per task, never per occurrence), then a
    k-bounded TakeOrdered."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(50)
    )


# ---- full-text relevance search (BM25) -------------------------------------


_BM25_TERMS = ("spark", "vector", "customer", "window")
_NETOKS = "list_filter(string_split(text, ' '), t -> t <> '')"


@register(
    "text_bm25_topk",
    f"""WITH tok AS (
  SELECT doc_id, len({_NETOKS}) AS dl, unnest({_NETOKS}) AS term
  FROM documents),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len({_NETOKS})) AS DOUBLE) / count(*) AS avgdl
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM tok WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id AS doc_id,
    round(sum(ln(1 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
          * tf.tf * 2.2
          / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 4) + 0.0 AS score,
    count(*) AS n_terms_hit
  FROM tf JOIN dfx USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id)
SELECT doc_id, score, n_terms_hit FROM sc
ORDER BY score DESC, doc_id LIMIT 20""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a 4-term query (operators/search.py:bm25_topk)
    — the lexical first-stage retriever next to the vector kNN path.
    Plan: map-only tokenize (dl travels with the token rows, no
    doc-length join), query-term filter BEFORE the one (doc, term)
    shuffle, ≤|terms|-row df broadcast, 1-row stats cross-join,
    TakeOrderedAndProject top-k."""
    from lab_1806_vec_db_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), terms=_BM25_TERMS, k=20)


# ---- events: ranked windows, retention, quantiles --------------------------


@register(
    "events_topn_per_window",
    """WITH a AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
    event_type, count(*) AS n_events,
    round(sum(value), 4) + 0.0 AS sum_value
  FROM events GROUP BY 1, 2),
r AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY window_start ORDER BY sum_value DESC, event_type) AS INTEGER) AS rnk
  FROM a)
SELECT window_start, event_type, n_events, sum_value, rnk
FROM r WHERE rnk <= 3 ORDER BY window_start, rnk""",
)
def events_topn_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour ranked by summed value
    (operators/events.py:topn_per_window): the rollup's one keyed
    shuffle + a rank window over per-window key rows (one row per
    (window, type), never per event). Rank uses the ROUNDED sum with
    the type as tiebreak — deterministic across engines."""
    from lab_1806_vec_db_spark.operators.events import topn_per_window

    return topn_per_window(_events(spark, sf_dir), n=3).orderBy("window_start", "rnk")


@register(
    "events_retention",
    """WITH b AS (
  SELECT DISTINCT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id, user_id
  FROM events)
SELECT a.hour_id AS hour_id, count(*) AS n_users,
  CAST(count(b2.user_id) AS BIGINT) AS n_retained,
  round(CAST(count(b2.user_id) AS DOUBLE) / count(*), 4) + 0.0 AS retention
FROM b a LEFT JOIN b b2
  ON b2.hour_id = a.hour_id + 1 AND b2.user_id = a.user_id
GROUP BY 1 ORDER BY 1""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour user retention (operators/events.py:
    hourly_retention): distinct (epoch-hour, user) pairs → keyed
    self-join on (hour+1, user) → per-hour rollup. Never all-pairs;
    hour_id is integer floor division, timezone-free."""
    from lab_1806_vec_db_spark.operators.events import hourly_retention

    return hourly_retention(_events(spark, sf_dir)).orderBy("hour_id")


@register(
    "events_value_quantiles",
    """SELECT event_type, count(*) AS n,
  round(quantile_cont(value, 0.25), 4) + 0.0 AS p25,
  round(quantile_cont(value, 0.50), 4) + 0.0 AS p50,
  round(quantile_cont(value, 0.75), 4) + 0.0 AS p75,
  round(quantile_cont(value, 0.95), 4) + 0.0 AS p95
FROM events GROUP BY event_type ORDER BY event_type""",
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value quantiles (operators/events.py:
    value_quantiles) — PERCENTILE_CONT linear interpolation, the same
    definition DuckDB's quantile_cont implements; one keyed shuffle
    with a per-group sort. approx_percentile is the documented 100 TB
    fallback when sketch error is acceptable."""
    from lab_1806_vec_db_spark.operators.events import value_quantiles

    return value_quantiles(_events(spark, sf_dir)).orderBy("event_type")


_BM25_ORACLE = f"""WITH tok AS (
  SELECT doc_id, len({_NETOKS}) AS dl, unnest({_NETOKS}) AS term
  FROM documents),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len({_NETOKS})) AS DOUBLE) / count(*) AS avgdl
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM tok WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id AS doc_id,
    round(sum(ln(1 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
          * tf.tf * 2.2
          / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 4) + 0.0 AS score,
    count(*) AS n_terms_hit
  FROM tf JOIN dfx USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id)
SELECT doc_id, score, n_terms_hit FROM sc
ORDER BY score DESC, doc_id LIMIT 20"""


@register("text_bm25_indexed", _BM25_ORACLE)
def text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 through the PERSISTED inverted index (operators/search.py:
    TextIndex): postings partitioned by term-hash bucket so the query
    reads only its terms' directories (PartitionFilters — the lexical
    twin of IVF cluster pruning) with the term equality pushed into
    the scan. Build → save → LOAD from disk → search; results are
    bit-identical to the ad-hoc text_bm25_topk, so the same oracle
    gates both the index build and the pruned serve path."""
    import tempfile

    from lab_1806_vec_db_spark.operators.search import TextIndex

    tmp = tempfile.mkdtemp(prefix="sg_textidx_")
    TextIndex.build(_docs(spark, sf_dir), tmp, n_buckets=16)
    idx = TextIndex.load(tmp)
    return idx.search(spark, terms=_BM25_TERMS, k=20)


_QTEXT = " ".join(_BM25_TERMS)


@register(
    "hybrid_search_rrf",
    f"""WITH tok AS (
  SELECT doc_id, len({_NETOKS}) AS dl, unnest({_NETOKS}) AS term
  FROM documents),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len({_NETOKS})) AS DOUBLE) / count(*) AS avgdl
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM tok WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id AS doc_id,
    round(sum(ln(1 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
          * tf.tf * 2.2
          / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 4) + 0.0 AS score,
    count(*) AS n_terms_hit
  FROM tf JOIN dfx USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id),
bm AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20),
bm_r AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm),
dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dv AS (SELECT doc_id, list_transform(range(0, 16),
        i -> CAST(len(list_filter(toks,
               s -> CAST(('0x' || substr(md5(s),1,8)) AS BIGINT) % 16 = i)) AS DOUBLE)) AS raw
      FROM dt),
de AS (SELECT doc_id, list_transform(raw,
        x -> round(x / greatest(sqrt(list_dot_product(raw, raw)), 1e-10), 4) + 0.0) AS embedding
      FROM dv),
qt AS (SELECT string_split('{_QTEXT}', ' ') AS toks),
qv AS (SELECT list_transform(range(0, 16),
        i -> CAST(len(list_filter(toks,
               s -> CAST(('0x' || substr(md5(s),1,8)) AS BIGINT) % 16 = i)) AS DOUBLE)) AS raw
      FROM qt),
qe AS (SELECT list_transform(raw,
        x -> round(x / greatest(sqrt(list_dot_product(raw, raw)), 1e-10), 4) + 0.0) AS qemb
      FROM qv),
sem AS (
  SELECT de.doc_id AS doc_id,
    round(1 - list_dot_product(de.embedding, qe.qemb) / greatest(
      sqrt(list_dot_product(de.embedding, de.embedding))
      * sqrt(list_dot_product(qe.qemb, qe.qemb)), 1e-10), 4) + 0.0 AS dist
  FROM de CROSS JOIN qe),
sem_t AS (SELECT doc_id, dist FROM sem ORDER BY dist, doc_id LIMIT 20),
sem_r AS (SELECT doc_id, row_number() OVER (ORDER BY dist, doc_id) AS rank FROM sem_t),
u AS (SELECT doc_id, rank FROM bm_r UNION ALL SELECT doc_id, rank FROM sem_r),
f AS (SELECT doc_id, round(sum(1.0 / (60 + rank)), 4) + 0.0 AS rrf_score,
             count(*) AS n_systems
      FROM u GROUP BY doc_id)
SELECT doc_id, rrf_score, n_systems FROM f
ORDER BY rrf_score DESC, doc_id LIMIT 10""",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (lexical) + hash-embedding cosine
    top-20 (semantic) fused by reciprocal-rank fusion
    (operators/search.py:rrf_fuse, score = Σ 1/(60+rank)) — the
    standard two-tower first-stage retriever composition. Both legs
    are k-bounded before fusion, so the fuse itself is driver-scale
    regardless of corpus size; ranks are integers, making the whole
    pipeline exactly SQL-reproducible."""
    from lab_1806_vec_db_spark.operators.corpus import hashing_embeddings
    from lab_1806_vec_db_spark.operators.search import bm25_topk, rrf_fuse, with_rank

    docs = _docs(spark, sf_dir)
    bm = with_rank(
        bm25_topk(docs, _BM25_TERMS, k=20),
        [F.col("score").desc(), F.col("doc_id")],
    )
    emb = hashing_embeddings(docs, dim=16)
    qdf = spark.createDataFrame([(0, _QTEXT)], "doc_id bigint, text string")
    q_vec = [float(x) for x in hashing_embeddings(qdf, dim=16).first()["embedding"]]
    sem = with_rank(
        knn_ops.knn(emb, q_vec, k=20, metric="cosine",
                    vec_col="embedding", id_col="doc_id"),
        [F.col("dist").asc(), F.col("doc_id")],
    )
    return rrf_fuse([bm, sem], k=10).orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )


@register(
    "corpus_chunks",
    f"""WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks), 1), 48)) AS start
  FROM t)
SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
  array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text,
  CAST(least(len(toks) - start, 64) AS BIGINT) AS n_tokens
FROM s ORDER BY doc_id, chunk_id""",
)
def corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking, 64-token windows / 16-token overlap
    (operators/corpus.py:chunk_documents) — the embedding-prep step of
    a RAG/training pipeline. Map-only sequence+posexplode+slice, zero
    shuffle, fuses into the scan."""
    from lab_1806_vec_db_spark.operators.corpus import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=64, overlap=16
    ).orderBy("doc_id", "chunk_id")


@register(
    "text_bigram_freq",
    f"""WITH t AS (SELECT {_TOKS} AS toks FROM documents),
p AS (
  SELECT unnest(list_transform(
    range(1, greatest(len(toks) - 1, 0) + 1),
    i -> toks[i] || ' ' || toks[i + 1])) AS pair
  FROM t)
SELECT pair, count(*) AS n FROM p
GROUP BY pair ORDER BY n DESC, pair LIMIT 50""",
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-token pairs (operators/corpus.py:bigram_stats)
    — the BPE-merge counting step. Map-side zip-with-tail pair
    expansion, ONE hash aggregation with map-side partials,
    TakeOrdered cut."""
    from lab_1806_vec_db_spark.operators.corpus import bigram_stats

    return bigram_stats(_docs(spark, sf_dir), top_k=50)


@register(
    "corpus_repetition",
    f"""WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN list_transform(
      range(1, len(toks) - 2 + 1),
      i -> array_to_string(list_slice(toks, i, i + 2), ' '))
    ELSE [] END AS grams
  FROM t)
SELECT doc_id,
  CAST(len(grams) AS BIGINT) AS n_grams,
  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
  CASE WHEN len(grams) > 0
    THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 4) + 0.0
    ELSE 0.0 END AS rep_ratio
FROM g ORDER BY doc_id""",
)
def corpus_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document 3-gram repetition ratio (operators/corpus.py:
    repetition_stats) — the boilerplate/spam screen of corpus
    cleaning. Arrow-batched vectorized gram counting (map-only, zero
    shuffle) + a Catalyst ratio expression shared with the pure-
    expression impl for bit-identical rounding."""
    from lab_1806_vec_db_spark.operators.corpus import repetition_stats

    return repetition_stats(_docs(spark, sf_dir), n=3).orderBy("doc_id")


@register(
    "dedup_neardup_screen",
    f"""WITH h AS (
  SELECT doc_id, list_transform({_TOKS}, x -> {_hash32_sql('x')}) AS hs
  FROM documents),
s AS (SELECT doc_id, CAST({_SIMHASH_BITS_SQL} AS BIGINT) AS simhash FROM h),
b AS (
  SELECT doc_id, simhash, unnest(range(0, 2)) AS band_id FROM s),
bv AS (
  SELECT doc_id, simhash, band_id,
         (simhash >> (band_id * 16)) & 65535 AS band_val
  FROM b),
r AS (
  SELECT doc_id, simhash,
    CASE WHEN row_number() OVER (
      PARTITION BY band_id, band_val ORDER BY doc_id) = 1
    THEN 1 ELSE 0 END AS first_holder
  FROM bv),
d AS (
  SELECT doc_id, simhash, sum(first_holder) AS n_new
  FROM r GROUP BY doc_id, simhash)
SELECT strftime(to_timestamp((doc_id * 60 // 600) * 600),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       doc_id, simhash
FROM d WHERE n_new = 2 ORDER BY doc_id""",
)
def dedup_neardup_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING SimHash near-dup screen
    (streaming/dedup_stream.py:neardup_stream): a doc is unique iff it
    is the first (by event time, id) holder of both 16-bit halves of
    its SimHash (band_bits=16 — on this shared-vocabulary synthetic
    corpus 8-bit bands collide for ~98% of docs, which is the LSH
    sensitivity/specificity dial, not a defect). Event time is synthesized as doc_id minutes so the
    windowing is deterministic; the same code runs on ``readStream``
    with per-(band, value) dropDuplicatesWithinWatermark state
    (parity gated in tests/test_streaming.py)."""
    from lab_1806_vec_db_spark.streaming.dedup_stream import neardup_stream

    docs = _docs(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") * 60)
    )
    return neardup_stream(docs, ts_col="ts", band_bits=16).orderBy("doc_id")


# ---- end-to-end RAG-prep composition ---------------------------------------

_CHUNK_TOKS = "list_filter(ctoks, t -> t <> '')"


@register(
    "corpus_rag_pipeline",
    f"""WITH h AS (
  SELECT doc_id, text,
    {', '.join(f'{_hits_sql(T.LANG_STOPWORDS[lang])} AS hits_{lang}' for lang in sorted(T.LANG_STOPWORDS))}
  FROM documents),
s AS (
  SELECT doc_id, text, {_LANG_CASE} AS lang_pred,
    round((least(CAST(len({_TOKS}) AS DOUBLE)/50.0, 1.0)
           + (CASE WHEN CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}) >= 3.0
                    AND CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}) <= 10.0
              THEN 1.0 ELSE 0.5 END)
           + least(CAST(len(list_filter({_TOKS}, t -> list_contains({_SW}, t))) AS DOUBLE) / len({_TOKS}) * 5.0, 1.0)
          ) / 3.0, 4) + 0.0 AS quality
  FROM h),
kept AS (
  SELECT doc_id, text FROM s
  WHERE lang_pred = 'en' AND quality >= 0.5),
g AS (SELECT md5(text) AS chash, min(doc_id) AS cid FROM kept GROUP BY 1),
canon AS (SELECT k.doc_id, k.text FROM kept k JOIN g ON g.cid = k.doc_id),
tk AS (SELECT doc_id, {_TOKS} AS toks FROM canon),
st AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks), 1), 48)) AS start
  FROM tk),
ck AS (
  SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
         list_slice(toks, start + 1, start + 64) AS ctoks
  FROM st),
cv AS (
  SELECT doc_id, chunk_id, list_transform(range(0, 16),
    i -> CAST(len(list_filter({_CHUNK_TOKS},
           s -> CAST(('0x' || substr(md5(s),1,8)) AS BIGINT) % 16 = i)) AS DOUBLE)) AS raw
  FROM ck),
ce AS (
  SELECT doc_id, chunk_id, list_transform(raw,
    x -> round(x / greatest(sqrt(list_dot_product(raw, raw)), 1e-10), 4) + 0.0) AS emb
  FROM cv),
qt AS (SELECT string_split('{_QTEXT}', ' ') AS toks),
qv AS (SELECT list_transform(range(0, 16),
        i -> CAST(len(list_filter(toks,
               s -> CAST(('0x' || substr(md5(s),1,8)) AS BIGINT) % 16 = i)) AS DOUBLE)) AS raw
      FROM qt),
qe AS (SELECT list_transform(raw,
        x -> round(x / greatest(sqrt(list_dot_product(raw, raw)), 1e-10), 4) + 0.0) AS qemb
      FROM qv),
d AS (
  SELECT ce.doc_id AS doc_id, ce.chunk_id AS chunk_id,
    round(1 - list_dot_product(ce.emb, qe.qemb) / greatest(
      sqrt(list_dot_product(ce.emb, ce.emb))
      * sqrt(list_dot_product(qe.qemb, qe.qemb)), 1e-10), 4) + 0.0 AS dist
  FROM ce CROSS JOIN qe)
SELECT doc_id, chunk_id, dist FROM d
ORDER BY dist, doc_id, chunk_id LIMIT 5""",
)
def corpus_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full RAG-prep composition in ONE declarative plan — the
    end-to-end path a retrieval corpus takes: clean (lang + quality
    filter, exact-dedup canonical) → sliding-window chunk (64/16) →
    feature-hash embed each chunk → cosine top-5 chunks for the
    query. Every stage reuses an operator with its own oracle
    (corpus_clean, corpus_chunks, text_hash_embedding, knn_flat_*);
    this entry gates the COMPOSITION. Plan (audited): the cleaning
    filter fuses into the scan; wide stages are the dedup's
    content-hash shuffle and the embedder's per-chunk keyed aggregate
    (3 exchanges total, joins broadcast, final cut
    TakeOrderedAndProject) — each one the pipeline semantically
    requires."""
    from lab_1806_vec_db_spark.operators.corpus import (
        chunk_documents,
        clean_corpus,
        hashing_embeddings,
    )

    docs = _docs(spark, sf_dir)
    canon = clean_corpus(docs, lang="en", min_quality=0.5).select("doc_id")
    canon_docs = canon.join(docs, "doc_id").select("doc_id", "text")
    chunks = chunk_documents(canon_docs, chunk_tokens=64, overlap=16)
    chunks = chunks.withColumn(
        "chunk_uid", F.col("doc_id") * 10000 + F.col("chunk_id")
    )
    emb = hashing_embeddings(
        chunks, dim=16, text_col="chunk_text", id_col="chunk_uid"
    )
    qdf = spark.createDataFrame([(0, _QTEXT)], "doc_id bigint, text string")
    q_vec = [float(x) for x in hashing_embeddings(qdf, dim=16).first()["embedding"]]
    top = knn_ops.knn(
        emb, q_vec, k=5, metric="cosine", vec_col="embedding", id_col="chunk_uid"
    )
    return top.select(
        (F.col("chunk_uid") / 10000).cast("bigint").alias("doc_id"),
        (F.col("chunk_uid") % 10000).alias("chunk_id"),
        "dist",
    ).orderBy("dist", "doc_id", "chunk_id")


_BM25_BATCH_QUERIES = [
    (0, ["spark", "vector"]),
    (1, ["customer", "window", "join"]),
    (2, ["table"]),
]


@register(
    "text_bm25_batch",
    f"""WITH q(query_id, terms) AS (VALUES
    (0, ['spark', 'vector']),
    (1, ['customer', 'window', 'join']),
    (2, ['table'])),
qt AS (SELECT DISTINCT query_id, unnest(terms) AS term FROM q),
tok AS (
  SELECT doc_id, len({_NETOKS}) AS dl, unnest({_NETOKS}) AS term
  FROM documents),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len({_NETOKS})) AS DOUBLE) / count(*) AS avgdl
  FROM documents),
tf AS (
  SELECT qt.query_id, tok.doc_id, tok.term,
         count(*) AS tf, min(tok.dl) AS dl
  FROM tok JOIN qt USING (term)
  GROUP BY 1, 2, 3),
dfx AS (
  SELECT term, count(*) AS df
  FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY 1),
sc AS (
  SELECT tf.query_id AS query_id, tf.doc_id AS doc_id,
    round(sum(ln(1 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
          * tf.tf * 2.2
          / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 4) + 0.0 AS score,
    count(*) AS n_terms_hit
  FROM tf JOIN dfx USING (term) CROSS JOIN stats
  GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
  FROM sc)
SELECT query_id, doc_id, score, n_terms_hit FROM r
WHERE rn <= 10 ORDER BY query_id, score DESC, doc_id""",
)
def text_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25 — many queries, ONE corpus pass
    (operators/search.py:bm25_topk_batch, the lexical twin of
    knn_batch): the query-term set broadcasts into the token stream,
    one (query, doc, term) shuffle, df derived once per term, rank
    window partitioned by query for the per-query top-10."""
    from lab_1806_vec_db_spark.operators.search import bm25_topk_batch

    qdf = spark.createDataFrame(
        [(int(i), terms) for i, terms in _BM25_BATCH_QUERIES],
        "query_id int, terms array<string>",
    )
    # the query list is literal driver data: hand its term pool over
    # directly so plan construction submits NO Spark job (VERDICT r13)
    pool = sorted({t for _, terms in _BM25_BATCH_QUERIES for t in terms})
    return bm25_topk_batch(
        _docs(spark, sf_dir), qdf, k=10, term_pool=pool
    ).orderBy("query_id", F.col("score").desc(), "doc_id")


# ---- PII scrub / repeated-line dedup / URL normalization (round 7) --------
# The documents table is synthetic word soup with no natural PII, URLs
# or line structure, so each entry DERIVES the structure it exercises
# from (doc_id, source, text) with the same deterministic expression on
# both engines — the operator under test then runs on driver-provided
# bytes, not hand-planted fixtures.


def _pii_enrich_spark() -> F.Column:
    d = F.col("doc_id").cast("string")
    return F.concat_ws(
        " ",
        F.col("text"),
        F.concat(F.lit("user"), d, F.lit("@example.com")),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("cc admin@example.org")
        ).otherwise(F.lit("plain")),
        F.concat(
            F.lit("555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
        F.concat(
            F.lit("10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
        ),
        F.concat(F.lit("https://docs.example.org/p"), d, F.lit("?ref=mail")),
    )


_PII_ENRICH_SQL = (
    "concat_ws(' ', text,"
    " 'user' || CAST(doc_id AS VARCHAR) || '@example.com',"
    " CASE WHEN doc_id % 3 = 0 THEN 'cc admin@example.org' ELSE 'plain' END,"
    " '555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    "        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),"
    " '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'"
    "         || CAST((doc_id * 7) % 256 AS VARCHAR),"
    " 'https://docs.example.org/p' || CAST(doc_id AS VARCHAR) || '?ref=mail')"
)


def _pii_oracle() -> str:
    from lab_1806_vec_db_spark.functions.pii import pii_counts_sql, pii_redact_sql

    counts = ", ".join(pii_counts_sql("t"))
    return f"""WITH e AS (SELECT doc_id, {_PII_ENRICH_SQL} AS t FROM documents)
SELECT doc_id, {counts}, md5({pii_redact_sql('t')}) AS redact_sig
FROM e ORDER BY doc_id"""


@register("corpus_pii_scrub", _pii_oracle())
def corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (functions/pii.py): per-document match counts for
    email/url/phone/ipv4 plus the md5 of the fully redacted text.
    Map-only Catalyst regexes (regexp_count / regexp_replace) in the
    RE2∩Java-regex common dialect — at 100 TB this fuses into the scan
    with zero shuffle and zero Python."""
    from lab_1806_vec_db_spark.functions import pii

    # sort-first: the regex battery is the expensive part; a trailing
    # orderBy would re-execute it in the range-sampling pass
    e = _docs(spark, sf_dir).orderBy("doc_id").select(
        "doc_id", _pii_enrich_spark().alias("t")
    )
    return e.select(
        "doc_id",
        *pii.pii_counts("t"),
        F.md5(pii.pii_redact("t")).alias("redact_sig"),
    )


_LINE_N = 3  # tokens per derived line

_LINES_SQL = (
    f"list_transform(range(0, CAST(ceil(len({_TOKS}) / {_LINE_N}.0) AS BIGINT)),"
    f" i -> array_to_string(list_slice({_TOKS}, i*{_LINE_N}+1, i*{_LINE_N}+{_LINE_N}), ' '))"
)


@register(
    "corpus_line_dedup",
    f"""WITH chunked AS (
  SELECT doc_id, {_LINES_SQL} AS ls FROM documents),
lines AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ls)+1),
      i -> {{'pos': i, 'line': ls[i]}}), recursive := true)
  FROM chunked),
boiler AS (
  SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) > 2),
kept AS (
  SELECT l.doc_id, l.pos, l.line FROM lines l
  ANTI JOIN boiler b ON l.line = b.line),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_sig
  FROM kept GROUP BY doc_id)
SELECT c.doc_id, len(c.ls) AS n_lines,
       coalesce(r.n_kept, 0) AS n_kept,
       coalesce(r.clean_sig, md5('')) AS clean_sig
FROM chunked c LEFT JOIN rebuilt r USING (doc_id)
ORDER BY c.doc_id""",
)
def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-line (boilerplate) removal
    (operators/corpus.py:line_dedup): re-chunk each document into
    3-token lines, drop every line appearing in >2 distinct documents,
    rebuild in original order. One line-keyed agg shuffle + a
    broadcast ANTI-join (the boilerplate set is small by construction)
    + one id-keyed rebuild shuffle — the sub-document dedup stage
    between exact dedup and MinHash at 100 TB."""
    from lab_1806_vec_db_spark.operators.corpus import line_dedup

    # Re-chunking into 3-token lines == replacing every 3rd space with
    # a newline: one regexp pass instead of split + transform/slice +
    # concat_ws + array_join (~3.4x cheaper per evaluation, and this
    # projection is evaluated by the boiler broadcast subtree, the kept
    # path, AND the totals scan inside line_dedup). [^ ]* matches empty
    # tokens, so runs of spaces group exactly like the split-based
    # construction; a trailing partial group is left untouched by both.
    docs2 = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), "([^ ]* [^ ]* [^ ]*) ", "$1\n"
        ).alias("text"),
    )
    out = line_dedup(docs2, max_df=2, sep="\n")
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5("clean_text").alias("clean_sig"),
    ).orderBy("doc_id")


@register(
    "text_url_domains",
    """WITH u AS (
  SELECT 'https://' || CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END
         || upper(source) || '.Example.com/p' || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
d AS (
  SELECT lower(regexp_extract(url, 'https?://(?:www\\.)?([^/?#]+)', 1)) AS domain
  FROM u)
SELECT domain, count(*) AS n_urls
FROM d GROUP BY domain ORDER BY domain""",
)
def text_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL → normalized registrable-domain rollup: extract the host,
    strip the www. prefix, casefold, count per domain — the
    domain-level frequency table a crawl pipeline filters against
    (blocklists, per-domain caps). Map-only regexp_extract + one
    map-combined agg shuffle."""
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.upper("source"),
        F.lit(".Example.com/p"),
        F.col("doc_id").cast("string"),
    )
    return (
        _docs(spark, sf_dir)
        .select(
            F.lower(
                F.regexp_extract(url, r"https?://(?:www\.)?([^/?#]+)", 1)
            ).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count("*").alias("n_urls"))
        .orderBy("domain")
    )


# ---- round-8 additions: representative selection, exact-quota sampling, ----
# ---- unigram-LM quality scoring ---------------------------------------------

#: composite quality score over a `text` column — the exact DuckDB twin
#: of functions/text.py:quality_score (shared with the corpus_clean /
#: text_lang_quality oracles, factored here for reuse).
_QUALITY_SQL = f"""round((least(CAST(len({_TOKS}) AS DOUBLE)/50.0, 1.0)
       + (CASE WHEN CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}) >= 3.0
                AND CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE) / len({_TOKS}) <= 10.0
          THEN 1.0 ELSE 0.5 END)
       + least(CAST(len(list_filter({_TOKS}, t -> list_contains({_SW}, t))) AS DOUBLE) / len({_TOKS}) * 5.0, 1.0)
      ) / 3.0, 4) + 0.0"""


@register(
    "dedup_representatives",
    f"""WITH s AS (
  SELECT doc_id, md5(text) AS content_hash, {_QUALITY_SQL} AS quality
  FROM documents),
r AS (
  SELECT content_hash, doc_id, quality,
         row_number() OVER (PARTITION BY content_hash
                            ORDER BY quality DESC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY content_hash) AS n_members
  FROM s)
SELECT content_hash, doc_id AS rep_id, quality AS rep_quality, n_members
FROM r WHERE rk = 1 ORDER BY rep_id""",
)
def dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection per duplicate cluster
    (operators/dedup.py:select_representatives): instead of keeping the
    arbitrary min-id copy, keep the highest-quality member (ties to min
    id). One keyed aggregate — a single max-struct per cluster, partial
    map-side (SortAggregate on the cluster key; see
    operators/dedup.py:select_representatives) — vs the oracle's window
    formulation; same answer, no member-ordering window sort."""
    docs = _docs(spark, sf_dir)
    clustered = docs.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        T.tokens("text").alias("__toks"),
    ).select(
        "doc_id", "content_hash",
        T.quality_score_from_tokens(F.col("__toks")).alias("quality"),
    )
    return D.select_representatives(
        clustered, "content_hash", "quality"
    ).orderBy("rep_id")


@register(
    "corpus_stratified_sample",
    """WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT doc_id, source FROM r WHERE rk <= ceil(0.2 * n) ORDER BY doc_id""",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling (operators/corpus.py:
    stratified_sample): ceil(20%) of every source, chosen by a
    deterministic md5 rank — hits the quota EXACTLY where mix_sample's
    hash gate only does in expectation. One stratum-keyed shuffle
    feeding both window functions."""
    from lab_1806_vec_db_spark.operators.corpus import stratified_sample

    docs = _docs(spark, sf_dir)
    return (
        stratified_sample(docs, 0.2)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "text_unigram_logprob",
    f"""WITH tok AS (
  SELECT doc_id, unnest({_NETOKS}) AS token FROM documents),
v AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM v),
s AS (SELECT tok.doc_id AS doc_id, ln(v.c / tot.n) AS lp
      FROM tok JOIN v USING (token) CROSS JOIN tot)
SELECT doc_id, round(avg(lp), 4) + 0.0 AS avg_logprob, count(*) AS n_tok
FROM s GROUP BY doc_id ORDER BY doc_id""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score from a corpus-trained unigram LM
    (operators/corpus.py:unigram_logprob_scores): per-doc mean token
    logprob — the cheap "does this look like natural text" filter.
    Vocab aggregate (map-combined), token-keyed probability join
    (broadcast at sf-scale, shuffle-hash at corpus scale), one doc-key
    aggregate."""
    from lab_1806_vec_db_spark.operators.corpus import unigram_logprob_scores

    return unigram_logprob_scores(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "corpus_token_budget",
    f"""WITH t AS (
  SELECT doc_id, source, CAST(len({_NETOKS}) AS BIGINT) AS n_tokens,
         sum(CAST(len({_NETOKS}) AS BIGINT)) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents)
SELECT doc_id, source, n_tokens FROM t
WHERE cum <= 2000 ORDER BY doc_id""",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-denominated mixture quota (operators/corpus.py:
    token_budget_sample): each source contributes documents — in
    deterministic md5 order — until its 2000-token budget fills.
    One stratum-keyed shuffle, running-sum window, map-side filter."""
    from lab_1806_vec_db_spark.operators.corpus import token_budget_sample

    docs = _docs(spark, sf_dir)
    return (
        token_budget_sample(docs, 2000)
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")
    )
