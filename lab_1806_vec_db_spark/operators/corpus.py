"""End-to-end corpus cleaning — the composition every LLM training-data
pipeline runs, as one declarative DataFrame transform:

    score (lang-ID + quality, map-only Catalyst)
      → filter (keep docs in ``lang`` above the quality floor;
        the predicate applies before any shuffle)
      → exact dedup (one content-hash shuffle, map-side combine)
      → canonical selection (min id per content group).

Each stage reuses an operator that has its own oracle-gated registry
entry (text_lang_quality, dedup_exact_groups); the composed form is
gated end-to-end by the ``corpus_clean`` entry
(plans/pipeline_queries.py).

Plan shape at 100 TB: the scoring expressions fuse with the filter into
the scan stage (whole-stage codegen — zero Python); the only shuffle is
the md5 groupBy, and the canonical join is a self-join against the
k-bounded group table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.functions import text as T


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str | None = "en",
    min_quality: float = 0.5,
) -> DataFrame:
    """Score → filter → dedup → canonicalize. Returns one row per
    surviving canonical document: ``(id, n_copies, quality)``.

    ``lang=None`` skips the language filter; ``min_quality`` is the
    floor on :func:`~lab_1806_vec_db_spark.functions.text.quality_score`
    (already 4-dp rounded, oracle-stable).
    """
    scored = docs.select(
        id_col, text_col,
        T.lang_id(text_col).alias("lang_pred"),
        T.quality_score(text_col).alias("quality"),
    )
    kept = scored.filter(F.col("quality") >= float(min_quality))
    if lang is not None:
        kept = kept.filter(F.col("lang_pred") == lang)
    groups = kept.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    )
    return groups.join(kept.select(id_col, "quality"), id_col).select(
        id_col, "n_copies", "quality"
    )
