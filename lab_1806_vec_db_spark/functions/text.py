"""Text-analysis expression library for training-data pipelines.

These are north-star extensions beyond the reference's surface (the
reference's metadata is opaque string equality only,
metadata_vec_table.rs:163-169) — the operators a 100 TB LLM-data
pipeline runs over a ``documents(doc_id, text, ...)`` table:
tokenization, token/char statistics, stopword ratios, a language-ID
heuristic, quality scoring, and content fingerprinting.

Design constraints:
- pure Catalyst column expressions (``split`` / ``transform`` /
  ``aggregate`` / ``regexp_*``) — JVM-side, whole-stage-codegen
  eligible, zero Python in the row path; a 100 TB scan of these is a
  map-only stage with no shuffle;
- every function is deterministic and reproducible in ANSI SQL, so the
  DuckDB correctness oracle can replay it (32-bit hashes are the first
  8 hex digits of md5 — identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for rolling fingerprints: folds stay < 2^36, so both Spark
#: and DuckDB BIGINT arithmetic are exact (no overflow wrap anywhere).
FINGERPRINT_MOD = 1_000_000_007

#: tiny per-language stopword lists for the lang-id heuristic — the
#: classic "function-word counting" approach (public knowledge; same
#: shape as langid/cld heuristics, with a deterministic tie-break).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization (fixed single-space separator so Spark
    and the SQL oracle agree byte-for-byte on empty-token behavior)."""
    return F.split(_c(text), sep)


def regex_tokens(text: Column | str) -> Column:
    """BPE-ish tokenizer approximation: alpha runs, single digits, or
    any other non-space symbol (the common pre-tokenizer split used to
    budget LLM token counts without a vocab)."""
    t = F.regexp_replace(_c(text), r"([0-9])", r" $1 ")
    t = F.regexp_replace(t, r"([^A-Za-z0-9\s])", r" $1 ")
    return F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def regex_token_count(text: Column | str) -> Column:
    """Token-budget estimate under the BPE-ish split."""
    return F.size(regex_tokens(text))


def char_stats(text: Column | str) -> dict[str, Column]:
    """Character-class statistics: total, letters, digits, spaces,
    punctuation (= the remainder). Each is length-difference arithmetic
    over ``regexp_replace`` — one scan per class, JVM-side."""
    t = _c(text)
    n = F.length(t)
    letters = n - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    digits = n - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = n - F.length(F.regexp_replace(t, r" ", ""))
    punct = n - letters - digits - spaces
    return {"n_chars": n, "n_letters": letters, "n_digits": digits,
            "n_spaces": spaces, "n_punct": punct}


def mean_token_len_from_tokens(toks: Column) -> Column:
    """Average token length (0 for empty docs) over a precomputed
    token array — materialize the array in its OWN projection when
    composing several token statistics, so the split runs once per row
    (a non-cheap multi-consumer alias is kept un-inlined by Catalyst)."""
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_len(text: Column | str) -> Column:
    """Average token length (0 for empty docs)."""
    return mean_token_len_from_tokens(tokens(text))


def stopword_ratio_from_tokens(
    toks: Column, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]
) -> Column:
    """Stopword fraction over a precomputed token array."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    """Fraction of tokens that are stopwords — the classic quality
    signal (Gopher/C4-style filters)."""
    return stopword_ratio_from_tokens(tokens(text), stopwords)


def lang_id_from_tokens(
    toks: Column, langs: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """Language ID over a precomputed token array (see lang_id)."""
    langs = langs or LANG_STOPWORDS
    scored = []
    for lang in sorted(langs):
        sw = F.array(*[F.lit(s) for s in langs[lang]])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    return F.array_max(F.array(*scored))["lang"]


def lang_id(text: Column | str, langs: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Stopword-counting language ID: the language whose stopword list
    hits the most tokens wins; ties break to the lexicographically
    greatest tag (struct-max semantics — trivially reproducible in the
    SQL oracle as ``ORDER BY hits DESC, lang DESC LIMIT 1``)."""
    return lang_id_from_tokens(tokens(text), langs)


def quality_score_from_tokens(toks: Column) -> Column:
    """Composite quality heuristic over a precomputed token array
    (see quality_score)."""
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    mtl = mean_token_len_from_tokens(toks)
    mtl_score = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_score = F.least(stopword_ratio_from_tokens(toks) * F.lit(5.0), F.lit(1.0))
    return F.round((len_score + mtl_score + sw_score) / F.lit(3.0), 4) + F.lit(0.0)


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: rewards mid-length docs,
    healthy mean token length, and presence of stopwords — the shape of
    C4/Gopher quality rules, reduced to a deterministic formula."""
    return quality_score_from_tokens(tokens(_c(text)))


def hash32(col: Column | str) -> Column:
    """Deterministic 32-bit string hash both engines share: the first 8
    hex digits of md5, read as an integer."""
    return F.conv(F.substring(F.md5(_c(col).cast("string")), 1, 8), 16, 10).cast("bigint")


def fingerprint_from_tokens(toks: Column) -> Column:
    """Rolling fingerprint over a precomputed token array (see
    fingerprint)."""
    hashes = F.transform(toks, lambda x: hash32(x) % FINGERPRINT_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(FINGERPRINT_MOD),
    )


def fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over token hashes, mod FINGERPRINT_MOD (rolling/Rabin fingerprint —
    public-domain technique). Same content in the same order → same
    fingerprint; any reorder or edit changes it."""
    return fingerprint_from_tokens(tokens(text))


def text_profile(text: Column | str) -> list[Column]:
    """The full per-document profile as aliased columns — one map-only
    projection computing every statistic in a single pass."""
    t = _c(text)
    stats = char_stats(t)
    return [
        token_count(t).alias("n_tokens"),
        regex_token_count(t).alias("n_bpe_tokens"),
        stats["n_chars"].alias("n_chars"),
        stats["n_letters"].alias("n_letters"),
        stats["n_digits"].alias("n_digits"),
        stats["n_punct"].alias("n_punct"),
        F.round(mean_token_len(t), 4).alias("mean_token_len"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    ]
