"""PII detection and redaction as map-only Catalyst expressions.

A 100 TB pretraining corpus is scrubbed of personally-identifiable
information before anything else touches it (the reference engine has
no text pipeline at all — this extends the corpus suite the same way
dedup/quality/decontamination do). Two requirements shape the design:

* **Map-only.** Detection and redaction are per-row regexes — no
  shuffle, no UDF. `regexp_count` / `regexp_replace` run inside
  whole-stage codegen, so the scrub rides the same scan as the rest of
  the cleaning pipeline and costs one pass over the bytes.
* **Cross-engine determinism.** Every pattern is written in the
  common subset of Java regex (Spark) and RE2 (DuckDB): no
  backreferences, no lookaround, explicit character classes. The
  DuckDB fragments below are generated from the SAME pattern table,
  and tests/test_pii.py asserts count- and redaction-parity on edge
  cases (TLD-less emails, 5-octet "IPs", trailing-punctuation URLs).

Redaction applies the patterns in the fixed order of ``PII_PATTERNS``
(email → url → phone → ipv4); the order is part of the contract — an
email embedded in a URL path is redacted as an email first, on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered pattern table: name -> (regex, replacement token).
# The regexes deliberately avoid `'` so they can be embedded verbatim
# in a single-quoted DuckDB SQL literal.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[A-Za-z0-9._~:/?#@!$&*+%=()-]+",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _token(name: str) -> str:
    return f"<{name.upper()}>"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(text: Column | str) -> list[Column]:
    """One ``n_<kind>`` int column per pattern (map-only)."""
    t = _c(text)
    return [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def pii_redact(text: Column | str) -> Column:
    """Replace every match with its ``<KIND>`` token, patterns applied
    in ``PII_PATTERNS`` order."""
    out = _c(text)
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, _token(name))
    return out


# ---- DuckDB oracle fragments (same pattern table) -------------------------


def pii_counts_sql(x: str) -> list[str]:
    """DuckDB expressions mirroring :func:`pii_counts`, aliased the same."""
    return [
        f"len(regexp_extract_all({x}, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    ]


def pii_redact_sql(x: str) -> str:
    """DuckDB expression mirroring :func:`pii_redact` (global flag,
    same application order)."""
    out = x
    for name, pat in PII_PATTERNS.items():
        out = f"regexp_replace({out}, '{pat}', '{_token(name)}', 'g')"
    return out
