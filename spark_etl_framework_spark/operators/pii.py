"""PII detection and redaction: map-side regex column expressions.

A corpus feeding model training has to be scrubbed of emails / IPs /
phone numbers before anything downstream sees it. Everything here is a
JVM-side built-in (``regexp_count`` / ``regexp_replace``) — no Python in
the row path, so the scrub runs at scan speed and stacks under
whole-stage codegen. At 100 TB this is a pure map stage: no shuffle, no
state, trivially parallel.

Pattern discipline: the patterns below use only constructs whose
semantics agree between Java's regex engine (Spark) and RE2 (the DuckDB
oracle) — character classes, bounded/greedy quantifiers without
alternation, ``\\b`` word boundaries — so greedy leftmost matching picks
identical spans in both engines (Java's leftmost-first equals RE2's
leftmost-longest when no alternation can trade length between branches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: RE2- and Java-compatible patterns (lowercase corpus).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{2}[- ]\d{3}[- ]\d{4}"

#: redaction applies in this order (emails first: their domains would
#: otherwise be clipped by the IP/phone passes on pathological inputs)
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _count(col: Column, pattern: str) -> Column:
    # coalesce BEFORE size(): size(NULL) is -1 under Spark's legacy
    # default, which would emit count=-1 for null text and poison every
    # downstream sum/threshold
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(pattern), F.lit(0))
    ).cast("int")


def with_pii_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-pattern match counts (``n_email``/``n_ipv4``/``n_phone``,
    counted on the ORIGINAL text independently per pattern) plus a
    ``redacted`` column with all three patterns replaced by typed tags in
    the order of :data:`PATTERNS`. NULL text counts as 0 matches and
    passes through as NULL ``redacted``."""
    out = df
    red = F.col(text_col)
    for name, pat, tag in PATTERNS:
        out = out.withColumn(f"n_{name}", _count(F.col(text_col), pat))
        red = F.regexp_replace(red, pat, tag)
    return out.withColumn("redacted", red)


def pii_incidence(df: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Per-group PII incidence: document counts and total matches per
    pattern — the scrub-coverage report a curation pipeline publishes.
    One aggregation shuffle over ``group_col``; counts are computed
    map-side first."""
    flagged = with_pii_flags(df, text_col)
    any_pii = (
        (F.col("n_email") > 0) | (F.col("n_ipv4") > 0) | (F.col("n_phone") > 0)
    ).cast("int")
    return flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(any_pii).cast("bigint").alias("n_docs_with_pii"),
        F.sum("n_email").cast("bigint").alias("total_email"),
        F.sum("n_ipv4").cast("bigint").alias("total_ipv4"),
        F.sum("n_phone").cast("bigint").alias("total_phone"),
    )
