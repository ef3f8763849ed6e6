"""PII scrub queries (oracle-checked).

The synthetic corpus contains no real PII, so both sides derive the same
deterministic PII-bearing column from ``doc_id`` arithmetic (emails on
%3, IPv4 on %4, phone numbers on %5 — with overlaps), then detect and
redact it. This exercises the exact operator surface
(operators/pii.py) on non-trivially matching data while keeping the
DuckDB oracle byte-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import pii as P
from . import register

_SYNTH_SQL = """
    concat_ws(' ', substring(text, 1, 40),
        CASE WHEN doc_id % 3 = 0 THEN 'contact user' || doc_id || '@mail-'
                  || (doc_id % 7) || '.com' END,
        CASE WHEN doc_id % 4 = 0 THEN 'host 10.' || (doc_id % 256) || '.0.'
                  || (doc_id % 100) END,
        CASE WHEN doc_id % 5 = 0 THEN 'tel +49 555-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0') END)
"""

# RE2 spellings of operators/pii.py's patterns (identical strings)
_EMAIL = P.EMAIL_RE
_IPV4 = P.IPV4_RE
_PHONE = P.PHONE_RE


def _synth_col() -> F.Column:
    d = F.col("doc_id")
    return F.concat_ws(
        " ",
        F.substring("text", 1, 40),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("contact user"),
                d.cast("string"),
                F.lit("@mail-"),
                (d % 7).cast("string"),
                F.lit(".com"),
            ),
        ),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("host 10."),
                (d % 256).cast("string"),
                F.lit(".0."),
                (d % 100).cast("string"),
            ),
        ),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("tel +49 555-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ),
    )


@register(
    "text_pii_redact",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SYNTH_SQL} AS text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_IPV4}')) AS INT)  AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{_PHONE}')) AS INT) AS n_phone,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                   '{_IPV4}', '<IP>', 'g'),
               '{_PHONE}', '<PHONE>', 'g') AS redacted
    FROM s
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII counts + typed-tag redaction, pure map stage
    (operators/pii.py:with_pii_flags)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _synth_col().alias("text")
    )
    return P.with_pii_flags(docs).select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "redacted"
    )


@register(
    "text_pii_incidence",
    oracle=f"""
    WITH s AS (SELECT doc_id, source, {_SYNTH_SQL} AS text FROM documents),
    f AS (SELECT source,
                 len(regexp_extract_all(text, '{_EMAIL}')) AS ne,
                 len(regexp_extract_all(text, '{_IPV4}'))  AS ni,
                 len(regexp_extract_all(text, '{_PHONE}')) AS np
          FROM s)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ne > 0 OR ni > 0 OR np > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_with_pii,
           CAST(sum(ne) AS BIGINT) AS total_email,
           CAST(sum(ni) AS BIGINT) AS total_ipv4,
           CAST(sum(np) AS BIGINT) AS total_phone
    FROM f GROUP BY source
    """,
)
def text_pii_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub-coverage report per source: map-side counts, one aggregation
    shuffle (operators/pii.py:pii_incidence)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _synth_col().alias("text")
    )
    return P.pii_incidence(docs, "source")
