"""PII operator invariants on adversarial strings (oracle parity is in
tools/check_correctness.py)."""

from __future__ import annotations

from spark_etl_framework_spark.operators import pii as P


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    return P.with_pii_flags(df).collect()[0]


def test_email_detection_and_redaction(spark):
    r = _flags(spark, "write to jane.doe+spam@sub.example.co.uk today")
    assert r["n_email"] == 1 and r["n_ipv4"] == 0 and r["n_phone"] == 0
    assert r["redacted"] == "write to <EMAIL> today"


def test_ipv4_word_boundary(spark):
    # version strings like 1.2.3.4.5 still match a 4-group prefix (the \b
    # anchors are word boundaries, not anchors against further dots) — but
    # digits embedded in words do not match
    r = _flags(spark, "servers 10.0.0.1 and 192.168.255.254 (not abc1.2.3.4x)")
    assert r["n_ipv4"] >= 2
    assert "<IP>" in r["redacted"] and "10.0.0.1" not in r["redacted"]


def test_phone_and_multiple_matches(spark):
    r = _flags(spark, "call +49 555-1234 or +44 555 9999 now")
    assert r["n_phone"] == 2
    assert r["redacted"] == "call <PHONE> or <PHONE> now"


def test_no_pii_passthrough(spark):
    r = _flags(spark, "plain text with numbers 12 34 and dots. end")
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)
    assert r["redacted"] == "plain text with numbers 12 34 and dots. end"


def test_incidence_aggregate(spark):
    df = spark.createDataFrame(
        [
            ("a", "mail me at x@y.io"),
            ("a", "nothing here"),
            ("b", "two mails p@q.de r@s.fr and ip 1.2.3.4"),
        ],
        ["src", "text"],
    )
    out = {r["src"]: r for r in P.pii_incidence(df, "src").collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["n_docs_with_pii"] == 1
    assert out["b"]["total_email"] == 2 and out["b"]["total_ipv4"] == 1


def test_null_text_counts_zero(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    df = spark.createDataFrame(
        [(1, None)], StructType([StructField("id", LongType()), StructField("text", StringType())])
    )
    r = P.with_pii_flags(df).collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)
    assert r["redacted"] is None
