"""Randomized (fixed-seed) invariant tests for the round-4 operators.

Oracle parity pins exact values on the driver corpus; these generate
adversarial random fixtures once per test (hypothesis-style properties,
but one Spark job per test instead of one per example) and assert the
operators' structural invariants hold on shapes the corpus never shows.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spark_etl_framework_spark.operators import corpus as C
from spark_etl_framework_spark.operators import etl as E

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _rand_text(rng, lo=0, hi=30):
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


def test_scd2_invariants_random_updates(spark):
    rng = random.Random(42)
    keys = list(range(200))
    hist_rows = [(k, rng.choice("ABC"), float(rng.randint(0, 50)), "2024-01-01", None, True) for k in keys]
    # ~half the keys get updates; some identical (no-ops), some changed;
    # plus 30 brand-new keys
    upd_rows = []
    for k in rng.sample(keys, 100):
        seg, bal = hist_rows[k][1], hist_rows[k][2]
        if rng.random() < 0.5:
            upd_rows.append((k, seg, bal))  # no-op
        else:
            upd_rows.append((k, rng.choice("ABCD"), bal + rng.choice([0.0, 5.0])))
    upd_rows += [(1000 + i, "N", 1.0) for i in range(30)]
    history = spark.createDataFrame(
        hist_rows, "k int, seg string, bal double, eff_from string, eff_to string, is_current boolean"
    )
    updates = spark.createDataFrame(upd_rows, "k int, seg string, bal double")
    out = E.scd2_merge(history, updates, "k", ["seg", "bal"], "2024-06-01")

    # exactly one current row per key, for every key ever seen
    cur = out.filter("is_current")
    assert cur.count() == cur.select("k").distinct().count() == 200 + 30
    # closed rows always carry eff_to; current rows never do
    assert out.filter("is_current AND eff_to IS NOT NULL").count() == 0
    assert out.filter("NOT is_current AND eff_to IS NULL").count() == 0
    # every updated-and-changed key's current row equals the update
    u = updates.withColumnRenamed("seg", "useg").withColumnRenamed("bal", "ubal")
    j = cur.join(u, "k")
    mismatch = j.filter(
        (F.col("eff_from") == "2024-06-01")
        & (~F.col("seg").eqNullSafe(F.col("useg")) | ~F.col("bal").eqNullSafe(F.col("ubal")))
    )
    assert mismatch.count() == 0
    # keys whose update was byte-identical to history must be true no-ops
    # (original eff_from, no closed row); changed keys must show the new
    # eff_from and exactly one closed row
    noop_keys = {
        k for k, seg, bal in upd_rows
        if k < 1000 and (seg, bal) == (hist_rows[k][1], hist_rows[k][2])
    }
    changed_keys = {k for k, *_ in upd_rows if k < 1000} - noop_keys
    got = {r["k"]: r for r in cur.filter(F.col("k") < 1000).collect()}
    assert all(got[k]["eff_from"] == "2024-01-01" for k in noop_keys)
    assert all(got[k]["eff_from"] == "2024-06-01" for k in changed_keys)
    closed_counts = {
        r["k"]: r["count"]
        for r in out.filter("NOT is_current").groupBy("k").count().collect()
    }
    assert all(closed_counts.get(k, 0) == 1 for k in changed_keys)
    assert all(k not in closed_counts for k in noop_keys)


def test_chunk_dedup_invariants_random_corpus(spark):
    rng = random.Random(7)
    rows = [(i, _rand_text(rng)) for i in range(120)]
    # inject heavy boilerplate overlap
    boiler = " ".join(_WORDS[:8])
    rows += [(200 + i, boiler + " " + _rand_text(rng, 0, 10)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = C.chunk_dedup(df, chunk_words=4)

    # per-doc sanity
    assert out.filter("n_kept > n_chunks OR n_kept < 0").count() == 0
    assert out.count() == len(rows)
    # global first-occurrence-wins: total kept chunks == corpus-wide
    # distinct chunk count (re-derive chunks independently)
    toks = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    nc = F.ceil(F.size("_t") / F.lit(4.0)).cast("int")
    chunks = (
        df.select("doc_id", toks.alias("_t"))
        .select("doc_id", F.explode(F.sequence(F.lit(0), nc - 1)).alias("i"), "_t")
        .select(F.array_join(F.slice("_t", F.col("i") * 4 + 1, 4), " ").alias("chunk"))
    )
    n_distinct = chunks.distinct().count()
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    assert total_kept == n_distinct
    # reassembled text is always a subsequence of the original chunks
    joined = out.join(df, "doc_id").filter(
        (F.col("n_kept") == F.col("n_chunks"))
        & (F.trim("text_clean") != F.trim("text"))
    )
    assert joined.count() == 0


def test_scd2_two_batch_sequence(spark):
    """History accumulates correctly across TWO merge batches: a key
    changed in both batches ends with three versions (original closed,
    mid closed, final current) and correct effective ranges."""
    history = spark.createDataFrame(
        [(1, "A", "2024-01-01", None, True), (2, "X", "2024-01-01", None, True)],
        "k int, seg string, eff_from string, eff_to string, is_current boolean",
    )
    u1 = spark.createDataFrame([(1, "B")], "k int, seg string")
    h2 = E.scd2_merge(history, u1, "k", ["seg"], "2024-03-01")
    u2 = spark.createDataFrame([(1, "C"), (2, "X")], "k int, seg string")
    h3 = E.scd2_merge(h2, u2, "k", ["seg"], "2024-06-01")

    rows = sorted(
        (r["k"], r["seg"], r["eff_from"], r["eff_to"], r["is_current"])
        for r in h3.collect()
    )
    assert rows == [
        (1, "A", "2024-01-01", "2024-03-01", False),
        (1, "B", "2024-03-01", "2024-06-01", False),
        (1, "C", "2024-06-01", None, True),
        (2, "X", "2024-01-01", None, True),  # no-op in batch 2
    ]
