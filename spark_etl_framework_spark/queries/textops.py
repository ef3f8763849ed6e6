"""Text-analysis + multimodal-metadata queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import text as T
from . import register

_SW = ", ".join(f"'{w}'" for w in T.EN_STOPWORDS)


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT)       AS n_tokens,
           CAST(length(text) AS INT)                                         AS n_chars_obs,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INT)   AS n_alpha,
           CAST(ceil(length(text) / 4) AS INT)                               AS est_bpe_tokens,
           round((length(text) - len(regexp_split_to_array(trim(text), '\\s+')) + 1)
                 / len(regexp_split_to_array(trim(text), '\\s+')), 4)        AS mean_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish estimate) — narrow map, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.with_token_stats(docs).drop("text")


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+')                       AS toks,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)                                 AS alpha_ratio
        FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains([{_SW}], x))) AS INT) AS n_stopwords,
           round(0.4 * least(1.0, len(toks) / 100.0)
                 + 0.3 * least(1.0, (len(list_filter(toks, x -> list_contains([{_SW}], x)))
                                     / greatest(len(toks), 1)) * 3)
                 + 0.3 * alpha_ratio, 6)                                       AS quality_score
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length / stopword-ratio / alpha-ratio)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.with_quality_score(docs).select("doc_id", "n_stopwords", "quality_score")


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.LANG_LEXICONS[lang])
    return f"len(list_filter(toks, x -> list_contains([{words}], x)))"


#: shared oracle fragments: token/hit CTEs + the argmax prediction CASE —
#: text_language_id and text_langid_confusion MUST stay tiebreak-identical
_LANGID_HITS_CTE = f"""
    t AS (SELECT doc_id, lang,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents),
    h AS (SELECT doc_id, lang,
                 CAST({{de}} AS INT) AS hits_de,
                 CAST({{en}} AS INT) AS hits_en,
                 CAST({{es}} AS INT) AS hits_es,
                 CAST({{fr}} AS INT) AS hits_fr
          FROM t)"""

_LANGID_PRED_CASE = """CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
                WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
                WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
                WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
                ELSE 'fr' END"""


def _langid_hits_cte() -> str:
    return _LANGID_HITS_CTE.format(
        de=_lang_hits_sql("de"),
        en=_lang_hits_sql("en"),
        es=_lang_hits_sql("es"),
        fr=_lang_hits_sql("fr"),
    )


@register(
    "text_language_id",
    oracle=f"""
    WITH {_langid_hits_cte()}
    SELECT doc_id, lang AS labeled_lang, hits_de, hits_en, hits_es, hits_fr,
           {_LANGID_PRED_CASE} AS pred_lang
    FROM h
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-hit language ID (argmax over per-language function-word hits,
    alphabetical tiebreak)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("labeled_lang"), "text"
    )
    out = T.with_language_id(docs)
    return out.select(
        "doc_id", "labeled_lang", "hits_de", "hits_en", "hits_es", "hits_fr", "pred_lang"
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 fingerprint over normalized text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.with_fingerprint(docs).select("doc_id", "fingerprint")


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text)                                AS content_md5,
           hex(encode(substr(text, 1, 8)))          AS header_hex
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary-column plumbing: treat content as bytes (as an
    image/audio payload would be) and extract typed metadata — size, content
    hash, magic-header hex. The decode path proper is the mapInPandas stub in
    operators/multimodal.py."""
    from ..operators.multimodal import binary_metadata

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return binary_metadata(docs, "payload")


@register(
    "text_chunk_windows",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
               FROM documents),
    st AS (SELECT doc_id, a, unnest(range(0, greatest(len(a) - 1, 0) + 1, 12)) AS s
           FROM t WHERE len(a) > 0)
    SELECT doc_id,
           CAST(s // 12 AS INT)              AS chunk_id,
           CAST(least(16, len(a) - s) AS INT) AS n_tokens,
           array_to_string(a[s + 1 : s + 16], ' ') AS chunk_text
    FROM st
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: 16-token chunks every 12 tokens (4-token
    overlap), generated map-side with sequence/transform/slice — zero
    shuffles, runs at scan speed at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.chunk_token_windows(docs, "doc_id", "text", size=16, stride=12)


@register(
    "text_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 4)
          < (CASE WHEN lang = 'en' THEN '2000' ELSE '8000' END)
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: English kept at 12.5 %
    (0x2000/0x10000), every other language at 50 % — md5-threshold
    selection, so the sample is reproducible and auditable (no rand())
    and identical in any engine. Map-side only: no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return T.stratified_sample(docs, "lang", {"en": 0.125}, 0.5, id_col="doc_id")


@register(
    "text_topk_sample_per_stratum",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, lang, md5('k:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id)
                    AS INT) AS rn
        FROM keyed
    )
    SELECT doc_id, lang, rn FROM ranked WHERE rn <= 5
    """,
)
def text_topk_sample_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank documents inside
    each language by an md5 sort key (a fixed random permutation — no
    rand(), identical in any engine and across resumes) and keep the
    first 5. One shuffle on the stratum key; the eval-set/holdout
    selection step of a corpus pipeline."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.md5(F.concat(F.lit("k:"), F.col("doc_id").cast("string"))).alias("skey"),
    )
    w = W.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang", "rn")
    )


@register(
    "text_quality_filter_median",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               regexp_split_to_array(trim(text), '\\s+')                       AS toks,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)                                 AS alpha_ratio
        FROM documents
    ),
    q AS (
        SELECT doc_id, lang,
               round(0.4 * least(1.0, len(toks) / 100.0)
                     + 0.3 * least(1.0, (len(list_filter(toks, x -> list_contains([{_SW}], x)))
                                         / greatest(len(toks), 1)) * 3)
                     + 0.3 * alpha_ratio, 6)                                   AS quality_score
        FROM t
    ),
    m AS (SELECT lang, round(quantile_cont(quality_score, 0.5), 6) AS lang_median
          FROM q GROUP BY lang)
    SELECT q.doc_id, q.lang, q.quality_score, m.lang_median
    FROM q JOIN m ON q.lang = m.lang
    WHERE q.quality_score >= m.lang_median
    """,
)
def text_quality_filter_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile quality gate: keep documents at or above their language's
    median quality score — the relative (per-stratum) variant of a fixed
    quality threshold, robust to quality distributions that differ by
    language. Medians are exact interpolated percentiles computed per
    group (group-cardinality output, re-joined via AQE-sized join); the
    corpus is scanned once for scores and once for the gate."""
    from ..operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = with_quality_score(docs).select("doc_id", "lang", "quality_score")
    medians = scored.groupBy("lang").agg(
        F.round(F.percentile("quality_score", F.lit(0.5)), 6).alias("lang_median")
    )
    return scored.join(medians, "lang").filter(
        F.col("quality_score") >= F.col("lang_median")
    ).select("doc_id", "lang", "quality_score", "lang_median")


@register(
    "text_tokenstats_pandas",
    # Same semantics as text_token_stats' integer core, but computed on the
    # Arrow/pandas path — the driver hash-match proves the Python escape
    # hatch (mapInPandas) produces bit-identical results to the SQL oracle.
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT)       AS n_tokens,
           CAST(length(text) AS INT)                                         AS n_chars_obs,
           CAST(ceil(length(text) / 4) AS INT)                               AS est_bpe_tokens
    FROM documents
    """,
)
def text_tokenstats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics via ``mapInPandas`` (Arrow-batched, vectorized
    pandas string ops — the shape every real Python extension op takes:
    narrow, no shuffle, integer outputs immune to float summation order).
    Exists alongside the pure-column text_token_stats to keep the Python
    path itself under the correctness gate."""
    import math

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for pdf in batches:
            text = pdf["text"].fillna("")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": text.str.strip().str.split(r"\s+").str.len()
                    .astype("int32"),
                    "n_chars_obs": text.str.len().astype("int32"),
                    "est_bpe_tokens": (text.str.len() / 4).map(math.ceil)
                    .astype("int32"),
                }
            )

    return docs.mapInPandas(
        stats, "doc_id long, n_tokens int, n_chars_obs int, est_bpe_tokens int"
    )


@register(
    "text_kmv_distinct",
    # KMV sketch (k=64): k-th smallest md5-fraction per lang → estimate
    # (k-1)/h_k; groups with < k distinct tokens are exact by definition.
    # conv(hex,16,10)/16^8 in Spark == 32-bit big-endian fraction; DuckDB
    # reconstructs the same fraction by summing hex-digit place values.
    oracle="""
    WITH toks AS (
      SELECT lang AS grp,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    -- distinct on the FULL md5 (exact at any cardinality), fraction from
    -- its first 8 hex chars — mirrors operators/text.py:kmv_distinct
    dk AS (SELECT DISTINCT grp, md5(tok) AS hk FROM toks WHERE tok <> ''),
    hashed AS (
      SELECT grp,
             list_sum(list_transform(range(1, 9),
               i -> (strpos('0123456789abcdef', substr(hk, i, 1)) - 1)
                    * power(16.0, 8 - i))) / power(16.0, 8) AS h
      FROM dk
    ),
    kth AS (
      SELECT grp, max(h) AS h_k, count(*) AS n_in_sketch
      FROM (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM hashed)
      WHERE rn <= 64 GROUP BY grp
    ),
    exact AS (SELECT grp, CAST(count(*) AS BIGINT) AS exact_distinct FROM hashed GROUP BY grp)
    SELECT k.grp AS lang,
           round(CASE WHEN k.n_in_sketch < 64 THEN exact_distinct * 1.0
                      ELSE 63 / k.h_k END, 2) AS est_distinct,
           exact_distinct,
           round(abs((CASE WHEN k.n_in_sketch < 64 THEN exact_distinct * 1.0
                           ELSE 63 / k.h_k END) - exact_distinct)
                 / exact_distinct, 6) AS rel_error
    FROM kth k JOIN exact e ON e.grp = k.grp
    """,
)
def text_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token KMV sketch estimate vs exact
    (operators/text.py:kmv_distinct, k=64) — the deterministic,
    engine-agnostic alternative to HLL whose estimate is itself
    oracle-checkable."""
    from ..operators.text import kmv_distinct

    return kmv_distinct(load_table(spark, sf_dir, "documents"), "lang", "text", k=64)


@register(
    "text_quality_rules",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\\s+') AS toks,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1) AS alpha_ratio
        FROM documents
    ),
    m AS (
        SELECT doc_id, source,
               len(toks) AS n_tok,
               list_sum(list_transform(toks, x -> length(x)))
                   / greatest(len(toks), 1) AS mean_len,
               alpha_ratio,
               len(list_filter(toks, x -> list_contains([{_SW}], x))) AS n_stop,
               list_max(list_transform(list_distinct(toks),
                        t -> len(list_filter(toks, x -> x = t))))
                   / greatest(len(toks), 1) AS top_share
        FROM t
    ),
    r AS (
        SELECT doc_id, source,
               COALESCE(n_tok >= 10, false)                        AS rule_min_tokens,
               COALESCE(n_tok <= 10000, false)                     AS rule_max_tokens,
               COALESCE(mean_len >= 2.0 AND mean_len <= 12.0, false) AS rule_word_len,
               COALESCE(alpha_ratio >= 0.6, false)                 AS rule_alpha,
               COALESCE(n_stop >= 2, false)                        AS rule_stopwords,
               COALESCE(top_share <= 0.25, false)                  AS rule_repetition
        FROM m
    )
    SELECT doc_id, source, rule_min_tokens, rule_max_tokens, rule_word_len,
           rule_alpha, rule_stopwords, rule_repetition,
           CAST((CASE WHEN rule_min_tokens THEN 0 ELSE 1 END)
              + (CASE WHEN rule_max_tokens THEN 0 ELSE 1 END)
              + (CASE WHEN rule_word_len THEN 0 ELSE 1 END)
              + (CASE WHEN rule_alpha THEN 0 ELSE 1 END)
              + (CASE WHEN rule_stopwords THEN 0 ELSE 1 END)
              + (CASE WHEN rule_repetition THEN 0 ELSE 1 END) AS INT) AS n_rules_failed,
           (rule_min_tokens AND rule_max_tokens AND rule_word_len
            AND rule_alpha AND rule_stopwords AND rule_repetition) AS passes_all
    FROM r
    """,
)
def text_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule-set filter with per-rule audit booleans —
    zero-shuffle row-local expressions (operators/text.py:
    with_quality_rules)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return T.with_quality_rules(docs).drop("text")


@register(
    "text_countmin_freq",
    oracle="""
    WITH tk AS (
        SELECT tok
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
              FROM documents)
        WHERE tok <> ''
    ),
    seeds AS (SELECT unnest(range(4)) AS seed),
    sketch AS (
        SELECT seed,
               substr(md5(CAST(seed AS VARCHAR) || ':' || tok), 1, 3) AS bucket,
               count(*) AS cnt
        FROM tk CROSS JOIN seeds
        GROUP BY seed, bucket
    ),
    truec AS (
        SELECT tok, count(*) AS true_count
        FROM tk GROUP BY tok
        ORDER BY true_count DESC, tok
        LIMIT 20
    )
    SELECT t.tok                                        AS token,
           CAST(t.true_count AS BIGINT)                 AS true_count,
           CAST(min(c.cnt) AS BIGINT)                   AS est_count,
           CAST(min(c.cnt) - t.true_count AS BIGINT)    AS overshoot
    FROM truec t
    CROSS JOIN seeds s
    JOIN sketch c
      ON c.seed = s.seed
     AND c.bucket = substr(md5(CAST(s.seed AS VARCHAR) || ':' || t.tok), 1, 3)
    GROUP BY t.tok, t.true_count
    ORDER BY true_count DESC, token
    """,
)
def text_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch calibration: build the fixed-size (4 × 4096)
    counter table over the whole token stream, then probe it with the
    exact top-20 tokens and report estimate vs truth (overshoot ≥ 0 by
    construction — CM never undercounts).

    Plan: the sketch is one groupBy over a key space capped at 16384
    regardless of corpus size (partial agg collapses each task's stream
    before the exchange); the exact leg is the vocabulary groupBy feeding
    TakeOrderedAndProject(20); the probe joins the ≤16k-row sketch
    BROADCAST against 20×4 rows. Nothing vocabulary-sized crosses the
    wire twice, and at 100 TB the sketch side's shuffle stays 16k rows
    per task — the entire point of the operator (operators/text.py:
    countmin_sketch docstring has the full scale argument)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    sketch = T.countmin_sketch(docs, "text", depth=4, width_hex=3)
    toks = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "tok")
        .limit(20)
    )
    est = T.countmin_estimate(top, sketch, "tok", depth=4, width_hex=3)
    return est.select(
        F.col("tok").alias("token"),
        F.col("true_count").cast("long").alias("true_count"),
        F.col("est_count").cast("long").alias("est_count"),
        (F.col("est_count") - F.col("true_count")).cast("long").alias("overshoot"),
    ).orderBy(F.desc("true_count"), "token")


@register(
    "text_collocations_pmi",
    oracle="""
    WITH t AS (
        SELECT regexp_split_to_array(trim(text), '\\s+') AS a FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(a)),
                                     i -> {'x': a[i], 'y': a[i+1]})) AS s
        FROM t WHERE len(a) >= 2
    ),
    cxy AS (SELECT s.x AS x, s.y AS y, count(*) AS c_xy FROM bg GROUP BY x, y),
    uni AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(a) AS tok FROM t) WHERE tok <> ''
        GROUP BY tok
    ),
    tot AS (
        SELECT (SELECT sum(c) FROM uni) AS n1, (SELECT sum(c_xy) FROM cxy) AS n2
    ),
    scored AS (
        SELECT b.x, b.y, b.c_xy,
               round(ln((b.c_xy / t.n2) / ((ux.c / t.n1) * (uy.c / t.n1))), 6)
                   AS pmi
        FROM cxy b
        JOIN uni ux ON ux.tok = b.x
        JOIN uni uy ON uy.tok = b.y
        CROSS JOIN tot t
        WHERE b.c_xy >= 5
    )
    SELECT x, y, CAST(c_xy AS BIGINT) AS c_xy, pmi
    FROM scored
    ORDER BY pmi DESC, x, y
    LIMIT 30
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: pointwise mutual information of adjacent
    token bigrams, ln(p(xy) / (p(x)·p(y))), min count 5, top 30 — the
    corpus-statistics pass that surfaces multi-word units ("new york")
    before tokenizer/vocab decisions.

    Plan: bigram counts (one shuffle off the in-row adjacent-pair
    transform — text never leaves its row), unigram counts (one
    shuffle), two UNHINTED joins of bigrams against the vocabulary
    relation (Zipf/Heaps-bounded but corpus-derived — AQE sizes it,
    same rationale as the tfidf idf join), 1-row totals broadcast, then
    TakeOrderedAndProject(30). Everything on the wire is (token, count)
    pairs — vocabulary-sized, never corpus-sized."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    t = docs.select(T.tokens(F.col("text")).alias("a"))
    bg = (
        t.filter(F.size("a") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(a) - 2),"
                    " i -> struct(a[i] AS x, a[i + 1] AS y))"
                )
            ).alias("s")
        )
        .select("s.x", "s.y")
    )
    cxy = bg.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        t.select(F.explode("a").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n1")).crossJoin(
        cxy.agg(F.sum("c_xy").alias("n2"))
    )
    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("cy"))
    scored = (
        cxy.filter(F.col("c_xy") >= 5)
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("n2"))
                    / ((F.col("cx") / F.col("n1")) * (F.col("cy") / F.col("n1")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "x", "y").limit(30)


@register(
    "text_weighted_sample",
    # Efraimidis–Spirakis A-Res with deterministic md5 randomness: the
    # per-doc exponential-race key ln(u)/w is a monotone transform of
    # u^(1/w), so top-k by it IS a weighted-without-replacement sample
    # (P(first pick = i) = w_i/Σw). The hex-fraction reconstruction
    # mirrors the KMV oracle above.
    oracle="""
    WITH d AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
               md5('ws:' || CAST(doc_id AS VARCHAR))          AS hk
        FROM documents
    ),
    k AS (
        SELECT doc_id, n_tok,
               ln((list_sum(list_transform(range(1, 9),
                     i -> (strpos('0123456789abcdef', substr(hk, i, 1)) - 1)
                          * power(16.0, 8 - i))) + 1) / (power(16.0, 8) + 1))
               / greatest(n_tok, 1) AS key
        FROM d
    )
    SELECT doc_id, CAST(n_tok AS INT) AS n_tokens, round(key, 8) AS sample_key
    FROM k ORDER BY key DESC, doc_id LIMIT 100
    """,
)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample (Efraimidis–Spirakis A-Res), weight =
    token count: pick 100 docs with inclusion probability ∝ length —
    the subsampling primitive for building token-budgeted mixtures where
    uniform doc sampling would under-represent long documents.

    Determinism: u = md5-fraction of the doc id (same 32-bit big-endian
    construction as the KMV sketch), so the sample — not just its
    size — is reproducible and oracle-checkable. Key = ln(u)/w, the
    monotone twin of the textbook u^(1/w).

    Plan: a pure narrow map (tokenize, hash, one ln) feeding
    TakeOrderedAndProject(100) — per-partition top-k then a k·P-row
    merge at the driver; NO shuffle, NO window, no full sort at any
    scale. Distributed reservoir sampling without the reservoir."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("n_tok"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("double")
        .alias("hv"),
    )
    k = d.select(
        "doc_id",
        "n_tok",
        (
            F.log((F.col("hv") + 1) / F.lit(float(16**8) + 1))
            / F.greatest(F.col("n_tok"), F.lit(1))
        ).alias("key"),
    )
    return (
        k.orderBy(F.desc("key"), "doc_id")
        .limit(100)
        .select(
            "doc_id",
            F.col("n_tok").cast("int").alias("n_tokens"),
            F.round("key", 8).alias("sample_key"),
        )
    )


@register(
    "text_heavyhitters_mg",
    # the sketch only gates CANDIDACY (provable superset of everything
    # above n/t); reported counts come from the exact recount, so the
    # oracle is a plain GROUP BY ... HAVING over the token relation.
    oracle=r"""
    WITH t AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    t2 AS (SELECT tok FROM t WHERE tok <> ''),
    tot AS (SELECT count(*) AS c FROM t2)
    SELECT tok,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           round(count(*) / (SELECT c FROM tot), 6) AS frequency
    FROM t2 GROUP BY tok
    HAVING count(*) * 40 > (SELECT c FROM tot)
    """,
)
def text_heavyhitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (frequency > 1/40 of total token mass) via
    bounded-state Misra-Gries summaries per partition + exact recount of
    the candidate union (operators/text.py:heavy_hitters_mg). The full
    token relation never shuffles — only ≤ partitions × capacity
    candidate strings cross the wire, then a candidate-filtered count."""
    docs = load_table(spark, sf_dir, "documents")
    return T.heavy_hitters_mg(docs, "text", capacity=80, t=40)


@register(
    "text_char_entropy",
    # both sides fold the per-character terms in the SAME sorted-distinct
    # order (list_sort / array_sort), so the float sums are the identical
    # IEEE sequence, not just close.
    oracle="""
    WITH c AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z]') AS arr
        FROM documents
    ),
    s AS (SELECT doc_id, arr, list_sort(list_distinct(arr)) AS d,
                 len(arr) AS n
          FROM c)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_letters,
           CASE WHEN n = 0 THEN 0.0 ELSE round(
             -list_sum(list_transform(d, ch ->
                (len(list_filter(arr, x -> x = ch)) / CAST(n AS DOUBLE))
                * log2(len(list_filter(arr, x -> x = ch)) / CAST(n AS DOUBLE))
             )), 6) END AS char_entropy
    FROM s
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap gibberish
    and base64-blob detector (natural English sits ~4.1 bits/letter;
    uniform noise near log2(26)). Entirely ROW-LOCAL array expressions
    (distinct -> per-char counts -> fold), zero shuffles at any corpus
    size — the same O(distinct x n)-per-row shape as top_token_count."""
    docs = load_table(spark, sf_dir, "documents")
    # staged projections so the regex extraction materializes ONCE per
    # row (arr is referenced twice below — CollapseProject keeps
    # multiply-referenced non-cheap aliases, so the lambda scans the
    # extracted array, not the regex)
    a = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]', 0)").alias("arr"),
    )
    b = a.select(
        "doc_id",
        F.size("arr").cast("bigint").alias("n_letters"),
        F.expr(
            "transform(array_sort(array_distinct(arr)), "
            "ch -> size(filter(arr, x -> x = ch)))"
        ).alias("counts"),
    )
    return b.select(
        "doc_id",
        "n_letters",
        F.expr(
            "CASE WHEN n_letters = 0 THEN 0.0 ELSE round(-aggregate(counts, "
            "CAST(0.0 AS DOUBLE), (acc, cnt) -> acc "
            "+ (cnt / CAST(n_letters AS DOUBLE)) "
            "* log2(cnt / CAST(n_letters AS DOUBLE))), 6) END"
        ).alias("char_entropy"),
    )


#: domain stoplist for RAKE phrase boundaries — the corpus's most frequent
#: function-like tokens (RAKE is stoplist-parameterized by design)
_RAKE_STOP_PAT = r"\b(?:join|hash|row|batch|scan|filter|column|customer)\b"


@register(
    "text_rake_keywords",
    # same regex on both engines (verified: Spark split == DuckDB
    # regexp_split_to_array on this corpus incl. empty-fragment
    # handling); word scores round to 6 dp then accumulate in DECIMAL so
    # phrase scores are engine-exact.
    oracle=rf"""
    WITH f AS (SELECT unnest(regexp_split_to_array(lower(text),
                    '{_RAKE_STOP_PAT}')) AS frag
               FROM documents),
    p0 AS (SELECT trim(frag) AS frag FROM f WHERE trim(frag) <> ''),
    ph AS (SELECT regexp_split_to_array(frag, '\s+') AS ws FROM p0
           WHERE len(regexp_split_to_array(frag, '\s+')) BETWEEN 1 AND 4),
    phw AS (SELECT unnest(ws) AS w, len(ws) AS l FROM ph),
    wsc AS (SELECT w,
                   CAST(round(CAST(sum(l) AS DOUBLE) / count(*), 6)
                        AS DECIMAL(18,6)) AS score
            FROM phw GROUP BY w),
    pc AS (SELECT array_to_string(ws, ' ') AS phrase, count(*) AS n_occ
           FROM ph GROUP BY 1),
    psc AS (SELECT pc.phrase, pc.n_occ, sum(wsc.score) AS rake
            FROM pc, unnest(regexp_split_to_array(pc.phrase, ' ')) AS t(w)
            JOIN wsc ON t.w = wsc.w
            GROUP BY pc.phrase, pc.n_occ)
    SELECT phrase, CAST(n_occ AS BIGINT) AS n_occ,
           CAST(rake AS DOUBLE) AS rake_score
    FROM psc ORDER BY rake DESC, phrase LIMIT 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: candidate phrases are maximal runs
    between stoplist tokens (regex split — row-local), word scores are
    degree/frequency over the phrase corpus, phrase scores sum their
    words' scores. Two narrow aggregations (word stats, phrase counts) +
    one UNHINTED word-score join (corpus-derived relation — AQE sizes
    it), then a 20-row top-k. The standard keyphrase baseline a corpus
    profile ships alongside TF-IDF/BM25."""
    docs = load_table(spark, sf_dir, "documents")
    frags = F.explode(F.split(F.lower(F.col("text")), _RAKE_STOP_PAT)).alias(
        "frag"
    )
    p0 = docs.select(frags).select(F.trim("frag").alias("frag")).filter(
        F.col("frag") != ""
    )
    ph = p0.select(F.split("frag", r"\s+").alias("ws")).filter(
        F.size("ws").between(1, 4)
    )
    phw = ph.select(F.explode("ws").alias("w"), F.size("ws").alias("l"))
    wsc = phw.groupBy("w").agg(
        F.round(F.sum("l").cast("double") / F.count(F.lit(1)), 6)
        .cast("decimal(18,6)")
        .alias("score")
    )
    pc = ph.select(F.array_join("ws", " ").alias("phrase")).groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    psc = (
        pc.select("phrase", "n_occ", F.explode(F.split("phrase", " ")).alias("w"))
        .join(wsc, "w")
        .groupBy("phrase", "n_occ")
        .agg(F.sum("score").alias("rake"))
    )
    return (
        psc.orderBy(F.desc("rake"), F.asc("phrase"))
        .limit(20)
        .select(
            "phrase",
            F.col("n_occ").cast("bigint").alias("n_occ"),
            F.col("rake").cast("double").alias("rake_score"),
        )
    )


@register(
    "text_bigram_lm_eval",
    # train a bigram LM on even doc_ids, evaluate next-token top-1
    # accuracy on odd doc_ids. argmax over train counts is deterministic
    # (count DESC, token ASC); everything integer until the final ratio.
    oracle=r"""
    WITH t AS (SELECT doc_id,
                      regexp_split_to_array(trim(text), '\s+') AS a
               FROM documents),
    bg AS (SELECT doc_id, unnest(a[1:len(a)-1]) AS prev, unnest(a[2:len(a)]) AS nxt
           FROM t WHERE len(a) >= 2),
    tr AS (SELECT prev, nxt, count(*) AS n FROM bg
           WHERE doc_id % 2 = 0 GROUP BY prev, nxt),
    pred AS (SELECT prev, nxt AS predicted FROM (
               SELECT prev, nxt,
                      row_number() OVER (PARTITION BY prev
                                         ORDER BY n DESC, nxt) AS rn
               FROM tr) WHERE rn = 1),
    ev AS (SELECT bg.prev, bg.nxt, pred.predicted
           FROM bg LEFT JOIN pred ON bg.prev = pred.prev
           WHERE bg.doc_id % 2 = 1)
    SELECT CAST(count(*) AS BIGINT) AS n_eval_bigrams,
           CAST(count(*) FILTER (WHERE predicted IS NOT NULL) AS BIGINT)
               AS n_covered,
           CAST(count(*) FILTER (WHERE predicted = nxt) AS BIGINT) AS n_correct,
           round(count(*) FILTER (WHERE predicted = nxt)
                 / CAST(count(*) AS DOUBLE), 6) AS top1_accuracy
    FROM ev
    """,
)
def text_bigram_lm_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model backtest: train next-token counts on the
    even-id half of the corpus, predict argmax(count) with a
    deterministic tiebreak, score top-1 accuracy on the odd-id half —
    the train/eval-split evaluation shape every data-quality experiment
    reuses. Adjacent pairs come from parallel array slices (row-local);
    two token-keyed shuffles (train counts, eval join) + a 1-row
    metric."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("a")
    ).filter(F.size("a") >= 2)
    pairs = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("a", 1, F.size("a") - 1).alias("prev"),
                F.slice("a", 2, F.size("a") - 1).alias("nxt"),
            )
        ).alias("z"),
    ).select("doc_id", F.col("z.prev").alias("prev"), F.col("z.nxt").alias("nxt"))
    tr = (
        pairs.filter(F.col("doc_id") % 2 == 0)
        .groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as _W

    rn = F.row_number().over(
        _W.partitionBy("prev").orderBy(F.desc("n"), F.asc("nxt"))
    )
    pred = (
        tr.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    ev = pairs.filter(F.col("doc_id") % 2 == 1).join(pred, "prev", "left")
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_bigrams"),
        F.count("predicted").cast("bigint").alias("n_covered"),
        F.sum(F.when(F.col("predicted") == F.col("nxt"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(F.when(F.col("predicted") == F.col("nxt"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("top1_accuracy"),
    )


def _bpe_ctes(rounds: int = 3) -> str:
    """The shared BPE training CTE chain (s0..s{rounds}, b1..b{rounds}),
    word carried through every rewrite so encoders can join on it."""
    ctes = [
        r"""w AS (SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS wd
           FROM documents),
    words AS (SELECT wd, count(*) AS freq FROM w WHERE wd <> '' GROUP BY wd),
    s0 AS (SELECT wd,
                  '||' || regexp_replace(replace(wd, '|', chr(26)),
                                         '(.)', '\1||', 'g') AS r,
                  freq
           FROM words)"""
    ]
    for k in range(1, rounds + 1):
        ctes.append(f"""
    sy{k} AS (SELECT freq,
                     list_slice(string_split(r, '||'), 2,
                                len(string_split(r, '||')) - 1) AS sy
              FROM s{k - 1}),
    p{k} AS (SELECT l, r2, sum(freq) AS cnt FROM (
               SELECT freq, unnest(sy[1:len(sy)-1]) AS l,
                      unnest(sy[2:len(sy)]) AS r2
               FROM sy{k} WHERE len(sy) >= 2)
             GROUP BY l, r2),
    b{k} AS (SELECT {k} AS rnd, l AS lft, r2 AS rgt, cnt
             FROM p{k} ORDER BY cnt DESC, l, r2 LIMIT 1),
    s{k} AS (SELECT wd,
                 CASE WHEN (SELECT lft FROM b{k}) IS NULL THEN r
                 ELSE replace(r,
                 '|' || (SELECT lft FROM b{k}) || '||'
                     || (SELECT rgt FROM b{k}) || '|',
                 '|' || (SELECT lft FROM b{k})
                     || (SELECT rgt FROM b{k}) || '|') END AS r, freq
             FROM s{k - 1})""")
    return "WITH " + ",".join(ctes)


def _bpe_oracle(rounds: int = 3) -> str:
    """Unrolled BPE-merge replay: same ||-fenced representation, same
    leftmost-non-overlapping replace, same (count DESC, pair ASC)
    argmax."""
    un = " UNION ALL ".join(f"SELECT * FROM b{k}" for k in range(1, rounds + 1))
    return (
        _bpe_ctes(rounds)
        + f"""
    SELECT CAST(rnd AS INT) AS round,
           replace(lft, chr(26), '|') AS "left",
           replace(rgt, chr(26), '|') AS "right",
           CAST(cnt AS BIGINT) AS pair_count
    FROM ({un})"""
    )


@register("text_bpe_train_merges", oracle=_bpe_oracle(3))
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-merge training, 3 unrolled rounds
    (operators/text.py:bpe_train_merges): the corpus collapses once to a
    vocab-sized word-frequency table, then each round is one narrow
    pair-count aggregation, a broadcast 1-row argmax, and a map-side
    fenced-string rewrite whose leftmost-non-overlapping semantics equal
    BPE's merge order in any engine. The learned merge table
    hash-matches DuckDB's replay."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bpe_train_merges(docs, "text", rounds=3)


@register(
    "text_bpe_encode_stats",
    # the trained vocab (same 3-round replay, word carried through the
    # rewrite chain) joined back onto per-document tokens: chars vs BPE
    # symbols per document.
    oracle=_bpe_ctes(3)
    + r""",
    v AS (SELECT wd, CAST(len(string_split(r, '||')) - 2 AS INT) AS n_sym
          FROM s3),
    dt AS (SELECT doc_id,
                  lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS wd
           FROM documents),
    dtn AS (SELECT doc_id, wd FROM dt WHERE wd <> '')
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT)          AS n_tokens,
           CAST(sum(length(d.wd)) AS BIGINT) AS n_chars,
           CAST(sum(v.n_sym) AS BIGINT)      AS n_bpe_symbols,
           round(sum(length(d.wd)) / CAST(sum(v.n_sym) AS DOUBLE), 6)
               AS chars_per_symbol
    FROM dtn d JOIN v ON d.wd = v.wd
    GROUP BY d.doc_id
    """,
)
def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding statistics per document: tokens, characters, BPE
    symbols under the 3-round trained vocabulary, and chars-per-symbol
    compression — the measurement that decides whether a tokenizer's
    merge budget is paying for itself on a corpus. The vocab is
    vocab-sized and joins the per-document tokens UNHINTED (both
    corpus-derived; AQE sizes them)."""
    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = T.bpe_train_merges(docs, "text", rounds=3, with_vocab=True)
    # MUST be the training-side tokenizer (operators/text.py:tokens) —
    # any divergence silently drops tokens at the vocab join
    dt = (
        docs.select(
            "doc_id", F.explode(T.tokens(F.lower("text"))).alias("w")
        )
        .filter(F.col("w") != "")
    )
    j = dt.join(vocab, "w")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        F.sum("n_symbols").cast("bigint").alias("n_bpe_symbols"),
        F.round(
            F.sum(F.length("w")) / F.sum("n_symbols").cast("double"), 6
        ).alias("chars_per_symbol"),
    )


@register(
    "text_zipf_slope",
    # Zipf exponent via least squares on (ln rank, ln freq) over the
    # top-200 tokens: ln of integers is the identical IEEE value in both
    # engines, each rounds to 6 dp into DECIMAL(12,6), and all moment
    # sums stay decimal (products fit int128 per the corr/covar note) —
    # only the final slope/intercept divisions are floating point.
    oracle=r"""
    WITH f AS (
        SELECT tok, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents) t
        WHERE tok <> '' GROUP BY tok
    ),
    r AS (SELECT tok, n,
                 row_number() OVER (ORDER BY n DESC, tok) AS rk
          FROM f),
    x AS (SELECT CAST(round(ln(rk), 6) AS DECIMAL(12,6)) AS xl,
                 CAST(round(ln(n), 6) AS DECIMAL(12,6))  AS yl
          FROM r WHERE rk <= 200),
    m AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(xl) AS DOUBLE) AS sx, CAST(sum(yl) AS DOUBLE) AS sy,
                 CAST(sum(xl * xl) AS DOUBLE) AS sxx,
                 CAST(sum(xl * yl) AS DOUBLE) AS sxy
          FROM x)
    SELECT cnt AS n_ranks,
           round((sxy - sx * sy / cnt) / (sxx - sx * sx / cnt), 6)
               AS zipf_slope,
           round(sy / cnt - (sxy - sx * sy / cnt) / (sxx - sx * sx / cnt)
                 * sx / cnt, 6) AS intercept
    FROM m
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the frequency head: least-squares slope of
    ln(freq) vs ln(rank) for the top-200 tokens (natural corpora sit
    near −1; synthetic/templated ones flatten toward 0 — a one-number
    naturalness check). One token aggregation + a 200-row ranked window;
    moment sums in DECIMAL so the fit is engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    f = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as _W

    # top-200 via TakeOrderedAndProject (per-partition heaps), THEN rank
    # the 200-row result — never a full-vocabulary single-partition window
    top = f.orderBy(F.desc("n"), F.asc("tok")).limit(200)
    r = top.withColumn(
        "rk", F.row_number().over(_W.orderBy(F.desc("n"), F.asc("tok")))
    )
    x = r.select(
        F.round(F.log("rk"), 6).cast("decimal(12,6)").alias("xl"),
        F.round(F.log("n"), 6).cast("decimal(12,6)").alias("yl"),
    )
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("xl").cast("double").alias("sx"),
        F.sum("yl").cast("double").alias("sy"),
        F.sum(F.col("xl") * F.col("xl")).cast("double").alias("sxx"),
        F.sum(F.col("xl") * F.col("yl")).cast("double").alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("cnt")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("cnt")
    )
    return m.select(
        F.col("cnt").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            F.col("sy") / F.col("cnt") - slope * F.col("sx") / F.col("cnt"), 6
        ).alias("intercept"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH {_langid_hits_cte()},
    p AS (SELECT lang AS labeled_lang,
                 {_LANGID_PRED_CASE} AS pred_lang
          FROM h)
    SELECT labeled_lang, pred_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) / CAST(sum(count(*))
                 OVER (PARTITION BY labeled_lang) AS DOUBLE), 6) AS row_frac
    FROM p GROUP BY labeled_lang, pred_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the evaluation the classifier query
    (text_language_id) feeds — per (labeled, predicted) cell the doc
    count and its row-normalized fraction. One aggregation over the
    classifier's map-side output; the normalizing window runs over the
    |langs|² cells."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("labeled_lang"), "text"
    )
    p = T.with_language_id(docs).select("labeled_lang", "pred_lang")
    c = p.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("labeled_lang")
    return c.select(
        "labeled_lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("n") / F.sum("n").over(w).cast("double"), 6).alias(
            "row_frac"
        ),
    )


@register(
    "text_feature_hashing",
    # the hashing-trick vectorizer: token -> bucket via the first md5
    # hex digit (16 buckets), counts assembled row-locally — both
    # engines compute the identical bucket from the identical hash.
    oracle=r"""
    WITH t AS (SELECT doc_id,
                      regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(g.d AS INT) AS dim,
           CAST(len(list_filter(toks, tk -> tk <> '' AND
                strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1 = g.d))
                AS INT) AS feature
    FROM t, (SELECT unnest(range(0, 16)) AS d) AS g
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) vectorizer: each document becomes
    a fixed 16-dim bag-of-words count vector with bucket = first md5 hex
    digit of the token — no vocabulary to build, ship, or keep in sync,
    which is the entire point at 100 TB. Entirely row-local array
    expressions (O(dims × tokens) per row), zero shuffles; the
    engine-portable hash means the oracle replays every count. The
    registered projection posexplodes the 16-dim vector to one scalar
    row per (doc, dim) — the driver's pandas canonicalizer cannot hash
    array cells."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    feats = F.expr(
        "transform(sequence(0, 15), d -> CAST(size(filter(toks, "
        "tk -> tk != '' AND "
        "(position(substring(md5(tk), 1, 1) IN '0123456789abcdef') - 1) = d"
        ")) AS INT))"
    )
    return a.select("doc_id", feats.alias("features")).select(
        "doc_id", F.posexplode("features").alias("dim", "feature")
    ).select(
        "doc_id",
        F.col("dim").cast("int").alias("dim"),
        F.col("feature").cast("int").alias("feature"),
    )
