"""Deduplication queries over the documents table (oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import scoped_persist

from ..catalog import load_table
from ..operators import dedup as D
from . import register

# Shared DuckDB CTE fragments (tokens are 1-indexed in DuckDB, 0-indexed in
# Spark — the generate_series bounds mirror the Spark sequence bounds).
_SHINGLES_CTE = """
    t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, len(a) - 1),
                                        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
           FROM t WHERE len(a) >= 3)
"""

#: fixed-width shingle keys — mirrors operators/dedup.py:hashed_shingles
#: (substr(md5(shingle), 1, 16)); the exact-set legs join/count on this key
#: so shingle TEXT never crosses a Spark exchange, and DuckDB computes the
#: identical key so values (including any collision) match bit-for-bit.
_HSH_CTE = """,
    hsh AS (SELECT DISTINCT doc_id, substr(md5(shingle), 1, 16) AS shingle_key FROM sh)
"""

_SIG_CTE = (
    _SHINGLES_CTE
    + """,
    hx AS (SELECT doc_id, seed, md5(seed::VARCHAR || ':' || shingle) AS h
           FROM sh, generate_series(0, 7) AS s(seed)),
    sig AS (SELECT doc_id, CAST(seed AS INT) AS seed, min(h) AS minhash
            FROM hx GROUP BY doc_id, seed)
"""
)

_BANDS_CTE = (
    _SIG_CTE
    + """,
    bands AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band_id,
                     md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
              FROM sig GROUP BY doc_id, (seed // 2))
"""
)


@register(
    "dedup_exact",
    oracle="""
    WITH fp AS (SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
                FROM documents),
    g AS (SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS group_size
          FROM fp GROUP BY fingerprint)
    SELECT doc_id, fp.fingerprint, CAST(group_size AS BIGINT) AS group_size,
           (doc_id = keep_id) AS is_kept
    FROM fp JOIN g USING (fingerprint)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with provenance: fingerprint → group → keep min doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "doc_id", "text")


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_SIG_CTE}
    SELECT doc_id, seed, minhash FROM sig
    """,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-seed MinHash signature rows per document (word-3-gram shingles).
    The shingle stream is NON-distinct (MIN is duplicate-insensitive), so
    the only exchange is the signature groupBy's partial-aggregated min —
    shingle text never crosses the wire."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    return D.minhash_signatures(sh, "doc_id", k=8)


@register(
    "dedup_lsh_bucket_stats",
    oracle=f"""
    WITH {_BANDS_CTE}
    SELECT band_id,
           CAST(count(DISTINCT band_key) AS BIGINT) AS n_buckets,
           CAST(count(*) AS BIGINT)                 AS n_docs,
           CAST(max(bucket_n) AS BIGINT)            AS max_bucket
    FROM (SELECT band_id, band_key,
                 count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n,
                 doc_id
          FROM bands)
    GROUP BY band_id
    """,
)
def dedup_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-bucket distribution: buckets, docs, max bucket size per band.
    The skew check a real dedup run does before the candidate join."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    bands = D.lsh_bands_wide(D.minhash_wide(sh, "doc_id", k=8), "doc_id", k=8, rows_per_band=2)
    sized = bands.withColumn(
        "bucket_n", F.count(F.lit(1)).over(W.partitionBy("band_id", "band_key"))
    )
    return sized.groupBy("band_id").agg(
        F.countDistinct("band_key").alias("n_buckets"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max("bucket_n").alias("max_bucket"),
    )


@register(
    "dedup_lsh_pairs",
    oracle=f"""
    WITH {_BANDS_CTE}
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs (equi-join on band bucket)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    bands = D.lsh_bands_wide(D.minhash_wide(sh, "doc_id", k=8), "doc_id", k=8, rows_per_band=2)
    return D.lsh_candidate_pairs(bands, "doc_id")


@register(
    "dedup_ngram_jaccard_topk",
    # max_df=100 hot-shingle cap mirrored on both sides: shingles in >100
    # documents are dropped from the inverted index before the self-join
    # (the quadratic-join-key scale guard; see operators/dedup.py). The
    # index is keyed on the fixed-width md5 prefix (hashed_shingles), so
    # the oracle caps/joins the identical key.
    oracle=f"""
    WITH {_SHINGLES_CTE}{_HSH_CTE},
    fsh AS (SELECT * FROM hsh WHERE shingle_key IN
              (SELECT shingle_key FROM hsh GROUP BY shingle_key HAVING count(*) <= 100)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM fsh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM fsh a JOIN fsh b ON a.shingle_key = b.shingle_key AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 20
    """,
)
def dedup_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document pairs by word-3-gram Jaccard (inverted-index join)
    with the max_df hot-shingle cap engaged — the driver hash-checks the
    capped semantics against the identically-capped SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_topk(docs, "doc_id", "text", n=3, k=20, max_df=100)


_SIMHASH_CTE = """
    toks AS (SELECT DISTINCT doc_id, tok
                  FROM (SELECT doc_id,
                               unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                        FROM documents)),
    hv AS (SELECT doc_id,
                  (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) AS hv
           FROM toks),
    bits AS (SELECT doc_id, j, CAST(floor(hv / power(2, j)) AS INT) % 2 AS bit
             FROM hv, generate_series(0, 15) AS g(j)),
    sums AS (SELECT doc_id, j, sum(bit * 2 - 1) AS s FROM bits GROUP BY doc_id, j),
    sh16 AS (SELECT doc_id,
                    CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, j) AS INT) ELSE 0 END)
                         AS INT) AS simhash
             FROM sums GROUP BY doc_id)
"""


@register(
    "dedup_clusters",
    # edges = the LSH candidate pairs; clusters = connected components via
    # a recursive CTE (min reachable doc_id). The CTE enumerates full
    # reachability — fine for an oracle, exponential state at scale; the
    # Spark side is the hash-min propagation loop that IS the scale path.
    oracle=f"""
    WITH RECURSIVE {_BANDS_CTE},
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    reach(node, lbl) AS (
        SELECT a, a FROM e2
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN e2 e ON e.a = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM comp
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clustering: LSH candidate pairs → connected components
    (iterative hash-min label propagation) → cluster id + size per member.
    The keep-one-per-cluster step of a corpus dedup pipeline."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    bands = D.lsh_bands_wide(D.minhash_wide(sh, "doc_id", k=8), "doc_id", k=8, rows_per_band=2)
    pairs = D.lsh_candidate_pairs(bands, "doc_id")
    comp = D.connected_components(pairs, "id_a", "id_b")
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(W.partitionBy("cluster_id")).alias("cluster_size"),
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sh16
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (integer math end-to-end)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash16(docs, "doc_id", "text")


@register(
    "dedup_simhash_pairs",
    # the oracle is the UNBANDED all-pairs Hamming filter — a hash match
    # proves the pigeonhole band join loses no pair with distance ≤ 1
    oracle=f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh16 a JOIN sh16 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs at Hamming distance ≤ 1 via the
    4-band pigeonhole equi-join (no all-pairs scan); the oracle IS the
    all-pairs formulation, so the hash match proves zero recall loss."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_hamming_pairs(
        D.simhash16(docs, "doc_id", "text"), "doc_id", "simhash", max_hamming=1
    )


@register(
    "dedup_minhash_estimate_error",
    # estimator calibration: minhash-estimated Jaccard (matching signature
    # components / k) vs exact shingle Jaccard, per LSH candidate pair —
    # the dedup analogue of vector_ann_recall's quality report.
    oracle=f"""
    WITH {_BANDS_CTE}{_HSH_CTE},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b
               ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
    est AS (SELECT c.id_a, c.id_b,
                   round(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 8.0, 6)
                       AS est_jaccard
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.id_a
            JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
            GROUP BY c.id_a, c.id_b),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM hsh GROUP BY doc_id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN hsh a ON a.doc_id = c.id_a
              JOIN hsh b ON b.doc_id = c.id_b AND b.shingle_key = a.shingle_key
              GROUP BY c.id_a, c.id_b)
    SELECT e.id_a, e.id_b, e.est_jaccard,
           round(COALESCE(i.n_inter, 0)
                 / (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0)), 6) AS exact_jaccard,
           round(abs(e.est_jaccard
                 - COALESCE(i.n_inter, 0)
                   / (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0))), 6) AS abs_error
    FROM est e
    JOIN sizes sa ON sa.doc_id = e.id_a
    JOIN sizes sb ON sb.doc_id = e.id_b
    LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    """,
)
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration per LSH candidate pair: signature
    agreement (the unbiased Jaccard estimator) against exact shingle
    Jaccard, with absolute error — how a pipeline decides whether k
    signatures suffice before trusting estimate-only dedup at full scale.
    Costs: the candidate set (never n²) joined against the k-wide
    signature relation (narrow, one row per doc) and the hashed-key
    inverted index (exact leg, candidates only; shingle text never
    shuffles — signatures come off the non-distinct stream, set
    arithmetic off hashed_shingles' row-local 64-bit keys)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    raw = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    # persist the narrow multiply-consumed relations (wide: one k×32B row
    # per doc, feeds bands + both estimator sides; cand: the pair set,
    # joined twice; hsh below: (id, 16-char key), three consumers) so the
    # scan+tokenize+hash lineage runs once — unlike round 3 this caches
    # keys/digests, never shingle text; lifecycle is deterministic —
    # scoped_persist registers the blocks and the NEXT query invocation
    # releases them (caching.py), so a registry sweep never accumulates
    wide = scoped_persist(D.minhash_wide(raw, "doc_id", k=8))
    bands = D.lsh_bands_wide(wide, "doc_id", k=8, rows_per_band=2)
    cand = scoped_persist(D.lsh_candidate_pairs(bands, "doc_id"))
    wa = wide.select(F.col("doc_id").alias("id_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(8)])
    wb = wide.select(F.col("doc_id").alias("id_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(8)])
    match_frac = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(8)
    ) / F.lit(8.0)
    est = (
        cand.join(wa, "id_a").join(wb, "id_b")
        .select("id_a", "id_b", F.round(match_frac, 6).alias("est_jaccard"))
    )
    hsh = scoped_persist(D.hashed_shingles(docs, "doc_id", "text", n=3))
    sizes = hsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = hsh.select(F.col("doc_id").alias("id_a"), "shingle_key")
    b = hsh.select(F.col("doc_id").alias("id_b"), "shingle_key")
    inter = (
        cand.join(a, "id_a").join(b, ["id_b", "shingle_key"])
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    exact = F.coalesce("n_inter", F.lit(0)) / (
        F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0))
    )
    return (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b", "est_jaccard",
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - exact), 6).alias("abs_error"),
        )
    )


@register(
    "dedup_containment_pairs",
    # asymmetric containment C(A,B) = |A ∩ B| / |A|: a small document
    # quoted inside a big one scores near 1 on the small side while
    # symmetric Jaccard stays low — the doc-in-doc duplication Jaccard
    # misses. Computed only on LSH candidates, like verified_pairs.
    oracle=f"""
    WITH {_BANDS_CTE}{_HSH_CTE},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b
               ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM hsh GROUP BY doc_id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN hsh a ON a.doc_id = c.id_a
              JOIN hsh b ON b.doc_id = c.id_b AND b.shingle_key = a.shingle_key
              GROUP BY c.id_a, c.id_b)
    SELECT c.id_a, c.id_b,
           round(COALESCE(i.n_inter, 0) / sa.n_sh, 6) AS containment_a,
           round(COALESCE(i.n_inter, 0) / sb.n_sh, 6) AS containment_b,
           (greatest(COALESCE(i.n_inter, 0) / sa.n_sh,
                     COALESCE(i.n_inter, 0) / sb.n_sh) >= 0.8) AS subset_dup
    FROM cand c
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment per LSH candidate pair — flags
    subset-style duplication (one document quoted or embedded in another)
    that symmetric Jaccard under-scores: C(A,B)=|A∩B|/|A| nears 1 for the
    contained side regardless of the container's size. Same cost model as
    the verified-pairs query: the exact leg touches candidates only, and
    both legs keep shingle text off the wire (non-distinct stream for
    signatures, hashed_shingles' row-local 64-bit keys for the sets)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    raw = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    bands = D.lsh_bands_wide(D.minhash_wide(raw, "doc_id", k=8), "doc_id", k=8, rows_per_band=2)
    # narrow-relation persists (keys and pairs, never text): cand is
    # consumed twice, hsh three times; scoped_persist releases the blocks
    # when the next query starts (caching.py)
    cand = scoped_persist(D.lsh_candidate_pairs(bands, "doc_id"))
    hsh = scoped_persist(D.hashed_shingles(docs, "doc_id", "text", n=3))
    sizes = hsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = hsh.select(F.col("doc_id").alias("id_a"), "shingle_key")
    b = hsh.select(F.col("doc_id").alias("id_b"), "shingle_key")
    inter = (
        cand.join(a, "id_a").join(b, ["id_b", "shingle_key"])
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    ni = F.coalesce("n_inter", F.lit(0))
    ca, cb = ni / F.col("n_a"), ni / F.col("n_b")
    return (
        cand.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
            (F.greatest(ca, cb) >= 0.8).alias("subset_dup"),
        )
    )


@register(
    "dedup_lsh_eval_pr",
    # evaluation harness for the LSH index itself: candidate pairs from
    # the band join (the _BANDS_CTE replay) scored against exact-Jaccard
    # ground truth >= 0.5 from the hashed-shingle inverted index. Both
    # sides reuse the family's existing CTE fragments verbatim.
    oracle=f"""
    WITH {_BANDS_CTE}{_HSH_CTE},
    pred AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b
               ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM hsh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM hsh a JOIN hsh b
                ON a.shingle_key = b.shingle_key AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    truth AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON inter.id_a = sa.doc_id
              JOIN sizes sb ON inter.id_b = sb.doc_id
              WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
    tp AS (SELECT count(*) AS n FROM pred JOIN truth USING (id_a, id_b))
    SELECT CAST((SELECT count(*) FROM pred)  AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT n FROM tp)           AS BIGINT) AS n_true_positives,
           round((SELECT n FROM tp) / (SELECT count(*) FROM pred), 6)  AS precision,
           round((SELECT n FROM tp) / (SELECT count(*) FROM truth), 6) AS recall
    """,
)
def dedup_lsh_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH index against exact-Jaccard
    ground truth (>= 0.5) — the eval every dedup deployment runs before
    trusting its band geometry (here 4 bands x 2 rows: the S-curve says
    ~97% recall at J=0.5). Ground truth comes from the hashed-shingle
    inverted index WITHOUT a max_df cap — completeness is the point of an
    eval; at 100 TB this harness runs on a sampled stratum, not the full
    corpus, while the LSH side scales as usual. All joins on fixed-width
    keys; the three metric counts are 1-row relations cross-joined."""
    docs = load_table(spark, sf_dir, "documents")
    sh_raw = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    # max_bucket=None: the eval measures the band geometry itself, so the
    # degenerate-bucket production guard must not drop candidates here
    # (and the oracle's pred CTE replays the band join uncapped).
    pred = D.lsh_candidate_pairs(
        D.lsh_bands_wide(
            D.minhash_wide(sh_raw, "doc_id", k=8), "doc_id", k=8, rows_per_band=2
        ),
        "doc_id",
        max_bucket=None,
    ).select("id_a", "id_b")

    hsh = D.hashed_shingles(docs, "doc_id", "text", n=3)
    sizes = hsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        hsh.alias("a")
        .join(
            hsh.alias("b"),
            (F.col("a.shingle_key") == F.col("b.shingle_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("_nb"))
    truth = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.col("n_inter") / (F.col("_na") + F.col("_nb") - F.col("n_inter"))
            >= 0.5
        )
        .select("id_a", "id_b")
    )
    tp = pred.join(truth, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_true_positives")
    )
    n_pred = pred.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        n_pred.crossJoin(n_truth)
        .crossJoin(tp)
        .select(
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.col("n_true_positives").cast("bigint").alias("n_true_positives"),
            F.round(
                F.col("n_true_positives") / F.col("n_candidates"), 6
            ).alias("precision"),
            F.round(F.col("n_true_positives") / F.col("n_truth"), 6).alias(
                "recall"
            ),
        )
    )


@register(
    "dedup_keep_best_quality",
    # survivorship POLICY on top of the cluster relation: instead of the
    # min-id canonical, keep each cluster's highest-quality member
    # (longest text, id tiebreak) — the policy a curation run actually
    # wants. Oracle reuses the recursive-CTE component labels.
    oracle=f"""
    WITH RECURSIVE {_BANDS_CTE},
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    ),
    e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    reach(node, lbl) AS (
        SELECT a, a FROM e2
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN e2 e ON e.a = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id
             FROM reach GROUP BY node),
    scored AS (SELECT c.doc_id, c.cluster_id, length(d.text) AS n_len
               FROM comp c JOIN documents d USING (doc_id)),
    best AS (SELECT cluster_id, doc_id AS keep_id FROM (
               SELECT *, row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_len DESC, doc_id) AS rn
               FROM scored) WHERE rn = 1)
    SELECT s.doc_id, s.cluster_id, CAST(s.n_len AS INT) AS n_len,
           (s.doc_id = b.keep_id) AS is_kept
    FROM scored s JOIN best b USING (cluster_id)
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivorship: connected-component clusters
    (same machinery as dedup_clusters) but the canonical member is the
    HIGHEST-QUALITY one (longest text, id tiebreak) instead of min-id —
    what a curation pipeline actually keeps. The quality join and the
    per-cluster argmax both run over the cluster-member relation, never
    the corpus."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", n=3, distinct=False)
    bands = D.lsh_bands_wide(
        D.minhash_wide(sh, "doc_id", k=8), "doc_id", k=8, rows_per_band=2
    )
    pairs = D.lsh_candidate_pairs(bands, "doc_id")
    comp = D.connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    scored = comp.join(
        docs.select("doc_id", F.length("text").alias("n_len")), "doc_id"
    )
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_len"), F.asc("doc_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    best = ranked.filter(F.col("rn") == 1).select(
        "cluster_id", F.col("doc_id").alias("keep_id")
    )
    return (
        scored.join(best, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            F.col("n_len").cast("int").alias("n_len"),
            (F.col("doc_id") == F.col("keep_id")).alias("is_kept"),
        )
    )


@register(
    "dedup_duplicate_spans",
    # DuckDB replays the whole relational re-derivation of the
    # suffix-array method: rolling 8-gram hashes, seeds in >= 2 distinct
    # docs, gaps-and-islands merge to maximal spans
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id, CAST(u.i AS INT) AS pos,
               md5(array_to_string(toks[u.i+1:u.i+8], ' ')) AS h
        FROM t, LATERAL unnest(range(0, greatest(len(toks) - 7, 0))) AS u(i)
    ),
    seeds AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    d AS (SELECT doc_id, pos FROM g JOIN seeds USING (h)),
    i AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d
    )
    SELECT CAST(doc_id AS BIGINT)  AS id,
           CAST(MIN(pos) AS INT)   AS span_start,
           CAST(MAX(pos) + 7 AS INT) AS span_end,
           CAST(MAX(pos) - MIN(pos) + 8 AS INT) AS span_tokens
    FROM i GROUP BY doc_id, grp
    """,
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document EXACT substring dedup — maximal duplicated token
    spans of length >= 8, the training-data dedup of Lee et al. (arXiv
    2107.06499, public), whose reference builds a corpus suffix array.
    Re-derived for a shuffle engine (operators/dedup.py:duplicate_spans):
    rolling-gram hashes JVM-side (document text never crosses an
    exchange — only 16-byte hashes), one corpus-wide groupBy for the
    >=2-distinct-docs seeds, one per-document window for the
    gaps-and-islands merge into maximal spans. Output is every (doc,
    span) pair a removal pass would cut."""
    from ..operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    out = duplicate_spans(docs, k=8, min_docs=2)
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("span_tokens").cast("int").alias("span_tokens"),
    )


@register(
    "dedup_cut_duplicate_spans",
    # the full detect + apply chain replayed in DuckDB: span detection as
    # in dedup_duplicate_spans, then per-token NOT-EXISTS against the
    # covering spans and order-preserving reassembly; md5 of the deduped
    # text keeps the compared values compact
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id, CAST(u.i AS INT) AS pos,
               md5(array_to_string(toks[u.i+1:u.i+8], ' ')) AS h
        FROM t, LATERAL unnest(range(0, greatest(len(toks) - 7, 0))) AS u(i)
    ),
    seeds AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    d AS (SELECT doc_id, pos FROM g JOIN seeds USING (h)),
    i AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d
    ),
    spans AS (
        SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
        FROM i GROUP BY doc_id, grp
    ),
    tok AS (
        SELECT doc_id, CAST(u.i AS INT) AS pos, toks[u.i+1] AS tk
        FROM t, LATERAL unnest(range(0, len(toks))) AS u(i)
    ),
    kept AS (
        SELECT tok.doc_id, pos, tk FROM tok
        WHERE NOT EXISTS (
            SELECT 1 FROM spans sp
            WHERE sp.doc_id = tok.doc_id AND tok.pos BETWEEN sp.s AND sp.e
        )
    )
    SELECT CAST(t.doc_id AS BIGINT) AS id,
           md5(COALESCE(string_agg(k.tk, ' ' ORDER BY k.pos), '')) AS deduped_md5,
           CAST(len(t.toks) AS INT) AS n_tokens,
           CAST(len(t.toks) - COUNT(k.pos) AS INT) AS n_tokens_removed
    FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id
    GROUP BY t.doc_id, t.toks
    """,
)
def dedup_cut_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of exact-substring dedup: detect maximal
    cross-document duplicated spans (operators/dedup.py:duplicate_spans)
    and cut them out of every document (cut_spans) — the hard-cut policy
    of Lee et al.'s training-data dedup, end to end under the oracle
    gate. The splice is pure JVM array arithmetic (filter + exists over
    the indexed token array); document text crosses exactly one id-keyed
    exchange, once, to meet its spans. Every document comes back (rows =
    corpus size) with its deduped-text md5 and removal counts — the
    exact relation a curation pipeline persists."""
    from ..operators.dedup import cut_spans, duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, k=8, min_docs=2)
    out = cut_spans(docs, spans)
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.md5(F.encode("text_deduped", "utf-8")).alias("deduped_md5"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_tokens_removed").cast("int").alias("n_tokens_removed"),
    )
