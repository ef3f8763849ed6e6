"""Corpus-curation operators for LLM training-data pipelines.

Decontamination, within-document repetition detection, TF-IDF term scoring,
greedy sequence packing, and mixture rebalancing — the steps between "raw
crawl" and "training mix" that the reference framework's users would script
as SQL transformers (cf. /root/reference pipeline definitions, e.g.
src/test/resources pipeline SQL), expressed here as first-class operators.

All pure ``pyspark.sql.functions`` column expressions (JVM whole-stage
codegen, no Python UDFs). Shuffle inventory per operator is documented in
its docstring — at 100 TB that inventory IS the cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..caching import scoped_persist

from .text import tokens


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Eval-set decontamination: flag training documents that share any
    word ``n``-gram with an evaluation set.

    The standard pre-training hygiene step (n=8..13 word-gram overlap,
    as in GPT-3/PaLM data papers). Returns one row per train document:
    ``(id, n_shingles, n_hits, contaminated)``.

    Scale design: the eval set is fixed-size (benchmarks, not corpus), so
    its distinct shingle-KEY set is broadcast — and the 100 TB train side
    now never shuffles shingles AT ALL: per-document distinct keys come
    from ``hashed_shingles`` (row-local ``array_distinct`` + 64-bit md5
    prefix — zero shuffles), stream through the broadcast hash join as
    narrow map output, and the only exchange carries ``(id, count)``
    partials for the per-document counts. Keying on the md5 prefix also
    shrinks the broadcast itself ~3-4× vs raw n-gram text. Documents
    shorter than ``n`` tokens have zero shingles and are reported with
    n_shingles = 0.

    Precondition (inherited from hashed_shingles' row-local distinct):
    ``id_col`` is unique per row on BOTH inputs; pre-dedup with
    ``dropDuplicates([id_col])`` if it can repeat.
    """
    from .dedup import hashed_shingles

    eval_sh = (
        hashed_shingles(eval_df, id_col, text_col, n=n)
        .select("shingle_key")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_sh = hashed_shingles(train, id_col, text_col, n=n)
    per_doc = (
        train_sh.join(F.broadcast(eval_sh), "shingle_key", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_hits"),
        )
    )
    base = train.select(id_col)
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Within-document repetition detection: duplicate word-``n``-gram ratio
    and the most-frequent-token share.

    Boilerplate and degenerate generations repeat internally; this is the
    per-document filter (cf. Gopher/MassiveText repetition filters). A
    dup_ngram_ratio near 1 means the document is one phrase looped.

    Entirely map-side (array expressions on each row, zero shuffles): at
    100 TB this runs at scan speed. Ratios rounded to 6 dp for
    cross-engine determinism.
    """
    toks = tokens(F.col(text_col))
    # sequence(1, 0) would generate a DESCENDING [1, 0] in Spark, so short
    # documents must short-circuit to an empty gram list explicitly.
    ngrams = F.expr(
        f"CASE WHEN size(_t) >= {n} THEN "
        f"transform(sequence(1, size(_t) - {n - 1}), "
        f"i -> concat_ws(' ', slice(_t, i, {n}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    from .text import top_token_count

    top_tok_n = top_token_count(F.col("_t"))
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select(
            id_col,
            F.size("_t").cast("int").alias("n_tokens"),
            ngrams.alias("_g"),
            top_tok_n.cast("int").alias("top_token_n"),
        )
        .select(
            id_col,
            "n_tokens",
            F.size("_g").cast("int").alias("n_ngrams"),
            F.size(F.array_distinct("_g")).cast("int").alias("n_distinct_ngrams"),
            F.when(F.size("_g") > 0,
                   F.round(1 - F.size(F.array_distinct("_g")) / F.size("_g"), 6))
            .otherwise(F.lit(0.0)).alias("dup_ngram_ratio"),
            F.round(F.col("top_token_n") / F.col("n_tokens"), 6).alias("top_token_share"),
        )
    )


def _term_counts(df: DataFrame, id_col: str, text_col: str):
    """Shared (doc, term) explode + tf aggregation for the term scorers —
    tfidf_topk and bm25_topk MUST tokenize identically (lower + whitespace,
    empty terms dropped) or their paired oracles diverge."""
    terms = (
        df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    return terms, tf


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tf = in-document term count; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    scikit-learn convention); score = tf·idf rounded to 6 dp, ranked with
    a term tiebreak so the top-k is total-order deterministic.

    Shuffle inventory: one groupBy(id, term) for tf (map-side partial agg
    collapses repeats first), one groupBy(term) for df whose output is
    vocabulary-sized (sublinear in corpus size but unbounded — Heaps'
    law), and the per-document top-k window keyed by id. The idf join is
    deliberately UNHINTED: AQE broadcasts the vocabulary when it fits and
    falls back to a shuffle join when it doesn't, so the plan survives a
    corpus whose vocabulary outgrows executor memory.
    """
    terms, tf = _term_counts(df, id_col, text_col)
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select("term", (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1).alias("idf"))
    )
    scored = tf.join(idf, "term").select(
        id_col, "term", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")
    )
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tfidf", "rn")
    )


def pack_greedy_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    size_col: str = "n_tokens",
    budget: int = 256,
) -> DataFrame:
    """Greedy sequence packing: within each group, lay documents end-to-end
    in id order and cut a new bin every ``budget`` tokens (a document whose
    cumulative start crosses the boundary opens the next bin).

    The batch-construction step of a training pipeline: bins approximate
    fixed-token-budget training sequences. Deterministic (id order, no
    rand) so packing is reproducible across runs/engines.

    One shuffle, on the group key; the running sum is a window over
    (group, id). At 100 TB the group key (source/shard) is chosen so
    each group fits a partition — the same contract a real packer has.
    """
    w = W.partitionBy(group_col).orderBy(id_col)
    cum_before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    return df.select(
        id_col,
        group_col,
        F.col(size_col),
        F.floor(cum_before / budget).cast("int").alias("bin_id"),
        (cum_before % budget).cast("int").alias("bin_offset"),
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_tokens",
    targets: dict[str, float] | None = None,
) -> DataFrame:
    """Training-mixture rebalancing: per group, observed token share vs a
    target share, and the sampling weight (target/observed) that achieves
    the target mix in expectation.

    ``targets`` maps group value → target share; groups not listed split
    the remaining mass equally. Output is group-cardinality-sized (tiny);
    the only shuffle is the per-group aggregation, with map-side partial
    aggregation doing almost all the work — the classic "one small
    result from 100 TB" shape.
    """
    targets = targets or {}
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).alias("n_tokens_grp"),
    )
    tot = agg.select(
        F.sum("n_tokens_grp").alias("_tot"), F.count(F.lit(1)).alias("_ngrp")
    )
    named_mass = sum(targets.values())
    named_n = len(targets)
    target_expr = F.lit(None).cast("double")
    for val, share in targets.items():
        target_expr = F.when(F.col(group_col) == val, F.lit(share)).otherwise(target_expr)
    default_share = (1.0 - named_mass) / F.greatest(F.col("_ngrp") - named_n, F.lit(1))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            F.col("n_tokens_grp").alias("n_tokens"),
            F.round(F.col("n_tokens_grp") / F.col("_tot"), 6).alias("observed_share"),
            F.round(F.coalesce(target_expr, default_share), 6).alias("target_share"),
            F.round(
                F.coalesce(target_expr, default_share)
                / (F.col("n_tokens_grp") / F.col("_tot")),
                6,
            ).alias("sample_weight"),
        )
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Cross-source contamination matrix: for each unordered source pair,
    how many distinct word ``n``-gram shingles appear in BOTH — the
    provenance report a curation pipeline runs before mixing crawls (how
    much of source B's content already lives in source A decides dedup
    priority and mixture accounting). Shingle-level, not digest-level, so
    near-duplicate mass counts, not just byte-identical documents.

    Scale shape: ONE shuffle, and it carries 64-bit keys, not text. The
    corpus collapses to distinct (source, shingle_key) pairs
    (``hashed_shingles``: in-row dedup map-side, then a global distinct
    whose partial aggregation ships only the fixed-width md5-prefix key —
    never documents, never n-gram strings), a single groupBy(key) gathers
    each shingle's sorted source set, and the |set|²/2 pair expansion
    happens map-side with array transforms before a tiny final
    aggregation on |sources|²-bounded keys. A self-equi-join would
    shuffle the same relation twice for identical fan-out (measured ~2×
    slower at sf0.1); per-shingle cost is bounded by |sources|², the
    same quadratic guard argument as the LSH bucket join.
    """
    from .dedup import hashed_shingles

    h = hashed_shingles(
        df, id_col=group_col, text_col=text_col, n=n, row_unique=False
    ).select(F.col(group_col).alias("src"), "shingle_key")
    shared = (
        h.groupBy("shingle_key")
        .agg(F.sort_array(F.collect_set("src")).alias("ss"))
        .filter(F.size("ss") > 1)
    )
    pairs = shared.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) -> "
                "transform(slice(ss, i + 2, size(ss)), "
                "y -> struct(x AS source_a, y AS source_b))))"
            )
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.source_a").alias("source_a"), F.col("p.source_b").alias("source_b")).agg(
        F.count(F.lit(1)).alias("n_shared")
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    test_pct: float = 0.01,
    val_pct: float = 0.01,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 4 hex digits of
    ``md5(salt || ':' || id)`` partition the id space into contiguous
    hash ranges (test lowest, then val, then train). Same engine-agnostic
    keyed-hash machinery as ``stratified_sample`` (shared helpers in
    operators/text.py) -- reproducible across runs, engines and resumes (a
    doc never migrates between splits when the corpus grows), auditable,
    and map-side only: no shuffle, no rand(), no driver coordination.
    Boundary rates >= 1.0 short-circuit (a clamped 'ffff' threshold with
    an exclusive compare would misassign 'ffff'-prefixed ids).
    """
    from .text import hash_key16, hash_threshold_hex

    key16 = hash_key16(id_col, salt)
    # 1e-9 slack: rates that sum to 1.0 in decimal (0.7 + 0.3) land just
    # under 1.0 in binary float, which would miss the keep-all flag and
    # send 'ffff'-key docs to train
    is_test = F.lit(test_pct >= 1.0 - 1e-9) | (key16 < hash_threshold_hex(test_pct))
    is_val = F.lit(test_pct + val_pct >= 1.0 - 1e-9) | (
        key16 < hash_threshold_hex(test_pct + val_pct)
    )
    return df.select(
        id_col,
        *keep_cols,
        F.when(is_test, "test").when(is_val, "val").otherwise("train").alias("split"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` BM25 terms per document — the retrieval-grade sibling of
    :func:`tfidf_topk` (Robertson/Okapi weighting: tf saturates via ``k1``
    and is length-normalized via ``b``).

    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the Lucene non-negative
    form); score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    rounded to 6 dp with a term tiebreak so top-k is total-order
    deterministic.

    Shuffle inventory matches tfidf_topk: tf groupBy(id, term), df
    groupBy(term) (vocabulary-sized), the top-k window on id. avgdl is a
    1-row aggregate broadcast; the idf join is UNHINTED for the same
    Heaps'-law reason as tfidf (AQE broadcasts the vocabulary while it
    fits).

    Corpus size N = countDistinct(id) over the INPUT — the same
    definition tfidf_topk uses, so the two scorers agree on N even when
    empty-text documents exist (avgdl still averages over documents with
    at least one token, which is the standard Okapi denominator).
    """
    terms, tf = _term_counts(df, id_col, text_col)
    dl = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    stats = dl.select(F.avg("dl").alias("_avgdl"))
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.log((F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1).alias("idf"),
        )
    )
    scored = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .join(idf, "term")
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))),
                6,
            ).alias("bm25"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "bm25", "rn")
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
) -> DataFrame:
    """Paragraph-style corpus-wide chunk dedup (the CCNet shape): split
    each document into fixed ``chunk_words``-word chunks, keep only the
    FIRST occurrence of each distinct chunk corpus-wide (ordered by
    ``(doc_id, chunk_idx)``), and reassemble each document from its
    surviving chunks in order. Duplicate chunks WITHIN one document drop
    too (the first-occurrence rule is global). Returns
    ``(id, n_chunks, n_kept, text_clean)`` — ``text_clean`` is ``''``
    when every chunk of a document is boilerplate seen earlier.

    Shuffle inventory — document TEXT crosses exactly ONE exchange:

    1. rank shuffle on the chunk hash: rows are (id, idx, 16-hex-char
       key) — fixed-width, no chunk text;
    2. keep-list shuffle on id: (id, idx) pairs only;
    3. the reassembly join on id: the only exchange that ships text,
       and text has to move once to meet its keep-list anyway. Chunks
       are re-derived map-side from the original document instead of
       shipping per-chunk strings through shuffles 1-2.
    """
    # NULL text must mean 0 chunks, not size(NULL) = -1 → __nc = 0 with a
    # DESCENDING sequence(0, -1) = [0, -1] emitting phantom chunks (the
    # same trap repetition_stats short-circuits); greatest + the explicit
    # empty-sequence guard below close both halves of it.
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n_chunks = F.greatest(
        F.ceil(F.size("__t") / F.lit(float(chunk_words))).cast("int"), F.lit(0)
    )
    base = df.select(id_col, text_col).withColumn("__t", toks).withColumn(
        "__nc", n_chunks
    )

    def _chunk(i):
        return F.array_join(
            F.slice("__t", i * chunk_words + 1, chunk_words), " "
        )

    idx_seq = F.when(
        F.col("__nc") > 0, F.sequence(F.lit(0), F.col("__nc") - 1)
    ).otherwise(F.array().cast("array<int>"))
    narrow = base.select(
        id_col,
        F.explode(idx_seq).alias("idx"),
        "__t",
    ).select(
        id_col,
        "idx",
        F.substring(F.md5(_chunk(F.col("idx"))), 1, 16).alias("__h"),
    )
    w = W.partitionBy("__h").orderBy(id_col, "idx")
    kept = (
        narrow.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "idx")
    )
    keep_lists = kept.groupBy(id_col).agg(
        F.sort_array(F.collect_list("idx")).alias("__keep")
    )
    out = base.join(keep_lists, id_col, "left")
    keep = F.coalesce("__keep", F.array().cast("array<int>"))
    clean = F.array_join(
        F.transform(keep, lambda i: _chunk(i)), " "
    )
    return out.select(
        id_col,
        F.col("__nc").alias("n_chunks"),
        F.size(keep).cast("int").alias("n_kept"),
        clean.alias("text_clean"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Self-perplexity quality scoring with a unigram LM trained on the
    corpus itself (the CCNet/KenLM shape without the external model):
    per document, the mean surprisal in bits of its tokens under the
    corpus-wide MLE unigram distribution p(t) = count(t)/N. Documents of
    common language score low; rare-token garbage scores high — the
    standard LM-based quality axis. No smoothing needed: scoring corpus
    == training corpus, so every token has count ≥ 1.

    Shuffle inventory (the tfidf economics): one groupBy(id, term) for tf
    (map-side partials collapse repeats), one vocabulary-sized
    groupBy(term), one unhinted join on term (AQE sizes it — the
    vocabulary is a Zipf-bounded relation, tiny next to the corpus), one
    final groupBy(id). The corpus total N rides a broadcast 1-row
    aggregate.
    """
    _terms, tf = _term_counts(df, id_col, text_col)
    # tf has three consumers (vocab, total via vocab, and the scoring
    # join): persist the narrow (doc, term, tf) relation so the
    # explode+aggregate lineage runs once, not per branch — scoped, so
    # the next registered-query invocation releases the blocks
    # (same lifecycle as the dedup family's hsh/cand, caching.py).
    tf = scoped_persist(tf)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    # N = total token occurrences — straight off the cached tf (one pass,
    # 1-row result) instead of re-aggregating the vocabulary
    total = tf.agg(F.sum("tf").alias("n_total"))
    scored = (
        tf.join(vocab, "term")
        .join(total)  # 1-row broadcast
        .withColumn("_bits", -F.log2(F.col("cnt") / F.col("n_total")))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(F.col("tf") * F.col("_bits")) / F.sum("tf"), 6
        ).alias("bits_per_token"),
    )


#: Beginning-of-sequence padding for the trigram LM. Contains a space, so
#: it can never collide with a real token (tokenization splits on \s+).
_BOS = "<s> "


def _gram_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shared BOS-padded (doc, w2, w1, w) trigram stream — every trigram
    scorer MUST tokenize and pad identically or the model join keys
    diverge from the paired oracles. One explode, zero windows: the
    per-position contexts come from an indexed ``transform`` over the
    row-local token array (``element_at`` is 1-based; CASE branches
    evaluate lazily, so the out-of-range index is never touched)."""
    t = df.select(
        F.col(id_col),
        F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "").alias("_t"),
    )
    arr = F.col("_t")
    return t.select(
        F.col(id_col),
        F.explode(
            F.transform(
                arr,
                lambda x, i: F.struct(
                    x.alias("w"),
                    F.when(i >= 1, F.element_at(arr, i))
                    .otherwise(F.lit(_BOS))
                    .alias("w1"),
                    F.when(i >= 2, F.element_at(arr, i - 1))
                    .otherwise(F.lit(_BOS))
                    .alias("w2"),
                ),
            )
        ).alias("g"),
    ).select(id_col, "g.w", "g.w1", "g.w2")


def trigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.1, 0.3, 0.6),
) -> DataFrame:
    """Interpolated trigram-LM self-perplexity per document — the CCNet
    quality axis (Wenzek et al., 2020) one model order up from
    :func:`unigram_logprob`: mean surprisal in bits of each token under a
    Jelinek-Mercer-interpolated MLE trigram model trained on the corpus
    itself::

        p(w | w2 w1) = l3*c(w2 w1 w)/c(w2 w1 .) + l2*c(w1 w)/c(w1 .)
                       + l1*c(w)/N

    with ``lambdas = (l1, l2, l3)``. Contexts at document start pad with
    a BOS marker that cannot collide with a whitespace token. Training
    corpus == scoring corpus, so the unigram term keeps every probability
    positive without discounting. Templated/repetitive documents score
    near zero bits; rare-context garbage scores high — a sharper
    separation than the unigram axis because the trigram term sees word
    ORDER, not just the marginal distribution.

    Shuffle economics (the 100 TB story): every model quantity —
    trigram, bigram, unigram, both context totals, N — derives from the
    DISTINCT-trigram relation, so the exploded token stream crosses
    exactly ONE exchange (the ``groupBy(doc, w2, w1, w)`` with map-side
    partials); the model-side reaggregations and joins run over the
    Zipf-bounded distinct-trigram relation, orders of magnitude smaller
    than the corpus. Per-document scoring is one join on the trigram key
    (co-partitioned with the tf relation) plus the final ``groupBy(doc)``.
    In production the model side is trained on a clean sample, pruned to
    top-K per context, and broadcast — the scoring pass then shuffles
    nothing but the doc aggregation.
    """
    l1, l2, l3 = lambdas
    grams = _gram_stream(df, id_col, text_col)
    # two consumers (model pyramid and the scoring join) — persist the
    # narrow fixed-arity tf relation, not the exploded stream
    dtf = scoped_persist(
        grams.groupBy(id_col, "w2", "w1", "w").agg(F.count(F.lit(1)).alias("tf"))
    )
    tri = scoped_persist(
        dtf.groupBy("w2", "w1", "w").agg(F.sum("tf").alias("c3"))
    )
    ctx2 = tri.groupBy("w2", "w1").agg(F.sum("c3").alias("cc2"))
    big = tri.groupBy("w1", "w").agg(F.sum("c3").alias("c2"))
    ctx1 = tri.groupBy("w1").agg(F.sum("c3").alias("cc1"))
    uni = tri.groupBy("w").agg(F.sum("c3").alias("c1"))
    total = tri.agg(F.sum("c3").alias("n_total"))
    # operand order mirrors the oracle SQL exactly — bit-identical doubles
    # keep the round-6 hash compare honest
    model = (
        tri.join(ctx2, ["w2", "w1"])
        .join(big, ["w1", "w"])
        .join(ctx1, "w1")
        .join(uni, "w")
        .join(total)  # 1-row broadcast
        .select(
            "w2",
            "w1",
            "w",
            (
                -F.log2(
                    F.lit(l3) * (F.col("c3") / F.col("cc2"))
                    + F.lit(l2) * (F.col("c2") / F.col("cc1"))
                    + F.lit(l1) * (F.col("c1") / F.col("n_total"))
                )
            ).alias("_bits"),
        )
    )
    return (
        dtf.join(model, ["w2", "w1", "w"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.col("_bits")) / F.sum("tf"), 6
            ).alias("bits_per_token"),
        )
    )


def trigram_logprob_heldout(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 4,
    lambdas: tuple[float, float, float] = (0.1, 0.3, 0.6),
) -> DataFrame:
    """The PRODUCTION serving shape of :func:`trigram_logprob` — the
    CCNet deployment: the LM is trained on a clean reference corpus,
    PRUNED to the top-``topk`` continuations per context (count desc,
    word asc — fully deterministic), and BROADCAST to score a disjoint
    held-out corpus map-side. Pruned-away and unseen n-gram terms
    contribute zero mass (the stupid-backoff serving approximation);
    the probability floor ``l1 * 0.5 / N`` (half a unigram count) keeps
    the surprisal finite for fully-novel tokens, deterministically.
    Output per held-out doc: token count, bits/token, and ``n_oov``
    (tokens absent from the training vocabulary) for observability.

    Why this is the 100 TB path: the full-model variant's scoring join
    shuffles on the trigram key — correct, but at serving time the
    model side is static while ingest batches stream through. Pruning
    bounds the model at O(contexts x topk) rows, small enough to
    broadcast, so the scoring pass is ONE exchange total (the held-out
    token stream's own tf aggregation); the three model lookups are
    map-side broadcast-hash probes and the finale is the per-doc
    aggregation. Nothing about the held-out corpus's size changes the
    model side.
    """
    l1, l2, l3 = lambdas
    tr = scoped_persist(
        _gram_stream(train, id_col, text_col)
        .groupBy("w2", "w1", "w")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    w_tri = W.partitionBy("w2", "w1").orderBy(F.desc("c3"), F.asc("w"))
    tri_p = (
        tr.join(
            tr.groupBy("w2", "w1").agg(F.sum("c3").alias("cc2")), ["w2", "w1"]
        )
        .withColumn("_rn", F.row_number().over(w_tri))
        .filter(F.col("_rn") <= topk)
        .select("w2", "w1", "w", (F.col("c3") / F.col("cc2")).alias("p3"))
    )
    big = tr.groupBy("w1", "w").agg(F.sum("c3").alias("c2"))
    w_big = W.partitionBy("w1").orderBy(F.desc("c2"), F.asc("w"))
    big_p = (
        big.join(tr.groupBy("w1").agg(F.sum("c3").alias("cc1")), "w1")
        .withColumn("_rn", F.row_number().over(w_big))
        .filter(F.col("_rn") <= topk)
        .select("w1", "w", (F.col("c2") / F.col("cc1")).alias("p2"))
    )
    uni = tr.groupBy("w").agg(F.sum("c3").alias("c1"))
    n_total = tr.agg(F.sum("c3").alias("n_total"))
    stf = (
        _gram_stream(score, id_col, text_col)
        .groupBy(id_col, "w2", "w1", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        stf.join(F.broadcast(tri_p), ["w2", "w1", "w"], "left")
        .join(F.broadcast(big_p), ["w1", "w"], "left")
        .join(F.broadcast(uni), "w", "left")
        .join(F.broadcast(n_total))
        .withColumn(
            "_p",
            F.greatest(
                F.lit(l3) * F.coalesce(F.col("p3"), F.lit(0.0))
                + F.lit(l2) * F.coalesce(F.col("p2"), F.lit(0.0))
                + F.lit(l1)
                * (F.coalesce(F.col("c1"), F.lit(0)) / F.col("n_total")),
                F.lit(l1) * (F.lit(0.5) / F.col("n_total")),
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(F.sum(F.col("tf") * (-F.log2("_p"))) / F.sum("tf"), 6).alias(
            "bits_per_token"
        ),
        F.sum(F.when(F.col("c1").isNull(), F.col("tf")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_oov"),
    )


def ngram_novelty(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    shingles whose FIRST corpus occurrence (minimum document id — the
    ingestion-order proxy) is this document. The curve a curation run
    watches for memorization risk and crawl staleness: a tail of
    near-zero-novelty documents is re-crawled or templated content that
    adds tokens but no information.

    Built on dedup.hashed_shingles, so the two aggregation shuffles carry
    fixed-width 64-bit keys, never shingle text; documents shorter than
    ``n`` tokens have no shingles and drop out (their novelty is
    undefined). Reference context: the reference's dedup surface stops at
    duplicate detection (SURVEY.md §2); the novelty curve is this port's
    curation extension, same family as decontaminate/source_overlap.
    """
    from .dedup import hashed_shingles

    keys = hashed_shingles(df, id_col, text_col, n=n)
    first = keys.groupBy("shingle_key").agg(F.min(id_col).alias("__first"))
    per = (
        keys.join(first, "shingle_key")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("__first") == F.col(id_col)).cast("int"))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per.select(
        id_col,
        "n_shingles",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty_ratio"),
    )


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom pre-filter on the train side —
    the shape for when the eval suite's shingle set is itself large: the
    occupied-position relation (operators/joinopt.py) is ≤ m rows
    REGARDLESS of eval size, so the map-side probes drop almost every
    non-matching train shingle before the exact membership join, which
    then touches candidates only. Row-identical to the plain operator
    (false positives re-checked, false negatives impossible) — the same
    oracle gates both. n_shingles counts ALL of a document's shingles
    (sized before the prefilter); only the hit counting rides the
    filtered stream.
    """
    from .dedup import hashed_shingles
    from .joinopt import bloom_positions, bloom_prefilter

    eval_keys = (
        hashed_shingles(eval_df, id_col, text_col, n=n)
        .select("shingle_key")
        .distinct()
    )
    pos = bloom_positions(eval_keys, "shingle_key", m_bits=m_bits, k=k)
    train_sh = hashed_shingles(train, id_col, text_col, n=n)
    sizes = train_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    cand = bloom_prefilter(train_sh, pos, "shingle_key", m_bits=m_bits, k=k)
    hits = (
        cand.join(F.broadcast(eval_keys), "shingle_key")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(sizes, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
