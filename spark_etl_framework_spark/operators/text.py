"""Text-analysis operators for large-scale corpus processing.

All pure ``pyspark.sql.functions`` column expressions (JVM-side, whole-stage
codegen) — no Python UDFs anywhere on this path, so throughput scales with
executor count, not Python serde. Designed for a documents table of shape
``(doc_id, text, ...)`` at 100 TB: every operator is a narrow map (zero
shuffles) except where a groupBy is semantically required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import scoped_localcheckpoint

#: Tiny per-language function-word lexicons for the n-gram/stopword language
#: heuristic. Deliberately small: language ID at corpus scale is a broadcast
#: lookup against a lexicon, not a model inference.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "data"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "auf", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en", "por", "para"),
}

#: English stopwords for the quality-score ratio.
EN_STOPWORDS = LANG_LEXICONS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(text), r"\s+")


def top_token_count(toks: Column) -> Column:
    """Count of the most frequent token in an in-row token array — the
    shared numerator of every repetition heuristic (repetition_stats'
    top_token_share, with_quality_rules' rule_repetition). Row-local,
    O(distinct × n) per row — fine for natural documents whose distinct
    count saturates; a pathological all-distinct book-length row costs
    n², which is the row's own size, not a corpus blow-up."""
    return F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, characters, alpha chars, a BPE-ish
    subword estimate (chars/4 — the classic tokens≈bytes/4 heuristic), and
    mean token length."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    return df.select(
        "*",
        n_tok.cast("int").alias("n_tokens"),
        F.length(text_col).cast("int").alias("n_chars_obs"),
        alpha.cast("int").alias("n_alpha"),
        F.ceil(F.length(text_col) / 4).cast("int").alias("est_bpe_tokens"),
        F.round(
            (F.length(text_col) - n_tok + 1) / n_tok,  # chars excl. single spaces / tokens
            4,
        ).alias("mean_token_len"),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality score in [0,1]:
    0.4·min(1, n_tokens/100) + 0.3·stopword_ratio·3 (capped 1) + 0.3·alpha_ratio.
    Length rewards substance, stopword ratio rewards natural-language-ness,
    alpha ratio penalizes markup/garbage."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    alpha_ratio = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")) / F.greatest(
        F.length(text_col), F.lit(1)
    )
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    stop_score = F.least(F.lit(1.0), (n_stop / F.greatest(n_tok, F.lit(1))) * 3)
    return df.select(
        "*",
        n_stop.cast("int").alias("n_stopwords"),
        F.round(0.4 * len_score + 0.3 * stop_score + 0.3 * alpha_ratio, 6).alias(
            "quality_score"
        ),
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lexicon-hit language ID: per language, count tokens in its function-word
    list; predict the argmax (ties broken alphabetically, 'und' = undetermined
    when nothing hits). Pure column expressions — a narrow map."""
    toks = tokens(F.col(text_col))

    def _contains(arr):
        # NB: F.filter dispatches on lambda arity — a 2-arg lambda would be
        # treated as (element, index), so bind the lexicon via closure.
        return lambda t: F.array_contains(arr, t)

    hit_cols = []
    for lang, words in sorted(LANG_LEXICONS.items()):
        arr = F.array([F.lit(w) for w in words])
        hit_cols.append(
            F.size(F.filter(toks, _contains(arr))).cast("int").alias(f"hits_{lang}")
        )
    out = df.select("*", *hit_cols)
    langs = sorted(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    # reverse order so the earliest alphabetical language wins ties
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return out.select("*", pred.alias("pred_lang"), best.alias("best_hits"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 over the whitespace-normalized,
    lowercased text. The canonical exact-dedup key — hashing normalized
    content instead of grouping on multi-KB strings keeps the shuffle rows
    small at corpus scale."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select("*", F.md5(normalized).alias("fingerprint"))


def chunk_token_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 16,
    stride: int = 12,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the training-sequence packing step of an LLM data pipeline
    (``size`` tokens per chunk, new chunk every ``stride``, so consecutive
    chunks overlap by ``size - stride``).

    Entirely map-side: ``sequence`` generates the chunk starts,
    ``transform`` + ``slice`` cut each window, one explode emits the
    chunks. No shuffle at all — at 100 TB this runs at scan speed and
    parallelizes per input split. The final (shorter) tail window is
    kept: real packing pipelines pad or drop it downstream.
    """
    chunk_expr = F.expr(
        f"transform(sequence(0, greatest(size(_t) - 1, 0), {stride}), "
        f"s -> struct(CAST(s div {stride} AS INT) AS chunk_id, "
        f"CAST(least({size}, size(_t) - s) AS INT) AS n_tokens, "
        f"array_join(slice(_t, s + 1, {size}), ' ') AS chunk_text))"
    )
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
        .filter(F.size("_t") > 0)
        .select(id_col, F.explode(chunk_expr).alias("c"))
        .select(id_col, "c.chunk_id", "c.n_tokens", "c.chunk_text")
    )


def hash_key16(id_col: str, salt: str):
    """First 4 hex digits of ``md5(salt || ':' || id)`` — the shared
    keyed-hash used for deterministic sampling and split assignment
    (fixed-width lowercase hex compares like the 16-bit integer it
    encodes, in any engine)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 4
    )


def hash_threshold_hex(rate: float) -> str:
    """4-hex-char threshold for a [0, 1] rate, clamped so rate ≥ 1.0 maps
    to 'ffff' (an unclamped ``int(1.0*65536)`` formats as the 5-char
    '10000', which compares LESS than any 4-char key). Callers must pair
    a clamped threshold with an explicit keep-all test for rates ≥ 1.0 —
    'ffff'-prefixed keys sit ON the clamped boundary."""
    return f"{min(max(int(rate * 65536), 0), 65535):04x}"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    id_col: str = "doc_id",
    salt: str = "s",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the first 4 hex
    digits of ``md5(salt || ':' || id)`` fall under the stratum's
    threshold (fixed-width lowercase hex compares like the 16-bit integer
    it encodes, in any engine). Engine-agnostic (md5 is identical
    everywhere, unlike ``rand()`` or Spark's ``sample``), reproducible
    across runs and resumes, and map-side only — no shuffle, no driver
    coordination. This is how a corpus pipeline downsamples
    over-represented strata (e.g. English) while keeping selection
    auditable.

    A rate ≥ 1.0 means keep-all via an explicit flag (see
    ``hash_threshold_hex`` for why the clamped threshold alone is not
    enough).
    """
    key16 = hash_key16(id_col, salt)
    thresh = F.lit(hash_threshold_hex(default_rate))
    keep_all = F.lit(default_rate >= 1.0)
    for value, rate in rates.items():
        is_stratum = F.col(strata_col) == value
        thresh = F.when(is_stratum, hash_threshold_hex(rate)).otherwise(thresh)
        keep_all = F.when(is_stratum, F.lit(rate >= 1.0)).otherwise(keep_all)
    return df.filter(keep_all | (key16 < thresh))


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-token estimate via a K-Minimum-Values sketch,
    next to the exact count and relative error — the sketch-calibration
    report.

    KMV: hash every distinct token to (0,1]; if the k-th smallest hash is
    h_k, the distinct count is ≈ (k-1)/h_k (uniform order statistics).
    Unlike HyperLogLog implementations (whose registers differ by engine),
    md5-based KMV is DETERMINISTIC and engine-agnostic, so the estimate
    itself is oracle-checkable; the exact leg here is the calibration
    baseline you run at small scale before trusting the sketch alone at
    full scale. The k-min itself is computed as a two-stage tournament
    (k smallest per 32 deterministic sub-buckets in parallel, then a
    ≤ 32k-row merge per group), so no task ever sorts a group's full
    distinct-hash set — the skew-safe way to take an exact k-min of a
    huge group. The k surviving values are the sketch; sketches of
    disjoint corpora merge by keeping the k smallest of their union.

    The distinct happens AFTER hashing, on (group, full-md5) — a fixed
    32-hex-char key on the wire instead of token text, and distinct-md5
    count IS distinct-token count for any physically reachable cardinality
    (128-bit birthday collisions need ~2^64 distinct tokens; a 32-BIT
    prefix would already undercount ~12% at 1e9 distinct tokens, which is
    why the distinct uses the full digest and only the FRACTION comes from
    the first 8 hex chars). md5 is bit-for-bit mirrored in DuckDB, so the
    exact leg stays a true baseline on both engines.
    """
    hashed = (
        df.select(F.col(group_col).alias("grp"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .select("grp", F.md5("tok").alias("hk"))
        .distinct()
        .select(
            "grp",
            (F.conv(F.substring(F.col("hk"), 1, 8), 16, 10).cast("double") / F.lit(float(16**8)))
            .alias("h"),
        )
    )
    from pyspark.sql import Window as W

    # two-stage (tournament) exact k-min so no single task ever sorts a
    # whole group's hash set: stage 1 takes the k smallest within each of
    # 32 deterministic sub-buckets in parallel, stage 2 merges ≤ 32k
    # candidates per group. The k-min RESULT is identical to a direct
    # per-group sort, so the SQL oracle stays a plain window.
    bucketed = hashed.withColumn("b", F.pmod(F.xxhash64("h"), F.lit(32)))
    w1 = W.partitionBy("grp", "b").orderBy("h")
    cand = (
        bucketed.withColumn("rn", F.row_number().over(w1)).filter(F.col("rn") <= k)
    )
    w = W.partitionBy("grp").orderBy("h")
    kth = (
        cand.withColumn("rn2", F.row_number().over(w))
        .filter(F.col("rn2") <= k)
        .groupBy("grp")
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("n_in_sketch"))
    )
    exact = hashed.groupBy("grp").agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = F.when(
        F.col("n_in_sketch") < k, F.col("exact_distinct").cast("double")
    ).otherwise((k - 1) / F.col("h_k"))
    return (
        kth.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.round(est, 2).alias("est_distinct"),
            "exact_distinct",
            F.round(F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6)
            .alias("rel_error"),
        )
    )


def with_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 10_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_ratio: float = 0.6,
    min_stopword_hits: int = 2,
    max_top_token_share: float = 0.25,
) -> DataFrame:
    """Gopher/C4-style quality RULE SET: one boolean per rule plus the
    overall verdict, so a curation pipeline can both filter
    (``passes_all``) and report per-rule rejection rates (the audit the
    per-rule columns exist for — a single opaque score can't tell you
    WHICH rule is eating your corpus).

    Rules (all row-local array/length expressions — zero shuffles, scan
    speed; thresholds are the Gopher defaults adapted to whitespace
    tokenization):

    - ``rule_min_tokens`` / ``rule_max_tokens``: length bounds;
    - ``rule_word_len``: mean token length within [min, max] (garbage and
      minified blobs fail low/high);
    - ``rule_alpha``: alphabetic-character ratio ≥ threshold (markup);
    - ``rule_stopwords``: ≥ N function-word hits (natural-language test);
    - ``rule_repetition``: most-frequent-token share ≤ threshold (looped
      boilerplate; the n-gram version is repetition_stats).
    """
    toks = tokens(F.col(text_col))
    out = df.withColumn("_t", toks)
    n_tok = F.size("_t")
    sum_len = F.aggregate("_t", F.lit(0), lambda acc, t: acc + F.length(t))
    mean_len = sum_len / F.greatest(n_tok, F.lit(1))
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")
    ) / F.greatest(F.length(text_col), F.lit(1))
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(F.col("_t"), lambda t: F.array_contains(sw, t)))
    top_share = top_token_count(F.col("_t")) / F.greatest(n_tok, F.lit(1))

    rules = {
        "rule_min_tokens": n_tok >= min_tokens,
        "rule_max_tokens": n_tok <= max_tokens,
        "rule_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "rule_alpha": alpha_ratio >= min_alpha_ratio,
        "rule_stopwords": n_stop >= min_stopword_hits,
        "rule_repetition": top_share <= max_top_token_share,
    }
    cols = [F.coalesce(c, F.lit(False)).alias(name) for name, c in rules.items()]
    out = out.select(*df.columns, *cols)
    n_failed = sum(
        F.when(~F.col(name), 1).otherwise(0) for name in rules
    )
    return out.withColumn("n_rules_failed", n_failed.cast("int")).withColumn(
        "passes_all", F.col("n_rules_failed") == 0
    )


def countmin_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width_hex: int = 3,
) -> DataFrame:
    """Count-Min sketch of the corpus token-frequency distribution: a
    ``depth × 16^width_hex`` counter table (Cormode & Muthukrishnan 2005),
    the fixed-size summary you keep when the token vocabulary itself is
    too large to materialize per-pipeline-stage.

    Row r uses hash_r(tok) = first ``width_hex`` hex chars of
    md5("r:" || tok) — 16^width_hex buckets per row with no integer
    conversion, so the construction is bit-identical in DuckDB and the
    sketch itself (not just a derived answer) is oracle-checkable.
    point_estimate(tok) = min over rows of counter[r][hash_r(tok)], which
    never undercounts and overshoots by ≤ e/width · N total tokens with
    probability ≥ 1 − e^−depth.

    Scale story (the reason this exists next to the exact groupBy):
    the exact token-frequency relation is vocabulary-sized — at 100 TB
    that is billions of rows you must shuffle, store, and join. The
    sketch's aggregation state is capped at depth × width counters PER
    TASK regardless of corpus size, partial aggregation collapses each
    task's stream before the exchange, and the post-shuffle relation
    (≤ depth·width rows) broadcasts anywhere it is consumed. Sketches of
    disjoint corpus shards merge by elementwise +, so it composes with
    incremental ingestion. Reference context: the reference's
    aggregation surface is exact-only (SURVEY.md §2.C); this is part of
    the §7 North-star sketch extension surface alongside KMV and HLL.

    Returns (seed int, bucket string, cnt bigint).
    """
    toks = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    buckets = F.array(
        *[
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), F.col("tok"))), 1, width_hex)
            for r in range(depth)
        ]
    )
    return (
        toks.select(F.posexplode(buckets).alias("seed", "bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    df: DataFrame,
    sketch: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width_hex: int = 3,
) -> DataFrame:
    """Point-estimate each token in ``df`` against a :func:`countmin_sketch`:
    min over rows of the counter the token hashes into. The sketch relation
    is ≤ depth × 16^width_hex rows by construction, so it is explicitly
    broadcast — the probe side stays unshuffled however large it is."""
    from pyspark.sql.functions import broadcast

    probes = df.select(
        *df.columns,
        F.posexplode(
            F.array(
                *[
                    F.substring(
                        F.md5(F.concat(F.lit(f"{r}:"), F.col(token_col))), 1, width_hex
                    )
                    for r in range(depth)
                ]
            )
        ).alias("seed", "bucket"),
    )
    return (
        probes.join(broadcast(sketch), ["seed", "bucket"])
        .groupBy(*df.columns)
        .agg(F.min("cnt").alias("est_count"))
    )


def heavy_hitters_mg(
    df: DataFrame,
    text_col: str = "text",
    capacity: int = 80,
    t: int = 40,
) -> DataFrame:
    """Frequent tokens via Misra-Gries summaries + exact recount.

    The 100 TB alternative to ``groupBy(token)`` over the full explode:
    each partition maintains a bounded ``capacity``-counter Misra-Gries
    summary (mergeable-summaries batch form: absorb a batch's value_counts,
    then subtract the (capacity+1)-th largest counter from all and drop
    non-positives). Per-partition undercount is ≤ n_p/(capacity+1), so any
    token with global frequency > n/(capacity+1) survives in at least one
    partition summary — with ``capacity ≥ t`` the candidate union provably
    contains every token above the ``n/t`` report threshold. Candidates
    (≤ partitions × (capacity + 1) rows, each partition adding one
    sentinel row carrying its token mass) broadcast into an INNER-join
    prefilter that simultaneously attaches the corpus total, and only
    candidates are exactly recounted — the full token relation never
    shuffles and the source is tokenized exactly twice (candidate pass +
    recount). Results are exact and deterministic (the sketch only gates
    candidacy; counts come from the recount), so a plain GROUP BY/HAVING
    oracle pins them.

    Reference context: frequency profiling in the reference rides its SQL
    aggregation (etl/transform/SqlTransformer.scala); the bounded-state
    sketch path is this port's scale extension, same family as
    countmin_sketch above.
    """
    if capacity < t:
        raise ValueError("heavy_hitters_mg: capacity must be >= t")
    import pandas as pd

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).filter(
        F.col("tok") != ""
    )

    def _mg(batches):
        counters: dict[str, int] = {}
        part_tokens = 0
        for pdf in batches:
            part_tokens += len(pdf)
            for tok, cnt in pdf["tok"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - cut for k, v in counters.items() if v - cut > 0
                }
        # candidate rows + ONE sentinel row carrying this partition's token
        # mass — the total comes out of the same pass, so the source is
        # tokenized twice (candidates + recount), never a third time, and
        # the mass counts exactly the exploded stream the recount sees
        # (NULL/short texts contribute nothing on either side).
        yield pd.DataFrame(
            {
                "tok": list(counters) + [None],
                "part_tokens": [None] * len(counters) + [part_tokens],
            }
        )

    mg_out = toks.mapInPandas(_mg, "tok string, part_tokens bigint")
    # ONE linear plan over a single MG pass: the corpus-wide token mass is
    # a global window sum over the tiny candidate relation (≤ partitions ×
    # (capacity+1) rows shuffled to one reducer), attached to every
    # candidate row; the broadcast INNER join then both prefilters the
    # recount and carries total_tokens — no second branch off mg_out, so
    # the expensive candidate pass runs exactly once.
    from pyspark.sql import Window as _W

    cand = (
        mg_out.select(
            "tok",
            F.sum("part_tokens").over(_W.partitionBy()).cast("bigint").alias(
                "total_tokens"
            ),
        )
        .filter(F.col("tok").isNotNull())
        .dropDuplicates(["tok"])
        .hint("broadcast")
    )
    exact = (
        toks.join(cand, "tok")
        .groupBy("tok", "total_tokens")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
    return (
        exact.filter(F.col("n_occurrences") * t > F.col("total_tokens"))
        .select(
            "tok",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("total_tokens"), 6).alias(
                "frequency"
            ),
        )
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
    with_vocab: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Byte-pair-encoding merge training — the tokenizer-building step of
    an LLM data pipeline, unrolled for a fixed number of merge rounds.

    Classic BPE trains on the WORD-FREQUENCY table, not the corpus: the
    first aggregation collapses the corpus to (word, freq) — vocab-sized
    — and every round after that touches only that narrow relation.
    Words are represented as ``||``-fenced symbol strings
    (``||a||b||c||``): each gap carries two pipes, so the merge of pair
    (l, r) is the plain string rewrite ``|l||r| → |lr|`` — leftmost,
    non-overlapping, exactly BPE's left-to-right merge order, and
    identical in any engine's ``replace``. Literal ``|`` characters in
    tokens are escaped to ``\x1a`` before fencing (and unescaped in the
    returned merge table) so they cannot collide with the fence; tokens
    containing ``\x1a`` itself are outside the contract. A round whose
    pair relation is empty (``rounds`` exceeds the corpus's possible
    merges) leaves the state unchanged and contributes no merge row —
    the returned table is simply shorter than requested. Per round: adjacent-pair
    counts (one narrow keyed aggregation, freq-weighted), a 1-row argmax
    (count DESC, pair ASC tiebreak) broadcast back, and the map-side
    rewrite. Returns (round, left, right, pair_count) — the learned
    merge table; with ``with_vocab=True`` returns (merges, vocab) where
    vocab is the fully-merged word table (w, n_symbols) the encoder
    joins against.

    Each round's state and argmax are materialized with eager
    ``localCheckpoint`` (the connected_components pattern,
    operators/dedup.py): a round's state plan embeds the previous state
    TWICE (once via the pair counts under the argmax, once directly
    under the rewrite), so without truncation the lineage — and the
    number of corpus scans at execution — doubles per round (measured 7
    scans of the documents table for 3 rounds, 2^rounds - 1 generally).
    With it, the corpus is scanned exactly once (the initial word-freq
    collapse) and every later round touches only the checkpointed
    vocab-sized state. The checkpoints hold vocab-sized/1-row relations
    — the 100 TB corpus is never cached.
    """
    if rounds < 1:
        raise ValueError("bpe_train_merges: rounds must be >= 1")
    toks = F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
    words = (
        df.select(toks)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # ||-fenced char representation over the pipe-escaped word:
    # '(.)' -> '$1||', then lead fence
    esc = F.replace(F.col("w"), F.lit("|"), F.lit("\x1a"))
    rep = F.concat(
        F.lit("||"), F.regexp_replace(esc, "(.)", "$1||")
    ).alias("r")
    # the ONE corpus scan: collapse to the vocab-sized word-frequency
    # table and checkpoint it, so round 1's two consumers (pair counts
    # and the rewrite) read the materialized collapse, not the corpus
    state = scoped_localcheckpoint(words.select("w", rep, "freq"))
    merges = None
    for rnd in range(1, rounds + 1):
        syms = F.expr("slice(split(r, '\\\\|\\\\|'), 2, size(split(r, '\\\\|\\\\|')) - 2)")
        pairs = (
            state.select("freq", syms.alias("s"))
            .filter(F.size("s") >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(s, 1, size(s) - 1)").alias("l"),
                        F.expr("slice(s, 2, size(s) - 1)").alias("r2"),
                    )
                ).alias("z"),
            )
            .select(F.col("z.l").alias("l"), F.col("z.r2").alias("r2"), "freq")
        )
        counts = pairs.groupBy("l", "r2").agg(F.sum("freq").alias("cnt"))
        # eager checkpoint: 1-row relation, consumed by BOTH the merge
        # table and the rewrite broadcast — and the truncation point that
        # stops the per-round lineage doubling (see docstring)
        best = (
            counts.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r2"))
            .limit(1)
            .select(
                F.lit(rnd).cast("int").alias("round"),
                F.col("l").alias("left"),
                F.col("r2").alias("right"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        best = scoped_localcheckpoint(best)
        unesc = lambda c: F.replace(F.col(c), F.lit("\x1a"), F.lit("|"))
        out_row = best.select(
            "round",
            unesc("left").alias("left"),
            unesc("right").alias("right"),
            "pair_count",
        )
        merges = out_row if merges is None else merges.unionByName(out_row)
        # LEFT join on TRUE instead of crossJoin: an empty argmax (no
        # pairs left) must leave the state UNCHANGED, not annihilate it
        b = F.broadcast(
            best.select(F.col("left").alias("__l"), F.col("right").alias("__r"))
        )
        state = state.join(b, F.lit(True), "left").select(
            "w",
            F.when(F.col("__l").isNull(), F.col("r"))
            .otherwise(
                F.replace(
                    F.col("r"),
                    F.concat(
                        F.lit("|"), "__l", F.lit("||"), "__r", F.lit("|")
                    ),
                    F.concat(F.lit("|"), "__l", "__r", F.lit("|")),
                )
            )
            .alias("r"),
            "freq",
        )
        state = scoped_localcheckpoint(state)
    if with_vocab:
        n_sym = (F.size(F.split("r", r"\|\|")) - 2).cast("int")
        return merges, state.select("w", n_sym.alias("n_symbols"))
    return merges
