"""Unit tests for the corpus-curation operators (operators/corpus.py)."""

from pyspark.sql import functions as F

from spark_etl_framework_spark.operators import corpus as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlap(spark):
    eval_df = _docs(spark, [(0, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon other tail"),  # shares a 5-gram
            (2, "totally different words here no overlap at all"),
            (3, "tiny"),  # < 5 tokens → zero shingles
        ],
    )
    out = {r["doc_id"]: r for r in C.decontaminate(train, eval_df, n=5).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["n_shingles"] == 0 and not out[3]["contaminated"]


def test_repetition_stats_detects_looped_text(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),  # one token looped
            (2, "all words here are completely distinct tokens"),
            (3, "ab"),  # shorter than the gram size
        ],
    )
    out = {r["doc_id"]: r for r in C.repetition_stats(df, n=3).collect()}
    assert out[1]["dup_ngram_ratio"] > 0.7 and out[1]["top_token_share"] == 1.0
    assert out[2]["dup_ngram_ratio"] == 0.0
    assert out[3]["n_ngrams"] == 0 and out[3]["dup_ngram_ratio"] == 0.0


def test_tfidf_rare_term_outranks_common(spark):
    df = _docs(
        spark,
        [
            (1, "common zebra words"),
            (2, "common filler words"),
            (3, "common more filler"),
        ],
    )
    out = C.tfidf_topk(df, k=1).collect()
    top1 = {r["doc_id"]: r["term"] for r in out}
    # 'zebra' appears once in one doc; 'common' is corpus-wide → zebra wins doc 1
    assert top1[1] == "zebra"


def test_pack_greedy_bins_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "s", 100), (2, "s", 100), (3, "s", 100), (4, "s", 100)],
        "doc_id long, source string, n_tokens int",
    )
    out = {r["doc_id"]: r for r in C.pack_greedy_bins(df, budget=256).collect()}
    # cumulative starts: 0, 100, 200, 300 → bins 0,0,0,1
    assert [out[i]["bin_id"] for i in (1, 2, 3, 4)] == [0, 0, 0, 1]
    assert out[4]["bin_offset"] == 300 % 256


def test_mixture_weights_hit_targets(spark):
    df = spark.createDataFrame(
        [("en", 300), ("en", 300), ("de", 200), ("fr", 200)],
        "lang string, n_tokens int",
    )
    out = {r["lang"]: r for r in C.mixture_weights(df, targets={"en": 0.4}).collect()}
    assert abs(out["en"]["observed_share"] - 0.6) < 1e-9
    assert out["en"]["target_share"] == 0.4
    assert out["de"]["target_share"] == 0.3  # (1-0.4)/2 remaining groups
    # weight * observed == target
    assert abs(out["en"]["sample_weight"] * 0.6 - 0.4) < 1e-4
    total_expected = sum(
        r["sample_weight"] * r["observed_share"] for r in out.values()
    )
    assert abs(total_expected - 1.0) < 1e-3


def test_source_overlap_counts_shared_shingles(spark):
    """Two sources sharing one 3-gram region count its distinct shingles
    once each (set semantics, not occurrence counts); disjoint sources
    produce no row."""
    df = spark.createDataFrame(
        [
            (1, "srcA", "a b c d"),          # shingles: "a b c", "b c d"
            (2, "srcB", "a b c d"),          # same two
            (3, "srcB", "a b c x"),          # adds "a b c" (dup within B), "b c x"
            (4, "srcC", "p q r s"),          # disjoint
        ],
        ["doc_id", "source", "text"],
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in C.source_overlap(df, n=3).collect()
    }
    assert got == {("srcA", "srcB"): 2}  # "a b c" and "b c d"; C shares nothing


def test_split_assign_deterministic_partition(spark):
    """Every doc gets exactly one split, assignment is stable across calls,
    and growing the corpus never migrates an existing doc's split."""
    df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    s1 = {r["doc_id"]: r["split"] for r in C.split_assign(df, test_pct=0.05, val_pct=0.05).collect()}
    s2 = {r["doc_id"]: r["split"] for r in C.split_assign(df, test_pct=0.05, val_pct=0.05).collect()}
    assert s1 == s2
    from collections import Counter

    c = Counter(s1.values())
    # 5%/5% nominal on 2000 docs — generous bounds, zero flake risk
    assert 50 <= c["test"] <= 160 and 50 <= c["val"] <= 160
    assert c["train"] == 2000 - c["test"] - c["val"]
    half = {r["doc_id"]: r["split"] for r in C.split_assign(
        df.filter(F.col("doc_id") < 1000), test_pct=0.05, val_pct=0.05).collect()}
    assert all(s1[d] == s for d, s in half.items())  # no migration on growth
    # boundary rates: 100% test must capture EVERY doc (incl. 'ffff'-prefix
    # hash keys that sit on the clamped threshold), same for test+val=1.0
    all_test = C.split_assign(df, test_pct=1.0, val_pct=0.0)
    assert all_test.filter(F.col("split") != "test").count() == 0
    no_train = C.split_assign(df, test_pct=0.5, val_pct=0.5)
    assert no_train.filter(F.col("split") == "train").count() == 0


def test_bm25_saturates_tf_and_rewards_rarity(spark):
    """BM25 vs raw tf: a term repeated many times saturates (k1), so a RARE
    term with modest tf outranks a common term with huge tf — the property
    that distinguishes BM25 from tf-idf's linear tf."""
    df = spark.createDataFrame(
        [
            (1, "rare " * 2 + "common " * 30),
            (2, "common common filler filler"),
            (3, "common filler other words here"),
        ],
        ["doc_id", "text"],
    )
    top = {r["doc_id"]: r for r in C.bm25_topk(df, k=1).collect()}
    assert top[1]["term"] == "rare"  # tf=30 of 'common' saturates; rarity wins
    assert top[1]["bm25"] > 0


def test_split_assign_decimal_sum_boundary(spark):
    """Rates that sum to 1.0 in decimal but just under in binary float
    (0.7 + 0.3) must still leave zero train docs."""
    df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    out = C.split_assign(df, test_pct=0.7, val_pct=0.3)
    assert out.filter(F.col("split") == "train").count() == 0


def test_chunk_dedup_first_occurrence_wins(spark):
    """Doc 1 owns both chunks; doc 2 repeats doc 1's first chunk (dropped)
    but keeps its own tail; doc 3 is pure boilerplate -> empty clean text."""
    boiler = "a b c d e f g h"
    rows = [
        (1, boiler + " i j k l m n o p"),
        (2, boiler + " q r s t u v w x"),
        (3, boiler),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in C.chunk_dedup(df, chunk_words=8).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_clean"] == boiler + " i j k l m n o p"
    assert out[2]["n_kept"] == 1 and out[2]["text_clean"] == "q r s t u v w x"
    assert out[3]["n_kept"] == 0 and out[3]["text_clean"] == ""


def test_chunk_dedup_within_doc_repeat_drops(spark):
    df = spark.createDataFrame(
        [(7, "x y z x y z")], ["doc_id", "text"]
    )
    out = C.chunk_dedup(df, chunk_words=3).collect()[0]
    # chunks: "x y z" (idx 0) and "x y z" (idx 1) -> global first-occurrence
    # keeps only idx 0
    assert out["n_chunks"] == 2 and out["n_kept"] == 1
    assert out["text_clean"] == "x y z"


def test_chunk_dedup_tail_chunk_shorter(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    out = C.chunk_dedup(df, chunk_words=3).collect()[0]
    assert out["n_chunks"] == 2 and out["n_kept"] == 2
    assert out["text_clean"] == "a b c d e"


def test_quality_rules_each_rule_fires(spark):
    from spark_etl_framework_spark.operators import text as T

    rows = [
        (1, "the data is on the table and a key for the scan now ok"),  # passes
        (2, "tiny doc"),                                    # min_tokens
        (3, "spam " * 40),                                  # repetition (+stopwords)
        (4, "aaaaaaaaaaaaaaaaaaaaaa " * 12),                # word_len high
        (5, "1 2 3 4 5 6 7 8 9 10 11 12"),                  # alpha + stopwords + word_len low
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in T.with_quality_rules(df).collect()}
    assert out[1]["passes_all"] and out[1]["n_rules_failed"] == 0
    assert not out[2]["rule_min_tokens"]
    assert not out[3]["rule_repetition"]
    assert not out[4]["rule_word_len"]
    assert not out[5]["rule_alpha"] and not out[5]["rule_stopwords"]
    for d in (2, 3, 4, 5):
        assert not out[d]["passes_all"] and out[d]["n_rules_failed"] >= 1


def test_unigram_surprisal_orders_rarity(spark):
    """Docs made of rare tokens must score strictly higher bits/token than
    docs made of the corpus's most common token; a doc of the single most
    common token scores exactly -log2(p(token))."""
    import math

    rows = [(i, "common common common common") for i in range(8)]
    rows += [(100, "rareword common common common"), (101, "unique1 unique2 unique3 unique4")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["bits_per_token"] for r in C.unigram_logprob(df).collect()}
    n_total = 8 * 4 + 4 + 4  # 40 tokens; 'common' appears 35x
    expect_common = round(-math.log2(35 / n_total), 6)
    assert out[0] == expect_common
    assert out[100] > out[0]
    assert out[101] > out[100]


def test_chunk_dedup_null_text_no_phantom_chunks(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in C.chunk_dedup(df, chunk_words=3).collect()}
    assert out[2]["n_kept"] <= out[2]["n_chunks"]
    assert out[1]["text_clean"] == "a b c"


def test_collocations_pmi_ranks_exclusive_pair_first(spark, tmp_path):
    """PMI semantics: a bigram whose parts ONLY occur together ("hong
    kong") must outrank an equally frequent bigram of promiscuous tokens
    — that's the association-vs-frequency distinction PMI exists for."""
    from spark_etl_framework_spark.queries import QUERIES

    # 10 docs: "hong kong" exclusive pair; "the cat"/"the dog" share "the"
    rows = [(i, "hong kong the cat the dog x%d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    df.write.parquet(sf + "/documents.parquet")
    out = QUERIES["text_collocations_pmi"](spark, sf).collect()
    assert out[0]["x"] == "hong" and out[0]["y"] == "kong"
    pmi = {(r["x"], r["y"]): r["pmi"] for r in out}
    assert pmi[("hong", "kong")] > pmi[("the", "cat")]


def test_weighted_sample_prefers_heavy_docs(spark, tmp_path):
    """E-S weighting property: with 100 heavy docs (400 tokens) and 100
    light docs (4 tokens), a 100-doc sample must be dominated by heavy
    docs — u^(1/400) crowds out u^(1/4) except for extreme draws."""
    from spark_etl_framework_spark.queries import QUERIES

    rows = [(i, " ".join(["w"] * 400)) for i in range(100)]
    rows += [(100 + i, "a b c d") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    df.write.parquet(sf + "/documents.parquet")
    out = QUERIES["text_weighted_sample"](spark, sf).collect()
    assert len(out) == 100
    n_heavy = sum(1 for r in out if r["doc_id"] < 100)
    assert n_heavy >= 90


def _trigram_reference(corpus, lambdas=(0.1, 0.3, 0.6)):
    """Pure-Python interpolated trigram LM — the operator's spec."""
    import math
    from collections import Counter

    BOS = "<s> "
    l1, l2, l3 = lambdas
    streams = {
        d: [t for t in text.lower().strip().split() if t]
        for d, text in corpus
    }
    grams = []
    for d, toks in streams.items():
        for i, w in enumerate(toks):
            w1 = toks[i - 1] if i >= 1 else BOS
            w2 = toks[i - 2] if i >= 2 else BOS
            grams.append((d, w2, w1, w))
    c3 = Counter((w2, w1, w) for _, w2, w1, w in grams)
    cc2 = Counter((w2, w1) for _, w2, w1, _ in grams)
    c2 = Counter((w1, w) for _, _, w1, w in grams)
    cc1 = Counter(w1 for _, _, w1, _ in grams)
    c1 = Counter(w for _, _, _, w in grams)
    n = len(grams)
    out = {}
    for d, toks in streams.items():
        if not toks:
            continue
        bits = 0.0
        for i, w in enumerate(toks):
            w1 = toks[i - 1] if i >= 1 else BOS
            w2 = toks[i - 2] if i >= 2 else BOS
            p = (
                l3 * (c3[(w2, w1, w)] / cc2[(w2, w1)])
                + l2 * (c2[(w1, w)] / cc1[w1])
                + l1 * (c1[w] / n)
            )
            bits += -math.log2(p)
        out[d] = (len(toks), round(bits / len(toks), 6))
    return out


def test_trigram_perplexity_matches_reference(spark):
    """Exact match (at the round-6 output precision) against a pure-Python
    interpolated trigram LM on a corpus exercising BOS padding (1- and
    2-token docs), repeated contexts, and case folding."""
    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "THE CAT sat"),          # case folds into doc 1/2's contexts
        (4, "zebra"),                # single token: both contexts are BOS
        (5, "on on"),                # 2 tokens: w2 is BOS twice
        (6, "entirely novel garbage tokens xqzw vvkp"),
    ]
    expect = _trigram_reference(corpus)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
        for r in C.trigram_logprob(df).collect()
    }
    assert out == expect
    # order sanity: templated text scores below novel-context garbage
    assert out[1][1] < out[6][1]


def test_trigram_perplexity_empty_and_null_docs_drop(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in C.trigram_logprob(df).collect()}
    assert set(out) == {1}
    assert out[1]["n_tokens"] == 4
# To append to tests/test_corpus_ops.py


def _trigram_heldout_reference(train, score, topk=4, lambdas=(0.1, 0.3, 0.6)):
    """Pure-Python pruned-serving reference for trigram_logprob_heldout."""
    import math
    from collections import Counter, defaultdict

    BOS = "<s> "
    l1, l2, l3 = lambdas

    def grams_of(corpus):
        out = []
        for d, text in corpus:
            toks = [t for t in (text or "").lower().strip().split() if t]
            for i, w in enumerate(toks):
                w1 = toks[i - 1] if i >= 1 else BOS
                w2 = toks[i - 2] if i >= 2 else BOS
                out.append((d, w2, w1, w))
        return out

    tg = grams_of(train)
    c3 = Counter((w2, w1, w) for _, w2, w1, w in tg)
    cc2 = Counter((w2, w1) for _, w2, w1, _ in tg)
    c2 = Counter((w1, w) for _, _, w1, w in tg)
    cc1 = Counter(w1 for _, _, w1, _ in tg)
    c1 = Counter(w for _, _, _, w in tg)
    n = len(tg)

    by_ctx2 = defaultdict(list)
    for (w2, w1, w), c in c3.items():
        by_ctx2[(w2, w1)].append((-c, w))
    tri_p = {}
    for ctx, lst in by_ctx2.items():
        for negc, w in sorted(lst)[:topk]:
            tri_p[(ctx[0], ctx[1], w)] = -negc / cc2[ctx]
    by_ctx1 = defaultdict(list)
    for (w1, w), c in c2.items():
        by_ctx1[w1].append((-c, w))
    big_p = {}
    for w1, lst in by_ctx1.items():
        for negc, w in sorted(lst)[:topk]:
            big_p[(w1, w)] = -negc / cc1[w1]

    agg = {}
    for d, w2, w1, w in grams_of(score):
        p = max(
            l3 * tri_p.get((w2, w1, w), 0.0)
            + l2 * big_p.get((w1, w), 0.0)
            + l1 * (c1.get(w, 0) / n),
            l1 * (0.5 / n),
        )
        tok, bits, oov = agg.get(d, (0, 0.0, 0))
        agg[d] = (tok + 1, bits + -math.log2(p), oov + (1 if w not in c1 else 0))
    return {
        d: (tok, round(bits / tok, 6), oov) for d, (tok, bits, oov) in agg.items()
    }


def test_trigram_heldout_matches_reference(spark):
    """Exact match (round-6 precision) against the pure-Python pruned
    reference: pruning must drop the 5th continuation of the crowded
    context, OOV tokens must hit the floor and be counted."""
    train = [
        # context (c, a) has 5 continuations with counts 1..5 -> topk=4
        # prunes x1 from the trigram table; context (a,) likewise prunes
        # the x1 bigram — the scored "c a x1" hits both pruned paths
        (1, "c a x1 c a x2 c a x2 c a x3 c a x3 c a x3 c a x4 c a x4 "
            "c a x4 c a x4 c a x5 c a x5 c a x5 c a x5 c a x5"),
        (2, "the cat sat on the mat"),
        (3, "the cat sat on the hat"),
    ]
    score = [
        (10, "the cat sat on the mat"),
        (11, "c a x1 c a x5"),
        (12, "zz yy zz"),  # fully OOV -> floor every token
    ]
    expect = _trigram_heldout_reference(train, score, topk=4)
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"], r["n_oov"])
        for r in C.trigram_logprob_heldout(tdf, sdf, topk=4).collect()
    }
    assert out == expect
    assert out[12][2] == 3  # every token OOV
    assert out[10][1] < out[12][1]


def test_trigram_heldout_plan_broadcasts_model(spark):
    """The serving shape's contract: all three model lookups must be
    broadcast-hash joins (map-side), never shuffle joins on the
    held-out stream."""
    train = spark.createDataFrame(
        [(1, "a b c a b d")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(2, "a b c")], "doc_id long, text string"
    )
    plan = (
        C.trigram_logprob_heldout(train, score)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
