"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the (small)
probe set against the full corpus — one narrow pass over the big side, one
shuffle for the per-probe top-k. The scale path (IVF-style partition pruning)
keeps the same interface and only changes which candidates are scored.

Dot products use ``F.zip_with`` + ``F.aggregate`` in DOUBLE — JVM-codegen
column expressions, no Python on the scoring path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..caching import scoped_localcheckpoint, scoped_persist


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbours of each probe vector.

    Returns (probe_id, vec_id, cosine, rn). The probe side is broadcast
    (probes ≪ corpus); scoring is a single narrow pass over the corpus; the
    only shuffle is the per-probe top-k window, keyed by probe_id. Ranking
    uses the ROUNDED similarity (6 dp) with an id tiebreak so results are
    bit-deterministic across engines and partitionings.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("_pv")
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            id_col,
            F.round(
                _dot(F.col("_pv"), F.col("_cv")) / (_norm(F.col("_pv")) * _norm(F.col("_cv"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= k
    )


def centroid_vectors(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid as an array column (label, cvec).

    Components are ROUNDED to 6 dp: averaging is summation-order dependent at
    the last ulp, and rounding makes the quantizer bit-reproducible across
    engines/partitionings — so every downstream distance is too.
    """
    return (
        df.select(
            label_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x")
        )
        .groupBy(label_col, "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: score probes against per-label centroids, keep the
    ``nprobe`` nearest cells, and rerank exactly only within those cells.

    This is the 100 TB shape: the corpus is partitioned by cell (here the
    label column; in production a KMeans assignment), the probe→centroid pass
    touches #cells rows, and the exact rerank scans only ~nprobe/#cells of
    the corpus. Probes and centroids are broadcast — the corpus never
    shuffles until the final per-probe top-k of the candidate set.
    """
    cents = centroid_vectors(corpus, label_col, vec_col)
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("_pv")
    )
    cos_c = F.round(
        _dot(F.col("_pv"), F.col("cvec")) / (_norm(F.col("_pv")) * _norm(F.col("cvec"))), 6
    )
    pc = p.crossJoin(F.broadcast(cents)).select("probe_id", "_pv", label_col, cos_c.alias("cos_c"))
    w_cells = W.partitionBy("probe_id").orderBy(F.desc("cos_c"), F.asc(label_col))
    top_cells = (
        pc.withColumn("rn", F.row_number().over(w_cells))
        .filter(F.col("rn") <= nprobe)
        .select("probe_id", "_pv", label_col)
    )
    c = corpus.select(
        F.col(id_col), F.col(label_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    cosine = F.round(
        _dot(F.col("_pv"), F.col("_cv")) / (_norm(F.col("_pv")) * _norm(F.col("_cv"))), 6
    )
    scored = (
        c.join(F.broadcast(top_cells), label_col)
        .filter(F.col(id_col) != F.col("probe_id"))
        .select("probe_id", id_col, cosine.alias("cosine"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= k
    )


def blocked_neardup_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    k: int = 20,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates, blocked by a cluster
    column: only same-block pairs are compared (the blocking that turns the
    n² all-pairs scan into Σ block² — at scale the block is an LSH bucket or
    IVF cell). Returns the top-k most similar pairs."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    cosine = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb"))), 6
    )
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine.alias("cosine"))
    )
    return pairs.orderBy(F.desc("cosine"), "id_a", "id_b").limit(k)


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid, one row per (label, dim): the groundwork for
    IVF-style ANN (assign → probe nearest centroids only). posexplode +
    groupBy(label, dim) aggregates with map-side combine; never collects a
    vector to the driver."""
    return (
        df.select(label_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"))
        .groupBy(label_col, "dim")
        .agg(F.round(F.avg("x"), 6).alias("centroid"), F.count(F.lit(1)).alias("n_vecs"))
        .select(label_col, F.col("dim").cast("int").alias("dim"), "centroid", "n_vecs")
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale = max|x| / 127,
    q_i = round-half-up(x_i / scale) — the storage/bandwidth-compression
    step an embedding store runs before ANN serving (4x smaller than f32,
    8x than f64).

    Pure map-side array expressions (no shuffle, scan speed at any corpus
    size). Rounding is spelled ``floor(x/scale + 0.5)`` so both engines
    compute the identical integer regardless of their round() tie rules;
    float components are cast to double FIRST so the max/divide chain is
    the same IEEE sequence everywhere. Zero vectors (scale 0) pass
    through with a NULL code string rather than dividing by zero.
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(xd, F.abs))
    scale = amax / F.lit(127.0)
    codes = F.transform(xd, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    return df.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        F.when(amax > 0, F.array_join(codes, ",")).alias("codes"),
        F.size(F.col(vec_col)).alias("dim"),
    )


def srp_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for signed random projection:
    component (p, d) = md5("p:d") first-4-hex-digits mapped to [-1, 1).

    md5-derived instead of a seeded RNG so the SAME planes are computable
    in any engine/language (the oracle inlines them as literals) and stable
    across runs — no driver-side randomness enters the plan.
    """
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:4], 16) / 32768.0 - 1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_buckets(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection LSH bucket per vector: bit p = sign of the
    dot product with hyperplane p (rounded to 6 dp first, so an
    ulp-of-zero dot cannot flip a bit between engines); bucket id =
    the bit pattern as an int. Cosine-similar vectors collide with
    probability 1 - θ/π per bit — the classic Charikar scheme.

    The planes are plan-time literals (a few KB) compiled into the
    projection, so this is a narrow map: zero shuffles, no UDF, scan
    speed at any corpus size. Downstream near-dup / ANN candidate joins
    group on srp_bucket exactly like the MinHash band join.
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bit = F.when(F.round(_dot(xd, lit_plane), 6) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return df.select(F.col(id_col), bucket.cast("int").alias("srp_bucket"))


def kmeans_cells(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Deterministic fixed-round Lloyd's k-means cell assignment — the
    coarse-quantizer TRAINING step for IVF ANN (``ivf_topk`` consumes any
    cell column; ``label`` is the given-taxonomy shortcut, this learns
    cells from the data).

    Everything is engine-reproducible by construction: seeds are the k
    lowest-id vectors (no rand()), distances are squared-L2 left-fold sums
    rounded to 6 dp with an id tiebreak, and centroid components are
    rounded to 6 dp each round — so the full assignment is
    oracle-checkable, unlike library k-means. A FIXED number of rounds
    keeps the whole thing one static declarative plan (no driver loop, no
    checkpointing); production IVF training runs a handful of Lloyd
    rounds anyway — convergence polish buys little for cell routing.

    Scale shape per round: the k centroids BROADCAST against a narrow
    corpus scoring pass (the k-times-expanded scored relation never
    shuffles); the argmin is a partial-aggregating shuffle of ONE row per
    vector — carrying the embedding only on rounds that still need a
    centroid update (the final round ships just (vid, argmin-struct));
    the update itself is posexplode + groupBy(cell, dim) with map-side
    partial aggregation — k*dims result rows.
    """
    if iters < 1:
        raise ValueError(f"kmeans_cells: iters must be >= 1, got {iters}")
    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e"))
    # seeds = the k LOWEST ids regardless of where the id space starts
    # (orderBy.limit compiles to TakeOrderedAndProject — per-partition
    # heaps, scale-safe); cid = rank within those k rows (k-row window)
    from pyspark.sql import Window as W

    seeds = v.orderBy("vid").limit(k)
    cent = seeds.select(
        (F.row_number().over(W.orderBy("vid")) - 1).cast("int").alias("cid"),
        F.col("e").alias("c"),
    )
    assigned = None
    for it in range(iters):
        dist = F.round(
            F.aggregate(
                F.zip_with("e", "c", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        scored = v.crossJoin(F.broadcast(cent)).select(
            "vid", "e", "cid", dist.alias("d")
        )
        if it == iters - 1:
            # final round: no centroid update follows, so don't carry the
            # embedding through the argmin shuffle
            assigned = (
                scored.groupBy("vid")
                .agg(F.min(F.struct("d", "cid")).alias("m"))
                .select("vid", F.col("m.cid").alias("cell"))
            )
            break
        assigned = (
            scored.groupBy("vid")
            .agg(F.min(F.struct("d", "cid")).alias("m"), F.first("e").alias("e"))
            .select("vid", "e", F.col("m.cid").alias("cell"))
        )
        cent = (
            assigned.select("cell", F.posexplode("e").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cx"))),
                    lambda s: s["cx"],
                ).alias("c")
            )
            .select(F.col("cell").alias("cid"), "c")
        )
    return assigned.select(F.col("vid").alias(id_col), F.col("cell").cast("int").alias("cell"))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.3,
) -> DataFrame:
    """SemDeDup-style embedding dedup (Abbas et al., 2023, arXiv:2303.09540):
    within each semantic cell (a cluster / label / IVF cell), a vector is
    DROPPED when some smaller-id vector in the same cell has cosine ≥
    ``threshold`` with it — keep-first with a deterministic id order, so
    near-duplicate groups collapse to their minimum id.

    Returns every input id with ``max_cos_prior`` (highest cosine to any
    smaller-id cell-mate, null for each cell's first vector) and the
    ``is_kept`` decision.

    Scale shape: the pairwise scan is cell-blocked (Σ|cell|², never n²) —
    exactly the economics of :func:`blocked_neardup_topk`; at 100 TB the
    cell is a learned k-means cell (:func:`kmeans_cells`) sized so |cell|
    fits a task. Then one aggregation by id and one id-keyed left join
    back, both narrow (id + one double)."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    cosine = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb"))), 6
    )
    prior = (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_b").alias(id_col), cosine.alias("_cos"))
        .groupBy(id_col)
        .agg(F.max("_cos").alias("max_cos_prior"))
    )
    return (
        df.select(id_col, F.col(block_col).alias("cell"))
        .join(prior, id_col, "left")
        .select(
            id_col,
            "cell",
            "max_cos_prior",
            (
                F.col("max_cos_prior").isNull()
                | (F.col("max_cos_prior") < F.lit(threshold))
            ).alias("is_kept"),
        )
    )


def power_iteration_pc1(
    df,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 2,
) -> DataFrame:
    """Dominant principal direction of the (uncentered) Gram matrix by
    matrix-free power iteration: ``v ← normalize(Σ_rows x·(x⊤v))``, start
    ``e₀``, fixed ``iters`` rounds. True centered PCA subtracts the
    per-dimension means first (see vector_dim_stats) — the uncentered
    form is the memory-layout-identical core and what similarity
    pre-conditioning actually uses.

    Distributed shape per round — the classic map-reduce eigensolver:
    the d-element vector rides a broadcast 1-row relation onto the
    corpus (map-side dot products), contributions posexplode to (dim,
    x·dot) pairs whose partial aggregation collapses every partition to
    ≤ d rows before the ONE tiny exchange, and normalization is a d-row
    aggregate. The corpus is scanned once per round and never shuffled;
    fixed rounds keep lineage linear (persist the input at high iters).
    Returns (dim, component) with ‖v‖ = 1.

    Deterministic up to float summation order: e₀ start, left-fold dots,
    unique-dim sort for the repack. The per-dimension contribution sums
    are unordered double additions (no exact accumulator exists for this
    recurrence), so results can differ in the last ulps between engines
    and partitionings; the caller's 6-dp rounding absorbs this except for
    the astronomically rare sum landing within ~1 ulp of a rounding
    boundary — accepted residual risk, same class as vector_norm_stats.
    """
    if iters < 1:
        raise ValueError("power_iteration_pc1: iters must be >= 1")
    x = df.select(F.col(vec_col).cast("array<double>").alias("x"))
    spark = df.sparkSession
    v = spark.range(1).select(
        F.array(F.lit(1.0), *[F.lit(0.0)] * (dim - 1)).alias("v")
    )
    for it in range(iters):
        dots = x.crossJoin(F.broadcast(v)).select(
            "x",
            F.aggregate(
                F.zip_with("x", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, y: acc + y,
            ).alias("d"),
        )
        pairs = dots.select(F.posexplode("x").alias("dim", "xv"), "d")
        agg = pairs.groupBy("dim").agg(F.sum(F.col("xv") * F.col("d")).alias("val"))
        nrm = agg.agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm"))
        comp = agg.crossJoin(F.broadcast(nrm)).select(
            "dim", (F.col("val") / F.col("nrm")).alias("component")
        )
        if it == iters - 1:
            return comp.select(F.col("dim").cast("int").alias("dim"), "component")
        v = comp.groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "component"))),
                lambda s: s["component"],
            ).alias("v")
        )


def jl_projection_matrix(in_dim: int, out_dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic Achlioptas ±1 projection matrix (seeded stdlib
    Random) — plan-time literals, like the SRP planes: reproducible run
    to run, engine to engine, and inlineable into an oracle's SQL."""
    import random

    rnd = random.Random(seed)
    return [
        [float(rnd.choice((-1, 1))) for _ in range(in_dim)]
        for _ in range(out_dim)
    ]


def jl_project(
    df,
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 7,
):
    """Johnson-Lindenstrauss dimensionality reduction: ``x' = R·x /
    sqrt(k)`` with a ±1 (Achlioptas) matrix — pairwise distances are
    preserved within (1 ± ε) with high probability, at a quarter of the
    bytes here. The matrix is plan-time literals: the reduction is a pure
    narrow map (zero shuffles, whole-stage codegen over fused
    fold-multiply expressions), so it composes in front of any ANN/dedup
    consumer without changing that consumer's shuffle inventory.
    Returns the input plus ``reduced`` (array<double>, length out_dim).
    """
    planes = jl_projection_matrix(in_dim, out_dim, seed)
    x = F.col(vec_col).cast("array<double>")
    inv = 1.0 / float(out_dim) ** 0.5
    comps = [
        (
            F.aggregate(
                F.zip_with(x, F.array(*[F.lit(v) for v in row]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, y: acc + y,
            )
            * F.lit(inv)
        ).alias(f"__jl{j}")
        for j, row in enumerate(planes)
    ]
    tmp = df.withColumns({f"__jl{j}": c for j, c in enumerate(comps)})
    return tmp.withColumn(
        "reduced", F.array(*[F.col(f"__jl{j}") for j in range(out_dim)])
    ).drop(*[f"__jl{j}" for j in range(out_dim)])


def pq_codes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub: int = 8,
    k: int = 4,
    iters: int = 2,
    with_model: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Product-quantization code assignment: train all ``m`` subspace
    quantizers in ONE plan (not m independent DAGs). The vector explodes
    into (subspace, subvector) rows once; per Lloyd round the m×k
    centroid relation broadcasts onto that stream, the argmin is a
    partial-aggregating shuffle of one row per (vector, subspace), and
    the centroid update is a (subspace, cell, dim)-keyed aggregate —
    identical arithmetic per subspace to :func:`kmeans_cells` (same
    deterministic seeds, 6-dp rounding, cid tiebreak), so the DuckDB
    replay of the single-subspace quantizer extends per slice. Seeds are
    the k lowest ids, found once via TakeOrderedAndProject and broadcast
    — no full-relation ranking window. Returns (id, subspace, code);
    with ``with_model=True`` also returns the (subspace, code, c)
    codebook relation the final assignment used, for ADC scoring.
    """
    if iters < 1:
        raise ValueError(f"pq_codes: iters must be >= 1, got {iters}")
    from pyspark.sql import Window as W

    arr = F.col(vec_col).cast("array<double>")
    slices = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("s"),
                F.slice(arr, s * sub + 1, sub).alias("e"),
            )
            for s in range(m)
        ]
    )
    v = (
        df.select(F.col(id_col).alias("vid"), F.explode(slices).alias("z"))
        .select("vid", F.col("z.s").alias("s"), F.col("z.e").alias("e"))
    )
    low = df.select(F.col(id_col).alias("vid")).orderBy("vid").limit(k)
    cent = (
        v.join(F.broadcast(low), "vid")
        .withColumn(
            "cid",
            (F.row_number().over(W.partitionBy("s").orderBy("vid")) - 1).cast(
                "int"
            ),
        )
        .select("s", "cid", F.col("e").alias("c"))
    )
    assigned = None
    for it in range(iters):
        dist = F.round(
            F.aggregate(
                F.zip_with("e", "c", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        if with_model and it == iters - 1:
            # the final-round centroids are returned as the model AND
            # consumed by the final assignment: persist the m*k-row
            # relation so the training DAG under it runs ONCE, not once
            # per consumer (measured 2x otherwise — two seed subtrees,
            # eight duplicate corpus scans in the ADC plan). Scoped: the
            # round-4 ADVICE leak — released on the next query invocation
            # (caching.py); callers needing a longer-lived model own the
            # persist themselves
            cent = scoped_persist(cent)
        scored = v.join(F.broadcast(cent), "s").select(
            "vid", "s", "e", "cid", dist.alias("d")
        )
        if it == iters - 1:
            assigned = (
                scored.groupBy("vid", "s")
                .agg(F.min(F.struct("d", "cid")).alias("mm"))
                .select("vid", "s", F.col("mm.cid").alias("code"))
            )
            break
        a = (
            scored.groupBy("vid", "s")
            .agg(F.min(F.struct("d", "cid")).alias("mm"), F.first("e").alias("e"))
            .select("vid", "s", F.col("mm.cid").alias("cell"), "e")
        )
        cent = (
            a.select("s", "cell", F.posexplode("e").alias("dim", "x"))
            .groupBy("s", "cell", "dim")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
            .groupBy("s", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cx"))),
                    lambda t: t["cx"],
                ).alias("c")
            )
            .select("s", F.col("cell").alias("cid"), "c")
        )
        # NON-EAGER checkpoint (m*k rows): truncates the per-round plan
        # so the next round's two consumers (scoring join + update) read
        # the materialized centroids instead of re-executing the
        # corpus-wide training subtree — same doubling fix as
        # bpe_train_merges / connected_components; scoped so the cached
        # RDD is released when the next query starts. eager=False because
        # the state materializes inside the NEXT round's first action
        # anyway: an eager barrier job per round cost ~0.3 s at sf0.1 for
        # nothing (round-6 A/B, min of 4 runs: eager 2.02 s / lazy 1.73 s
        # / no-checkpoint 1.90 s with the 8-scan plan — lazy keeps the
        # 2-scan plan AND is fastest).
        cent = scoped_localcheckpoint(cent, eager=False)
    out = assigned.select(
        F.col("vid").alias(id_col),
        F.col("s").alias("subspace"),
        F.col("code").cast("int").alias("code"),
    )
    if with_model:
        # the codebook the FINAL assignment used — what ADC scoring must
        # build its distance tables against
        return out, cent.select(
            F.col("s").alias("subspace"), F.col("cid").alias("code"), "c"
        )
    return out


def _adc_distance_tables(
    probes: DataFrame, book: DataFrame, m: int, sub: int,
    id_col: str = "probe_id", vec_col: str = "pe",
) -> DataFrame:
    """Per-probe ADC distance tables: slice each probe vector into the m
    subspaces and score every codebook entry — m*k rows per probe
    (broadcast-sized), the lookup table asymmetric-distance scoring sums
    over. Distances round to 6 dp then cast to DECIMAL(18,6) so the
    m-term accumulation is engine-exact (the oracle contract)."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("subspace"),
                F.slice(F.col(vec_col), s * sub + 1, sub).alias("pe"),
            )
            for s in range(m)
        ]
    )
    p = probes.select(F.col(id_col), F.explode(slices).alias("z")).select(
        id_col, F.col("z.subspace").alias("subspace"), F.col("z.pe").alias("pe")
    )
    d = F.round(
        F.aggregate(
            F.zip_with("pe", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    ).cast("decimal(18,6)")
    return p.join(F.broadcast(book), "subspace").select(
        id_col, "subspace", "code", d.alias("d")
    )


def adc_search(
    codes: DataFrame,
    book: DataFrame,
    probes: DataFrame,
    m: int = 8,
    sub: int = 8,
    topk: int = 10,
) -> DataFrame:
    """Exhaustive PQ asymmetric-distance search over a trained index:
    score the whole code relation (vec_id, subspace, code) from the
    broadcast per-probe distance tables — the corpus is read as 2-byte
    codes only, never as raw floats. Probes: (probe_id, pe
    array<double>). Returns (probe_id, vec_id, adc_dist, rn) top-k per
    probe with id tiebreak."""
    dtab = _adc_distance_tables(probes, book, m, sub)
    scored = (
        codes.join(F.broadcast(dtab), ["subspace", "code"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.sum("d").alias("dist"))
    )
    w = W.partitionBy("probe_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= topk)
        .select(
            "probe_id",
            "vec_id",
            F.col("dist").cast("double").alias("adc_dist"),
            "rn",
        )
    )


def ivfpq_search(
    codes_lab: DataFrame,
    book: DataFrame,
    cent: DataFrame,
    probes: DataFrame,
    m: int = 8,
    sub: int = 8,
    nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """IVF-PQ search over a trained index — the query-time half of the
    FAISS-default composite: route each probe to its ``nprobe`` nearest
    coarse cells (L2 against the broadcast centroid relation), then ADC-
    score ONLY the routed cells' members from their codes. Inputs:
    codes_lab (vec_id, subspace, code, label), book (subspace, code, c),
    cent (label, cvec), probes (probe_id, pe array<double>). At 100 TB
    the code relation partitions by label so the routed-cell restriction
    becomes partition pruning."""
    dc = F.round(
        F.aggregate(
            F.zip_with("pe", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    wc = W.partitionBy("probe_id").orderBy("dc", "label")
    top_cells = (
        probes.join(F.broadcast(cent))
        .select("probe_id", "label", dc.alias("dc"))
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= nprobe)
        .select("probe_id", "label")
    )
    dtab = _adc_distance_tables(probes, book, m, sub)
    scored = (
        codes_lab.join(F.broadcast(top_cells), "label")
        .join(F.broadcast(dtab), ["probe_id", "subspace", "code"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.sum("d").alias("dist"))
    )
    wr = W.partitionBy("probe_id").orderBy("dist", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= topk)
        .select(
            "probe_id",
            "vec_id",
            F.col("dist").cast("double").alias("adc_dist"),
            F.col("rn").cast("int"),
        )
    )


def coarse_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell coarse centroids (label, cvec): per-dim mean, 6-dp
    rounded — the IVF routing relation (|cells| rows, broadcast at query
    time)."""
    arr = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(label_col).alias("label"), F.posexplode(arr).alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda t: t["c"]
            ).alias("cvec")
        )
    )
