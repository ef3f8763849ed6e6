"""Warehouse-maintenance operators: SCD2 merge, snapshot CDC diff, profiling.

The reference exposes upsert semantics as the JdbcWriter ``merge`` write
mode (reference: etl/sink/JdbcWriter.scala:49,68-76 — a sink statement
applied per incoming row) and leaves the dimension-history bookkeeping to
the caller's SQL. These operators package the two classic shapes built on
that primitive — slowly-changing-dimension type-2 history maintenance and
snapshot change-data-capture — as single-join DataFrame transformations,
plus the column-profiling pass an ETL framework runs before loading.

Scale shape (all three): exactly ONE shuffle each.

- ``scd2_merge``: one shuffle join current-history ⋈ updates on the
  business key; row expansion (close + reopen) happens map-side after the
  join via an exploded conditional array, so the changed-key fan-out never
  re-shuffles. Closed history unions in shuffle-free.
- ``snapshot_diff``: one full-outer shuffle join old ⋈ new on the key;
  change classification is a map-side CASE over null-safe comparisons.
- ``profile_columns``: one aggregation pass computing every per-column
  metric at once (Spark plans multi-column ``countDistinct`` as a single
  EXPAND + aggregate — |cols|× row expansion, still one exchange), then a
  map-side ``stack`` unpivot of the 1-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_date: str,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge.

    ``history`` carries ``key``, ``attrs``, ``eff_from``/``eff_to``
    (yyyy-MM-dd strings, ``eff_to`` NULL while current) and a boolean
    ``is_current``. ``updates`` carries ``key`` + ``attrs`` — the latest
    source snapshot for some subset of keys (at most one row per key).

    Semantics per current row / update pair:

    - attrs unchanged (null-safe) → row kept as-is;
    - any attr changed → the current row is CLOSED (``eff_to=eff_date``,
      ``is_current=false``) and a new current version OPENS with the
      update's attrs (``eff_from=eff_date``);
    - key only in updates → a brand-new current row opens;
    - key only in history → untouched (SCD2 updates don't delete).

    Already-closed history rows pass through untouched.
    """
    cur = history.filter(F.col(is_current))
    closed = history.filter(~F.col(is_current))
    u = updates.select(key, *[F.col(a).alias(f"__u_{a}") for a in attrs]).withColumn(
        "__u_present", F.lit(True)
    )
    c = cur.withColumn("__c_present", F.lit(True))
    j = c.join(u, on=key, how="full_outer")

    changed = F.col("__c_present").isNotNull() & F.col("__u_present").isNotNull() & ~(
        # null-safe: every attr equal
        F.lit(True)
        if not attrs
        else _all_eq(attrs)
    )
    brand_new = F.col("__c_present").isNull()

    def _row(attr_src: str | None, from_col, to_col, current):
        """Struct in output column order; ``attr_src`` '__u_' uses update attrs."""
        cols = [
            (F.col(f"__u_{a}") if attr_src == "u" else F.col(a)).alias(a) for a in attrs
        ]
        return F.struct(
            *cols,
            from_col.alias(eff_from),
            to_col.alias(eff_to),
            F.lit(current).alias(is_current),
        )

    keep = _row(None, F.col(eff_from), F.col(eff_to), True)
    close_old = _row(None, F.col(eff_from), F.lit(eff_date), False)
    open_new = _row("u", F.lit(eff_date), F.lit(None).cast("string"), True)

    rows = (
        F.when(brand_new, F.array(open_new))
        .when(changed, F.array(close_old, open_new))
        .otherwise(F.array(keep))
    )
    merged = j.select(F.col(key), F.explode(rows).alias("__r")).select(key, "__r.*")
    return merged.unionByName(closed.select(key, *attrs, eff_from, eff_to, is_current))


def _all_eq(attrs: list[str]):
    cond = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        cond = eq if cond is None else (cond & eq)
    return cond


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    cols: list[str],
) -> DataFrame:
    """Snapshot change-data-capture: classify every key as insert / delete /
    update across two snapshots, emitting old and new values side-by-side.

    Unchanged keys are filtered out map-side after the single full-outer
    join, so the output is change-volume-, not snapshot-, sized.
    """
    if not cols:
        raise ValueError("snapshot_diff: cols must name at least one column")
    o = old.select(key, *[F.col(c).alias(f"old_{c}") for c in cols]).withColumn(
        "__o", F.lit(True)
    )
    n = new.select(key, *[F.col(c).alias(f"new_{c}") for c in cols]).withColumn(
        "__n", F.lit(True)
    )
    j = o.join(n, on=key, how="full_outer")
    same = None
    for c in cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__o").isNull(), F.lit("insert"))
        .when(F.col("__n").isNull(), F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    sel = [F.col(key), change.alias("change_type")]
    for c in cols:
        sel += [F.col(f"old_{c}"), F.col(f"new_{c}")]
    return j.select(*sel).filter(F.col("change_type") != "unchanged")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile: non-null count, null ratio, distinct count,
    min/max (as strings) per column, unpivoted to one row per column.

    All metrics compute in a single aggregation (multi-column distinct
    plans as one EXPAND + partial/final aggregate — one exchange); the
    unpivot runs on the single result row, i.e. driver-free and free.
    """
    # internal aliases are POSITIONAL (__nn_0, __nd_0, ...) so arbitrary
    # column names — spaces, dots, hyphens, quotes, backticks: exactly
    # what a pre-load profiler gets pointed at — never leak into
    # generated SQL identifiers; the source column resolves via a
    # properly backtick-quoted reference (embedded backticks doubled),
    # and the display label escapes embedded quotes.
    def _qcol(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(_qcol(c)).alias(f"__nn_{i}"),
            F.countDistinct(_qcol(c)).alias(f"__nd_{i}"),
            F.min(_qcol(c)).cast("string").alias(f"__mn_{i}"),
            F.max(_qcol(c)).cast("string").alias(f"__mx_{i}"),
        ]
    row = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        label = c.replace("\\", "\\\\").replace("'", "\\'")
        stack_args += [
            f"'{label}'",
            f"__nn_{i}",
            f"__nd_{i}",
            f"__mn_{i}",
            f"__mx_{i}",
        ]
    stacked = row.select(
        F.col("__total"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "AS (column_name, n_nonnull, n_distinct, min_str, max_str)"
        ),
    )
    return stacked.select(
        "column_name",
        F.col("n_nonnull").cast("bigint").alias("n_nonnull"),
        F.round(F.lit(1.0) - F.col("n_nonnull") / F.col("__total"), 6).alias(
            "null_ratio"
        ),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_str",
        "max_str",
    )


def zorder_interleave(cx, cy, bits: int = 8):
    """Morton/z-order key for two pre-quantized non-negative int columns:
    interleave the low ``bits`` bits of ``cx`` (odd positions) and ``cy``
    (even positions) into one ``2·bits``-bit integer.

    Sorting or range-bucketing by this key is the engine-level data-LAYOUT
    operator (Delta/Iceberg expose it as OPTIMIZE ZORDER): consecutive key
    ranges cover small axis-aligned rectangles in (x, y) space, so each
    written file's per-column min/max footer spans ~2^-(bits') of BOTH
    dimensions and parquet row-group skipping works for predicates on
    either column — the thing a single-column sort can only give one of.

    Pure bit arithmetic (shifts, masks, adds) on the driver-side constant
    plan — no UDF, stays inside whole-stage codegen, and is reproduced
    bit-identically by any engine with ``>>``/``&`` (the DuckDB oracle
    mirrors it), so layout decisions are testable under the exact-value
    gate."""
    z = None
    for b in range(bits):
        term = F.shiftright(cx, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1)) + \
            F.shiftright(cy, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b))
        z = term if z is None else z + term
    return z


def zorder_interleave_sql(cx: str = "cx", cy: str = "cy", bits: int = 8) -> str:
    """The exact SQL mirror of :func:`zorder_interleave` (valid in both
    Spark SQL and DuckDB), for oracle parity."""
    return " + ".join(
        f"((({cx} >> {b}) & 1) * {1 << (2 * b + 1)}) + "
        f"((({cy} >> {b}) & 1) * {1 << (2 * b)})"
        for b in range(bits)
    )


def asof_enrich(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    ts_col: str,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
) -> DataFrame:
    """Point-in-time (as-of) enrichment: join each fact row to the ONE
    dimension-history version valid at the fact's timestamp
    (``eff_from <= ts < eff_to``, open-ended current version via NULL
    ``eff_to``) — the temporal-correctness primitive that keeps feature
    generation leakage-free: a fact never sees attribute values that
    only became true later.

    Scale shape: the business key carries the shuffle (ONE sort-merge
    join on ``key``); the temporal predicate rides the join as an extra
    condition, so per-key work is |versions-of-key| — bounded by the
    dimension's change count, never a corpus-sized range join. LEFT
    join: facts outside all validity windows survive with NULL
    attributes (auditable, not silently dropped). The SCD2 interval
    invariant (non-overlapping, half-open) guarantees ≤ 1 match per
    fact, so row count is preserved.
    """
    h = history.select(
        F.col(key).alias("__hk"), *[c for c in history.columns if c != key]
    )
    cond = (
        (facts[key] == h["__hk"])
        & (h[eff_from] <= facts[ts_col])
        & (h[eff_to].isNull() | (facts[ts_col] < h[eff_to]))
    )
    return facts.join(h, cond, "left").drop("__hk")


def partial_agg(df: DataFrame, keys: list[str], aggs: dict) -> DataFrame:
    """Partial (combinable) aggregate of ``df`` — the stored form of an
    incrementally maintained rollup. ``aggs`` maps output column →
    (fn, column-expression) with fn in sum/count/min/max (the
    self-decomposable aggregates; avg = sum/count at read time)."""
    from .skew import _COMBINE

    exprs = []
    for out, (fn, col) in aggs.items():
        if fn not in _COMBINE:
            raise ValueError(f"partial_agg: unsupported aggregate {fn!r}")
        exprs.append(
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(out)
        )
    return df.groupBy(*keys).agg(*exprs)


def incremental_agg_merge(
    base_partials: DataFrame,
    delta: DataFrame,
    keys: list[str],
    aggs: dict,
) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: fold a
    delta batch into a stored partial-aggregate table WITHOUT rescanning
    the base facts. The delta partially aggregates map-side to ≤ |keys|
    rows per partition; the merge then combines two aggregate-sized
    relations (sum/count → sum of partials, min/max → min/max of
    partials). At 100 TB this is the difference between an O(delta)
    nightly refresh and an O(history) one — the base fact scan never
    happens again. Result is row-identical to aggregating base ∪ delta
    from scratch (the oracle).

    Reference context: the reference refreshes rollups by re-running the
    full SqlTransformer aggregation per load
    (etl/transform/SqlTransformer.scala); the partial-merge form is this
    port's scale extension, reusing the salted-agg combiner table
    (operators/skew.py:_COMBINE).
    """
    from .skew import _COMBINE

    d = partial_agg(delta, keys, aggs)
    u = base_partials.select(*keys, *aggs).unionByName(d)
    comb = [_COMBINE[fn](out).alias(out) for out, (fn, _c) in aggs.items()]
    return u.groupBy(*keys).agg(*comb)


def file_row_counts(df: DataFrame) -> DataFrame:
    """Per-file row counts off the hidden ``_metadata`` column of a file
    source: (file_name, n_rows). The input must still be file-backed
    lineage (projections/filters are fine; a join/aggregate severs the
    metadata column). The scan itself is the only cost — at 100 TB this
    is the discovery pass of every layout-maintenance job."""
    return df.groupBy(F.col("_metadata.file_name").alias("file_name")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


def compaction_plan(
    files: DataFrame, target_rows: int, file_col: str = "file_name"
) -> DataFrame:
    """Bin-pack small files into compaction groups of ~``target_rows``:
    (file_name, n_rows, compact_group) — the planning half of the
    small-files problem (the #1 recurring maintenance job on a big
    object-store table; compaction execution is then one
    ``coalesce``/`repartition`` write per group).

    Next-fit-decreasing over the cumulative row count: files sort by
    n_rows DESC (name tiebreak), and a file opens a new group when the
    running total crosses the next ``target_rows`` boundary — so a file
    larger than the target gets its own group, and the assignment is a
    single window over the FILE-LIST relation (bounded: one row per
    file, never per data row). Deterministic and engine-agnostic: the
    same ordered cumulative sum produces the same groups in any SQL
    engine, which is what the paired oracle replays."""
    if target_rows <= 0:
        raise ValueError(f"compaction_plan: target_rows must be > 0, got {target_rows}")
    from pyspark.sql import Window as W

    w = (
        W.orderBy(F.desc("n_rows"), F.col(file_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_rows").over(w)
    return files.select(
        file_col,
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.floor((cum - F.col("n_rows")) / F.lit(target_rows))
        .cast("int")
        .alias("compact_group"),
    )
