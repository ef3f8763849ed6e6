"""Round-14 advisor fixes, pinned.

1. ``FileReader``'s fallback pre-check expands glob URIs via
   ``fs.globStatus`` instead of probing the pattern as a literal path
   (advisor, high) — pinned in ``test_file_sources.py``.
2. ``_absent_default_cols`` treats the manifest count maps as POSITIVE
   evidence of presence only; a field id missing from the maps falls
   back to the parquet footer instead of concluding physical absence
   (advisor, medium) — pinned in ``test_iceberg_v3.py``.
3. ``_delta_change_range`` keeps a removed-then-re-added path in BOTH
   net sets, so the incremental UniForm sync drops the prior mirror
   entry before re-adding — no double-counted file (advisor, medium).
4. ``add_column`` registers a NEW schema with a fresh schema-id and
   bumps ``current-schema-id``; historical schemas stay immutable
   (advisor, low).
5. ``_drop_replaced_dvs`` recomputes the rewritten delete manifest's
   list-level stats (``deleted_rows_count`` = rows of the dropped
   replaced DVs, ``min_sequence_number`` from the survivors) instead of
   carrying the stale originals (advisor, low).
"""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.sources import deltalog as dl
from spark_etl_framework_spark.sources import iceberg as ice


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


# ---------------------------------------------------------------------------
# 3. UniForm incremental sync across a remove-then-re-add (RESTORE) range
# ---------------------------------------------------------------------------


def test_uniform_sync_restore_readd_does_not_double_count(spark, loc):
    """Mirror at v0, then overwrite (v1) and RESTORE back to v0 (v2) —
    the multi-commit incremental range nets the original files to
    removed-AND-re-added. The sync must drop the prior mirror entries
    before re-adding, or the files are referenced twice and every row
    double-counts."""
    df = spark.createDataFrame([(i,) for i in range(6)], "id int")
    dl.write_delta(df.coalesce(2), loc, mode="overwrite")        # v0: A,B
    dl.sync_uniform_iceberg(loc)                                  # mirror v0
    dl.write_delta(
        spark.createDataFrame([(100,)], "id int").coalesce(1),
        loc, mode="overwrite",                                    # v1: +C -A -B
    )
    dl.restore_table(spark, loc, 0)                               # v2: -C +A +B
    dl.sync_uniform_iceberg(loc)  # incremental over (v0, v2]
    got = sorted(r.id for r in ice.read_iceberg(spark, loc).collect())
    assert got == [0, 1, 2, 3, 4, 5]  # each row exactly once
    meta = ice.load_metadata(loc)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert cur["summary"]["total-records"] == "6"
    assert cur["summary"]["total-data-files"] == "2"


def test_uniform_sync_plain_append_range_still_incremental(spark, loc):
    """The re-add fix must not break the pure-append fast path: an
    append-only multi-commit range still mirrors as one new manifest
    with the prior list carried over verbatim."""
    df = spark.createDataFrame([(i,) for i in range(4)], "id int")
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    dl.sync_uniform_iceberg(loc)
    _s, _m, list0 = ice.read_ocf(
        ice._pick_snapshot(ice.load_metadata(loc))["manifest-list"]
    )
    dl.write_delta(
        spark.createDataFrame([(10,)], "id int").coalesce(1), loc
    )
    dl.write_delta(
        spark.createDataFrame([(11,)], "id int").coalesce(1), loc
    )
    dl.sync_uniform_iceberg(loc)
    meta = ice.load_metadata(loc)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert cur["summary"]["operation"] == "append"
    _s2, _m2, list1 = ice.read_ocf(cur["manifest-list"])
    carried = [mf["manifest_path"] for mf in list0]
    assert all(p in [mf["manifest_path"] for mf in list1] for p in carried)
    got = sorted(r.id for r in ice.read_iceberg(spark, loc).collect())
    assert got == [0, 1, 2, 3, 10, 11]
