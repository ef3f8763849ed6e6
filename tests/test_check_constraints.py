"""Delta CHECK constraints (PROTOCOL.md §CHECK Constraints) — round 9.

``delta.constraints.<name>`` table properties every writer must verify:
ADD CONSTRAINT scans existing rows first (like the jar's ALTER TABLE),
then every write path — append, overwrite, UPDATE, MERGE, DELETE-rewrite
— enforces per row INSIDE the write job via a codegen'd guard
(deltalog.py:_with_constraint_guards), not a second scan. FALSE and NULL
both violate (delta's invariant semantics, stricter than SQL CHECK).
The guard deliberately avoids the same-branch ``when()`` shape Catalyst's
SimplifyConditionals elides — that exact optimization silently DROPPED
enforcement in the first implementation, pinned here.
"""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.sources import deltalog as dl


@pytest.fixture()
def tbl(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(10)], "id int, name string, grp int"
    )
    dl.write_delta(df.coalesce(1), t, mode="overwrite", partition_by=["grp"])
    return t


def _row(spark, *vals):
    return spark.createDataFrame([vals], "id int, name string, grp int")


def test_add_validates_existing_rows_and_upgrades_protocol(spark, tbl):
    v = dl.add_check_constraint(spark, tbl, "id_nonneg", "id >= 0")
    snap = dl.snapshot(tbl)
    assert snap.version == v
    assert snap.check_constraints == {"id_nonneg": "id >= 0"}
    assert snap.protocol["minWriterVersion"] == 3  # constraint writer ver
    with pytest.raises(dl.CheckConstraintViolation, match="existing row"):
        dl.add_check_constraint(spark, tbl, "big", "id > 5")
    with pytest.raises(ValueError, match="already exists"):
        dl.add_check_constraint(spark, tbl, "id_nonneg", "id >= 0")


def test_every_write_path_enforces(spark, tbl):
    dl.add_check_constraint(spark, tbl, "id_nonneg", "id >= 0")
    before = dl.latest_version(tbl)
    with pytest.raises(dl.CheckConstraintViolation, match="id_nonneg"):
        dl.write_delta(_row(spark, -1, "bad", 0), tbl, partition_by=["grp"])
    # NULL violates too (delta invariant semantics)
    with pytest.raises(dl.CheckConstraintViolation, match="id_nonneg"):
        dl.write_delta(_row(spark, None, "n", 0), tbl, partition_by=["grp"])
    with pytest.raises(dl.CheckConstraintViolation, match="id_nonneg"):
        dl.update_where(spark, tbl, "id = 2", {"id": "-9"})
    with pytest.raises(dl.CheckConstraintViolation, match="id_nonneg"):
        dl.merge_upsert(spark, tbl, _row(spark, -5, "m", 1), ["id"])
    # a failed write commits NOTHING
    assert dl.latest_version(tbl) == before
    assert dl.read_delta(spark, tbl).count() == 10
    # valid writes and DML still flow
    dl.write_delta(_row(spark, 50, "x", 0), tbl, partition_by=["grp"])
    dl.update_where(spark, tbl, "id = 2", {"id": "200"})
    dl.delete_where(spark, tbl, "id = 3")
    assert dl.read_delta(spark, tbl).count() == 10


def test_multiple_constraints_and_drop(spark, tbl):
    dl.add_check_constraint(spark, tbl, "id_nonneg", "id >= 0")
    dl.add_check_constraint(spark, tbl, "named", "name is not null")
    with pytest.raises(dl.CheckConstraintViolation, match="named"):
        dl.write_delta(_row(spark, 1, None, 0), tbl, partition_by=["grp"])
    with pytest.raises(dl.CheckConstraintViolation, match="id_nonneg"):
        dl.write_delta(_row(spark, -1, "x", 0), tbl, partition_by=["grp"])
    dl.drop_check_constraint(tbl, "id_nonneg")
    dl.write_delta(_row(spark, -1, "ok-now", 0), tbl, partition_by=["grp"])
    assert dl.read_delta(spark, tbl).filter("id = -1").count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        dl.drop_check_constraint(tbl, "id_nonneg")


def test_constraint_survives_checkpoint_and_composes_with_mapping(
    spark, tmp_path
):
    t = str(tmp_path / "m")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(8)], "id int, name string"
    )
    dl.write_delta(df.coalesce(1), t, mode="overwrite", column_mapping="name")
    dl.add_check_constraint(spark, t, "pos", "id >= 0")
    snap = dl.snapshot(t)
    # mapped table is on (2,5): constraint bumps writer past 3 is moot —
    # 5 already >= 3, so the protocol stays
    assert snap.protocol["minWriterVersion"] >= 3
    with pytest.raises(dl.CheckConstraintViolation, match="pos"):
        dl.write_delta(_row_2(spark, -2, "z"), t)
    dl._write_checkpoint(t, dl.latest_version(t))
    dl.clean_log(t)
    snap2 = dl.snapshot(t)
    assert snap2.check_constraints == {"pos": "id >= 0"}
    with pytest.raises(dl.CheckConstraintViolation, match="pos"):
        dl.write_delta(_row_2(spark, -3, "w"), t)


def _row_2(spark, *vals):
    return spark.createDataFrame([vals], "id int, name string")


def test_guard_not_elided_by_catalyst(spark):
    """Regression pin: a same-branch when(cond, c).otherwise(c) guard is
    REMOVED by SimplifyConditionals — enforcement must survive the
    optimizer. Assert the guarded plan still evaluates raise_error."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (-1,)], "id int")
    guarded = dl._with_constraint_guards(df, {"pos": "id >= 0"})
    plan = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan
    with pytest.raises(Exception, match="CHECK constraint pos"):
        guarded.collect()


# ---------------------------------------------------------------------------
# generated columns (round 9) — enforced through the same guard machinery
# ---------------------------------------------------------------------------


def _ts_df(spark, rows):
    return spark.createDataFrame(rows, "id int, ts timestamp")


def test_generated_column_derives_and_partitions(spark, tmp_path):
    import datetime as dt

    t = str(tmp_path / "g")
    df = _ts_df(spark, [(i, dt.datetime(2020, 1 + i % 3, 1 + i, 10))
                        for i in range(9)])
    dl.write_delta(
        df, t, mode="overwrite", partition_by=["event_date"],
        generated_columns={"event_date": "CAST(ts AS DATE)"},
    )
    snap = dl.snapshot(t)
    assert snap.generated_expressions == {"event_date": "CAST(ts AS DATE)"}
    assert snap.protocol == {"minReaderVersion": 1, "minWriterVersion": 4}
    out = dl.read_delta(spark, t)
    assert out.columns == ["id", "ts", "event_date"]
    assert all(r.event_date == r.ts.date() for r in out.collect())
    # the derived column is a REAL partition column: file-list pruning
    total = len(dl.read_delta(spark, t).inputFiles())
    pruned = dl.read_delta(spark, t, where="event_date = '2020-02-02'")
    assert pruned.count() == 1 and len(pruned.inputFiles()) < total
    # appends derive when absent...
    dl.write_delta(
        _ts_df(spark, [(99, dt.datetime(2021, 5, 6, 1))]), t,
        partition_by=["event_date"],
    )
    assert dl.read_delta(spark, t).filter("id = 99").collect()[0].event_date \
        == dt.date(2021, 5, 6)
    # ...and a creation-only option elsewhere
    with pytest.raises(ValueError, match="table-creation option"):
        dl.write_delta(df, t, partition_by=["event_date"],
                       generated_columns={"event_date": "CAST(ts AS DATE)"})


def test_generated_column_explicit_values_enforced(spark, tmp_path):
    import datetime as dt

    t = str(tmp_path / "g")
    dl.write_delta(
        _ts_df(spark, [(1, dt.datetime(2020, 1, 1, 5))]), t,
        mode="overwrite",
        generated_columns={"event_date": "CAST(ts AS DATE)"},
    )
    good = spark.createDataFrame(
        [(2, dt.datetime(2021, 1, 1), dt.date(2021, 1, 1))],
        "id int, ts timestamp, event_date date",
    )
    dl.write_delta(good, t)
    bad = spark.createDataFrame(
        [(3, dt.datetime(2021, 1, 1), dt.date(1999, 9, 9))],
        "id int, ts timestamp, event_date date",
    )
    with pytest.raises(dl.CheckConstraintViolation, match="generated:event_date"):
        dl.write_delta(bad, t)
    assert dl.read_delta(spark, t).count() == 2


def test_generated_recomputes_on_update_and_merge(spark, tmp_path):
    import datetime as dt

    t = str(tmp_path / "g")
    dl.write_delta(
        _ts_df(spark, [(1, dt.datetime(2020, 1, 1, 5)),
                       (2, dt.datetime(2020, 2, 2, 5))]), t,
        mode="overwrite",
        generated_columns={"event_date": "CAST(ts AS DATE)"},
    )
    with pytest.raises(ValueError, match="cannot assign generated"):
        dl.update_where(spark, t, "id = 1", {"event_date": "'2000-01-01'"})
    dl.update_where(spark, t, "id = 1",
                    {"ts": "timestamp'2022-07-08 09:00:00'"})
    rows = {r.id: r.event_date for r in dl.read_delta(spark, t).collect()}
    assert rows[1] == dt.date(2022, 7, 8)      # recomputed with the update
    assert rows[2] == dt.date(2020, 2, 2)      # untouched row unchanged
    # merge: source omits the generated column entirely
    src = _ts_df(spark, [(2, dt.datetime(2023, 3, 3, 3)),
                         (5, dt.datetime(2023, 4, 4, 4))])
    dl.merge_upsert(spark, t, src, ["id"])
    rows = {r.id: r.event_date for r in dl.read_delta(spark, t).collect()}
    assert rows[2] == dt.date(2023, 3, 3) and rows[5] == dt.date(2023, 4, 4)
