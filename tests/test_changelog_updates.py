"""read_iceberg_changelog compute_updates / net_changes (round 13) —
the jar's create_changelog_view options.

Contract (iceberg-spark procedure semantics, this repo's CDF naming):
- compute_updates + identifier columns: within ONE commit ordinal,
  carry-over pairs (bit-identical delete+insert — copy-on-write rewrite
  residue) cancel first, then the surviving delete+insert pair sharing
  the identifier key folds into update_preimage/update_postimage;
  multiple deletes or inserts under one key in one commit REFUSE.
- net_changes: bit-identical delete+insert pairs cancel across the WHOLE
  range; each surviving change keeps its latest commit ordinal.
- The two options are mutually exclusive; compute_updates without
  identifier columns (explicit or schema identifier-field-ids) refuses.
"""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.sources import iceberg as ice


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _write(spark, loc, rows, mode="append"):
    df = spark.createDataFrame(rows, "id int, s string")
    return ice.write_iceberg(df.coalesce(1), loc, mode=mode)


def _rows(spark, loc, **kw):
    return sorted(
        (r._change_ordinal, r._change_type, r.id, r.s)
        for r in ice.read_iceberg_changelog(spark, loc, **kw).collect()
    )


def test_update_folds_into_pre_post_images(spark, loc):
    _write(spark, loc, [(1, "a"), (2, "b"), (3, "c")])
    ice.update_where(spark, loc, "id = 2", {"s": "'B'"})
    got = _rows(spark, loc, compute_updates=True, identifier_columns=["id"])
    assert got == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (0, "insert", 3, "c"),
        (1, "update_postimage", 2, "B"),
        (1, "update_preimage", 2, "b"),
    ]


def test_plain_deletes_and_inserts_survive_folding(spark, loc):
    _write(spark, loc, [(1, "a"), (2, "b")])
    ice.delete_where(spark, loc, "id = 1")
    _write(spark, loc, [(3, "c")])
    got = _rows(spark, loc, compute_updates=True, identifier_columns=["id"])
    assert got == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (1, "delete", 1, "a"),
        (2, "insert", 3, "c"),
    ]


def test_carryover_rows_cancel(spark, loc):
    """A content no-op UPDATE rewrites rows bit-identically — the
    delete+insert residue is a carry-over, not a change."""
    _write(spark, loc, [(1, "a"), (2, "b")])
    ice.update_where(spark, loc, "id = 1", {"s": "s"})  # no-op rewrite
    raw = _rows(spark, loc)
    assert (1, "delete", 1, "a") in raw and (1, "insert", 1, "a") in raw
    got = _rows(spark, loc, compute_updates=True, identifier_columns=["id"])
    assert got == [(0, "insert", 1, "a"), (0, "insert", 2, "b")]


def test_ambiguous_key_refuses(spark, loc):
    """Two rows with the same identifier updated in one commit: folding
    cannot pair pre/post images — executor-raised refusal."""
    _write(spark, loc, [(1, "a"), (1, "dup"), (2, "b")])
    ice.update_where(spark, loc, "id = 1", {"s": "concat(s, 'x')"})
    df = ice.read_iceberg_changelog(
        spark, loc, compute_updates=True, identifier_columns=["id"]
    )
    with pytest.raises(Exception, match="identifier key"):
        df.collect()


def test_net_changes_cancels_within_range(spark, loc):
    _write(spark, loc, [(1, "a"), (2, "b")])
    ice.delete_where(spark, loc, "id = 1")  # insert@0 + delete@1 cancel
    ice.update_where(spark, loc, "id = 2", {"s": "'B'"})
    got = _rows(spark, loc, net_changes=True)
    # id=1 vanished; id=2's old insert cancels against the update's
    # pre-image delete, leaving only the new content at ordinal 2
    assert got == [(2, "insert", 2, "B")]


def test_net_changes_keeps_latest_delete_of_preexisting_row(spark, loc):
    s1 = _write(spark, loc, [(1, "a"), (2, "b")])
    ice.delete_where(spark, loc, "id = 1")
    got = _rows(spark, loc, from_snapshot_id=s1, net_changes=True)
    # the insert happened BEFORE the range — the delete is a net change
    assert got == [(0, "delete", 1, "a")]


def test_net_changes_reinsert_identical_vanishes(spark, loc):
    s1 = _write(spark, loc, [(1, "a"), (2, "b")])
    ice.delete_where(spark, loc, "id = 1")
    _write(spark, loc, [(1, "a")])  # re-insert bit-identical
    got = _rows(spark, loc, from_snapshot_id=s1, net_changes=True)
    assert got == []


def test_options_are_mutually_exclusive(spark, loc):
    _write(spark, loc, [(1, "a")])
    with pytest.raises(ValueError, match="net_changes must be False"):
        ice.read_iceberg_changelog(
            spark, loc, compute_updates=True,
            identifier_columns=["id"], net_changes=True,
        )


def test_compute_updates_needs_identifiers(spark, loc):
    _write(spark, loc, [(1, "a")])
    with pytest.raises(ValueError, match="identifier"):
        ice.read_iceberg_changelog(spark, loc, compute_updates=True)


def test_unknown_identifier_column_refuses(spark, loc):
    _write(spark, loc, [(1, "a")])
    with pytest.raises(ValueError, match="not in"):
        ice.read_iceberg_changelog(
            spark, loc, compute_updates=True, identifier_columns=["nope"]
        )


def test_identifier_field_ids_from_schema(spark, loc):
    """Foreign metadata may declare identifier-field-ids — the fold picks
    them up without an explicit identifier_columns."""
    import json
    import os

    _write(spark, loc, [(1, "a"), (2, "b")])
    ice.update_where(spark, loc, "id = 1", {"s": "'A'"})
    v = ice.current_version(loc)
    p = os.path.join(loc, "metadata", f"v{v}.metadata.json")
    with open(p, encoding="utf-8") as fh:
        meta = json.load(fh)
    schemas = [meta["schema"]] if "schema" in meta else []
    schemas += meta.get("schemas", [])
    id_field = next(
        f["id"] for f in schemas[0]["fields"] if f["name"] == "id"
    )
    for sch in schemas:
        sch["identifier-field-ids"] = [id_field]
    with open(p, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    got = _rows(spark, loc, compute_updates=True)
    assert (1, "update_preimage", 1, "a") in got
    assert (1, "update_postimage", 1, "A") in got


# ---------------------------------------------------------------------------
# delta CDF net_changes (round 13 — the same post-pass, shared helper)
# ---------------------------------------------------------------------------


def _dwrite(spark, loc, rows, mode="append"):
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame(rows, "id int, s string")
    return dl.write_delta(df.coalesce(1), loc, mode=mode)


def test_delta_cdf_net_changes(spark, tmp_path):
    from spark_etl_framework_spark.sources import deltalog as dl

    loc = str(tmp_path / "t")
    _dwrite(spark, loc, [(1, "a"), (2, "b")], mode="overwrite")
    dl.delete_where(spark, loc, "id = 1")          # insert@0 + delete@1 cancel
    dl.update_where(spark, loc, "id = 2", {"s": "'B'"})
    raw = dl.table_changes(spark, loc)
    types = {r._change_type for r in raw.collect()}
    assert "update_preimage" in types and "update_postimage" in types
    net = sorted(
        (r._commit_version, r._change_type, r.id, r.s)
        for r in dl.table_changes(spark, loc, net_changes=True).collect()
    )
    # id=1 vanished; id=2 nets to its post-update content only
    assert net == [(2, "insert", 2, "B")]


def test_delta_cdf_net_update_restoring_original_vanishes(spark, tmp_path):
    from spark_etl_framework_spark.sources import deltalog as dl

    loc = str(tmp_path / "t")
    _dwrite(spark, loc, [(1, "a")], mode="overwrite")
    dl.update_where(spark, loc, "id = 1", {"s": "'x'"})
    dl.update_where(spark, loc, "id = 1", {"s": "'a'"})  # restore bytes
    net = sorted(
        (r._change_type, r.id, r.s)
        for r in dl.table_changes(
            spark, loc, starting_version=1, net_changes=True
        ).collect()
    )
    # within (v1..head): pre(a)+post(x) then pre(x)+post(a) — all cancel
    assert net == []


def test_delta_cdf_net_delete_of_preexisting_row_survives(spark, tmp_path):
    from spark_etl_framework_spark.sources import deltalog as dl

    loc = str(tmp_path / "t")
    _dwrite(spark, loc, [(1, "a"), (2, "b")], mode="overwrite")
    dl.delete_where(spark, loc, "id = 1")
    net = sorted(
        (r._change_type, r.id)
        for r in dl.table_changes(
            spark, loc, starting_version=1, net_changes=True
        ).collect()
    )
    assert net == [("delete", 1)]
