"""Jar-free catalog-NAME resolution for Delta / Iceberg tables.

The reference resolves ``table = db.name`` through the Spark session
catalog backed by the connector jar's catalog plugin
(reference: etl/source/DeltaReader.scala:10-31 reads by table name via
``spark.read.format("delta").table(...)``; IcebergReader.scala:12 the
same through a SparkCatalog). Without those jars there is nothing for
Spark to resolve a NAME against, so rounds 1-7 raised the documented
unavailable-error for name-shaped reads while path reads replayed the
real on-disk formats (sources/deltalog.py, sources/iceberg.py).

This module closes that last gate with a **native warehouse catalog**:
the same ``name -> (format, location, partitioning)`` mapping a Hive
metastore entry carries (a public, well-documented shape — metastore
``TBLS``/``SDS`` rows reduce to exactly provider + location), stored as
one JSON document per table under

    {spark.sql.warehouse.dir}/_native_catalog/{db}/{table}.json

written atomically (tmp file + ``os.replace``) so a concurrent reader
never sees a torn entry. Resolution order in the actors stays
jar-first: the format jar's own catalog wins when a cluster ships it,
and this catalog is only consulted on the fallback path.

Scale: the catalog is metadata-only — one O(100-byte) driver-side file
per resolution; executors never touch it, no data moves. At 100 TB the
table's scale story is the underlying log/manifest reader's (which
holds file-level metadata only); name resolution adds nothing.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

from pyspark.sql import SparkSession

_FORMATS = ("delta", "iceberg")
_NAME_PART = re.compile(r"^[A-Za-z0-9_]+$")


def parse_name(name: str) -> tuple[str, str]:
    """Split ``[db.]table`` into (db, table); db defaults to ``default``.

    Path-shaped strings (containing ``/``) are rejected — callers route
    those to the path readers directly.
    """
    if "/" in name or os.sep in name:
        raise ValueError(f"{name!r} is a path, not a catalog table name")
    parts = name.split(".")
    if len(parts) == 1:
        db, tbl = "default", parts[0]
    elif len(parts) == 2:
        db, tbl = parts
    else:
        raise ValueError(f"catalog name must be [db.]table, got {name!r}")
    for p in (db, tbl):
        if not _NAME_PART.match(p):
            raise ValueError(f"invalid catalog name part {p!r} in {name!r}")
    return db, tbl


def _warehouse_dir(spark: SparkSession) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    # the conf value is a URI on most deployments; local files strip to a path
    if wh.startswith("file:"):
        wh = wh[len("file:") :]
    return wh


def _catalog_root(spark: SparkSession) -> str:
    return os.path.join(_warehouse_dir(spark), "_native_catalog")


def _entry_path(spark: SparkSession, name: str) -> str:
    db, tbl = parse_name(name)
    return os.path.join(_catalog_root(spark), db, f"{tbl}.json")


def default_location(spark: SparkSession, name: str) -> str:
    """The warehouse location a managed table gets when none is given —
    the Hive convention ``{warehouse}/{db}.db/{table}``."""
    db, tbl = parse_name(name)
    return os.path.join(_warehouse_dir(spark), f"{db}.db", tbl)


def register_table(
    spark: SparkSession,
    name: str,
    fmt: str,
    location: str,
    partition_by: list[str] | None = None,
) -> dict:
    """Create-or-confirm a catalog entry. Idempotent for an identical
    (format, location); a conflicting re-registration raises instead of
    silently repointing the name."""
    if fmt not in _FORMATS:
        raise ValueError(f"native catalog supports {_FORMATS}, got {fmt!r}")
    location = os.path.abspath(location)
    existing = resolve_table(spark, name)
    if existing is not None:
        if existing["format"] != fmt or existing["location"] != location:
            raise ValueError(
                f"table {name!r} is already registered as "
                f"{existing['format']}:{existing['location']} — drop it "
                f"before re-registering as {fmt}:{location}"
            )
        return existing
    entry = {
        "name": name,
        "format": fmt,
        "location": location,
        "partitionBy": list(partition_by or []),
    }
    path = _entry_path(spark, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path), prefix=".tmp_catalog_"
    )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, path)  # atomic publish: readers see whole entries
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return entry


def resolve_table(spark: SparkSession, name: str) -> dict | None:
    """Look a name up; None when unregistered (callers raise their own
    actionable error so the message can name the actor)."""
    path = _entry_path(spark, name)
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def resolve_or_create(
    spark: SparkSession,
    name: str,
    fmt: str,
    partition_by: list[str] | None = None,
) -> dict:
    """Writer-side resolution: an existing entry wins (its location and
    format are authoritative — a format mismatch raises); otherwise the
    table is created managed at the warehouse default location."""
    existing = resolve_table(spark, name)
    if existing is not None:
        if existing["format"] != fmt:
            raise ValueError(
                f"table {name!r} is registered as {existing['format']!r}; "
                f"cannot write it as {fmt!r}"
            )
        return existing
    return register_table(
        spark, name, fmt, default_location(spark, name), partition_by
    )


def drop_table(spark: SparkSession, name: str) -> bool:
    """Remove the catalog entry (the data stays — DROP here is metadata
    only, like an external-table drop). Returns whether it existed."""
    path = _entry_path(spark, name)
    try:
        os.unlink(path)
        return True
    except FileNotFoundError:
        return False


def list_tables(spark: SparkSession, db: str = "default") -> list[str]:
    root = os.path.join(_catalog_root(spark), db)
    try:
        files = sorted(os.listdir(root))
    except FileNotFoundError:
        return []
    return [f"{db}.{f[:-5]}" for f in files if f.endswith(".json")]
