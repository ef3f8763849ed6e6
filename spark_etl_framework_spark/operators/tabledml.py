"""Row-level DML and table maintenance as PIPELINE ACTORS.

The reference expresses work as YAML actors; round 8's jar-free DML
family (deltalog.py / iceberg.py) gets the same framework surface, so a
pipeline can delete / update / merge / vacuum / compact a lakehouse
table declaratively — the shape the reference reaches only via
``SqlWriter`` isDML on catalog tables (etl/write/SqlWriter.scala).

Both actors share the option surface:

- ``op``: delete | update | merge | vacuum | optimize | history
- ``path``/``table``: the table location (names resolve through the
  native catalog for delta/iceberg, sources/catalog.py)
- ``predicate``: DELETE/UPDATE row filter
- ``set.<col>``: UPDATE assignments (SQL expressions over the pre-update
  row)
- ``sourceView`` + ``keys``: MERGE input view and comma-separated keys
- ``useDVs`` (delta DELETE): deletion vectors instead of copy-on-write
- ``retentionMs`` (vacuum)
- ``view``: where ``history`` / ``metadata`` output registers
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.context import JobContext
from .base import Actor


class _TableDmlBase(Actor):
    op: str | None = None
    path: str | None = None
    table: str | None = None
    predicate: str | None = None
    sourceView: str | None = None
    keys: str | None = None
    retentionMs: int = 7 * 24 * 3600 * 1000
    view: str | None = None

    _FORMAT = ""

    def _location(self, spark: SparkSession) -> str:
        target = self.path or self.table
        if not target:
            raise ValueError(f"{type(self).__name__}: path|table required")
        if "/" not in target:
            from ..sources.catalog import resolve_table

            entry = resolve_table(spark, target)
            if entry is None or entry["format"] != self._FORMAT:
                raise ValueError(
                    f"table {target!r} is not a {self._FORMAT} table in "
                    "the native catalog"
                )
            target = entry["location"]
        return target

    def _assignments(self) -> dict[str, str]:
        out = {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("set.")
        }
        if not out:
            raise ValueError(f"{type(self).__name__}: update needs set.<col>")
        return out

    def _merge_inputs(self, ctx: JobContext, spark: SparkSession):
        if not self.sourceView or not self.keys:
            raise ValueError(
                f"{type(self).__name__}: merge needs sourceView and keys"
            )
        ctx.reference(self.sourceView)
        return (
            spark.table(self.sourceView),
            [k.strip() for k in self.keys.split(",") if k.strip()],
        )


class DeltaDmlActor(_TableDmlBase):
    """DML on a delta table through the pure-Python ``_delta_log``
    writer (sources/deltalog.py): pruned-COW / deletion-vector DELETE,
    UPDATE, MERGE upsert, VACUUM, OPTIMIZE (round 12: real bin-packing
    compaction / ``zOrderBy`` layout rewrite via
    :func:`deltalog.optimize_compact` — DV files always qualify, so it
    subsumes the earlier purge-only behavior; ``targetSize``,
    ``minFiles``), DESCRIBE HISTORY into a view, and the column-mapping DDL family (round 9):
    ``enableColumnMapping``, metadata-only ``renameColumn``
    (``oldColumn``/``newColumn``) and ``dropColumn`` (``column``);
    ``checkpointV2`` (round 10) emits the sidecar checkpoint layout
    (``checkpointParts``); ``enableIct`` (in-commit timestamps) and
    ``widenColumn`` (``column`` + ``newType`` — ALTER COLUMN TYPE via
    the typeWidening feature, round 12)."""

    useDVs: bool = False
    oldColumn: str | None = None
    newColumn: str | None = None
    column: str | None = None
    constraintName: str | None = None
    version: int | None = None
    partitionBy: str | None = None
    partitionSchema: str | None = None
    checkpointParts: int = 1
    #: target type for op=widenColumn (round 12 — ALTER COLUMN TYPE,
    #: the typeWidening feature; spec-allowed transitions only)
    newType: str | None = None
    #: op=optimize options (round 12 — real bin-pack/Z-ORDER OPTIMIZE):
    #: comma-separated Z-ORDER columns, target output file size, and the
    #: minimum small-file group size worth rewriting
    zOrderBy: str | None = None
    targetSize: int = 128 * 1024 * 1024
    minFiles: int = 2
    #: op=clone target (round 12 — SHALLOW CLONE; `path` is the source,
    #: `version` optionally pins the cloned snapshot)
    targetPath: str | None = None
    #: op=dropFeature (round 12 — protocol downgrade; truncateHistory
    #: required for reader-impacting features)
    feature: str | None = None
    truncateHistory: bool = False
    #: op=compactLog (round 12 — the spec's minor compactions:
    #: <start>.<end>.compacted.json reconciled-action files)
    startVersion: int | None = None
    endVersion: int | None = None
    #: op=addColumn (round 14): column name/type with an optional
    #: DEFAULT (the allowColumnDefaults writer feature)
    columnName: str | None = None
    columnType: str | None = None
    columnDefault: str | None = None
    _FORMAT = "delta"

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sources import deltalog as dl

        loc = self._location(spark)
        op = (self.op or "").lower()
        if op == "delete":
            if not self.predicate:
                raise ValueError("DeltaDmlActor: delete needs predicate")
            dl.delete_where(spark, loc, self.predicate, use_dvs=self.useDVs)
            return None
        if op == "update":
            if not self.predicate:
                raise ValueError("DeltaDmlActor: update needs predicate")
            dl.update_where(spark, loc, self.predicate, self._assignments())
            return None
        if op == "merge":
            src, keys = self._merge_inputs(ctx, spark)
            dl.merge_upsert(spark, loc, src, keys)
            return None
        if op == "vacuum":
            dl.vacuum(spark, loc, retention_ms=int(self.retentionMs))
            return None
        if op == "optimize":
            # full OPTIMIZE (round 12): bin-packing by default — DV
            # files always qualify, so this subsumes the old purge-only
            # behavior — or Z-ORDER when zOrderBy names columns
            zcols = [
                c.strip() for c in (self.zOrderBy or "").split(",")
                if c.strip()
            ]
            dl.optimize_compact(
                spark, loc,
                target_file_size=int(self.targetSize),
                min_files=int(self.minFiles),
                zorder_by=zcols or None,
            )
            return None
        if op == "history":
            df = dl.table_history(spark, loc)
            if self.view:
                df.createOrReplaceTempView(self.view)
            return df
        if op == "enablecolumnmapping":
            dl.enable_column_mapping(loc)
            return None
        if op == "renamecolumn":
            if not self.oldColumn or not self.newColumn:
                raise ValueError(
                    "DeltaDmlActor: renameColumn needs oldColumn and newColumn"
                )
            dl.rename_column(loc, self.oldColumn, self.newColumn)
            return None
        if op == "dropcolumn":
            if not self.column:
                raise ValueError("DeltaDmlActor: dropColumn needs column")
            dl.drop_column(loc, self.column)
            return None
        if op == "addconstraint":
            if not self.constraintName or not self.predicate:
                raise ValueError(
                    "DeltaDmlActor: addConstraint needs constraintName "
                    "and predicate"
                )
            dl.add_check_constraint(
                spark, loc, self.constraintName, self.predicate
            )
            return None
        if op == "dropconstraint":
            if not self.constraintName:
                raise ValueError(
                    "DeltaDmlActor: dropConstraint needs constraintName"
                )
            dl.drop_check_constraint(loc, self.constraintName)
            return None
        if op == "restore":
            if self.version is None:
                raise ValueError("DeltaDmlActor: restore needs version")
            dl.restore_table(spark, loc, int(self.version))
            return None
        if op == "convert":
            parts = [
                c.strip() for c in (self.partitionBy or "").split(",")
                if c.strip()
            ]
            dl.convert_to_delta(
                spark, loc, partition_by=parts or None,
                partition_schema=self.partitionSchema,
            )
            return None
        if op == "checkpointv2":
            dl.write_checkpoint_v2(loc, parts=int(self.checkpointParts))
            return None
        if op == "enableuniform":
            dl.enable_uniform(loc)
            return None
        if op == "enableict":
            dl.enable_in_commit_timestamps(loc)
            return None
        if op == "enablerowtracking":
            dl.enable_row_tracking(spark, loc)
            return None
        if op == "setproperties":
            props = {
                k.split(".", 1)[1]: str(v)
                for k, v in self._props.items()
                if k.startswith("set.")
            }
            if not props:
                raise ValueError(
                    "DeltaDmlActor: setProperties needs set.<property>"
                )
            dl.set_table_properties(loc, props)
            return None
        if op == "compactlog":
            if self.startVersion is None or self.endVersion is None:
                raise ValueError(
                    "DeltaDmlActor: compactLog needs startVersion and "
                    "endVersion"
                )
            dl.write_log_compaction(
                loc, int(self.startVersion), int(self.endVersion)
            )
            return None
        if op == "dropfeature":
            if not self.feature:
                raise ValueError("DeltaDmlActor: dropFeature needs feature")
            dl.drop_feature(
                spark, loc, self.feature,
                truncate_history=bool(self.truncateHistory),
            )
            return None
        if op == "clone":
            if not self.targetPath:
                raise ValueError("DeltaDmlActor: clone needs targetPath")
            dl.shallow_clone(
                spark, loc, self.targetPath,
                version=int(self.version) if self.version is not None else None,
            )
            return None
        if op == "widencolumn":
            if not self.column or not self.newType:
                raise ValueError(
                    "DeltaDmlActor: widenColumn needs column and newType"
                )
            dl.widen_column_type(loc, self.column, self.newType)
            return None
        if op == "addcolumn":
            # ADD COLUMN [DEFAULT] (round 14 — the delta half of the
            # iceberg addColumn op; allowColumnDefaults writer feature)
            if not self.columnName or not self.columnType:
                raise ValueError(
                    "DeltaDmlActor: addColumn needs columnName + columnType"
                )
            default = self.columnDefault
            ct = self.columnType.lower()
            if default is not None and ct in ("int", "integer", "bigint",
                                              "long"):
                default = int(default)
            elif default is not None and ct in ("float", "double"):
                default = float(default)
            elif default is not None and ct == "boolean":
                default = str(default).lower() == "true"
            dl.add_column(loc, self.columnName, self.columnType,
                          default=default)
            return None
        raise ValueError(f"DeltaDmlActor: unknown op {self.op!r}")


class IcebergDmlActor(_TableDmlBase):
    """DML on an iceberg table through the pure-Python v2 writer
    (sources/iceberg.py): merge-on-read DELETE, atomic row-delta UPDATE,
    equality-delete MERGE, REWRITE (round 12: the jar's strategy surface
    — ``strategy`` fold | binpack | sort | zorder with ``sortBy``/
    ``zOrderBy``/``targetSize``; default folds deletes), position-delete
    compaction (``rewritePositionDeletes``), Puffin statistics
    (``analyze`` + ``columns``), metadata tables into a view
    (``metadataTable``: snapshots | history | files | statistics | refs
    | manifests | partitions), and
    the snapshot-ref family (round 10): ``createTag`` / ``createBranch``
    (``refName``, optional ``snapshotId``, ``overwriteRef``) and
    ``dropRef`` — the spec's refs map, read back through
    iceberg-reader ``options.tag`` / ``options.branch``. Round 11 adds
    the spec's per-ref retention fields (``maxRefAgeMs``,
    ``minSnapshotsToKeep``, ``maxSnapshotAgeMs`` on createTag/
    createBranch — honored by ``expireSnapshots``) and ``cherrypick``
    (``snapshotId`` or ``wapId``) — publishing a ``wap.id``-staged
    commit onto main, the session half of write-audit-publish."""

    metadataTable: str = "snapshots"
    #: op=optimize strategy surface (round 12 — the jar's
    #: rewrite_data_files strategies) and op=analyze column list
    strategy: str | None = None
    sortBy: str | None = None
    zOrderBy: str | None = None
    targetSize: int = 128 * 1024 * 1024
    columns: str | None = None
    snapshotId: int | None = None
    olderThanMs: int | None = None
    retainLast: int = 1
    partitionBy: str | None = None
    partitionSchema: str | None = None
    refName: str | None = None
    overwriteRef: bool = False
    toRef: str = "main"
    maxRefAgeMs: int | None = None
    minSnapshotsToKeep: int | None = None
    maxSnapshotAgeMs: int | None = None
    wapId: str | None = None
    #: op=addColumn / op=upgradeFormat (round 13): column name/type with
    #: an optional v3 default; target format version
    columnName: str | None = None
    columnType: str | None = None
    columnDefault: str | None = None
    formatVersion: int = 3
    #: op=renameColumn / op=dropColumn / op=updateColumnType (round 14):
    #: metadata-only schema evolution by field id — existing data files
    #: never rewrite
    oldColumn: str | None = None
    newColumn: str | None = None
    column: str | None = None
    newType: str | None = None
    _FORMAT = "iceberg"

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sources import iceberg as ice

        loc = self._location(spark)
        op = (self.op or "").lower()
        if op == "delete":
            if not self.predicate:
                raise ValueError("IcebergDmlActor: delete needs predicate")
            ice.delete_where(spark, loc, self.predicate)
            return None
        if op == "update":
            if not self.predicate:
                raise ValueError("IcebergDmlActor: update needs predicate")
            ice.update_where(spark, loc, self.predicate, self._assignments())
            return None
        if op == "merge":
            src, keys = self._merge_inputs(ctx, spark)
            ice.merge_upsert(spark, loc, src, keys)
            return None
        if op in ("optimize", "rewrite"):
            # round 12: the jar's strategy surface — binpack / sort /
            # zorder rewrites; default stays the delete-folding pass
            zcols = [
                c.strip() for c in (self.zOrderBy or "").split(",")
                if c.strip()
            ]
            scols = [
                c.strip() for c in (self.sortBy or "").split(",")
                if c.strip()
            ]
            strategy = self.strategy or (
                "zorder" if zcols else "sort" if scols else "fold"
            )
            ice.rewrite_data_files(
                spark, loc, strategy=strategy,
                sort_by=scols or None, zorder_by=zcols or None,
                target_file_size=int(self.targetSize),
            )
            return None
        if op == "rewritemanifests":
            ice.rewrite_manifests(loc)
            return None
        if op == "upgradeformat":
            ice.upgrade_format_version(loc, int(self.formatVersion))
            return None
        if op == "addcolumn":
            if not self.columnName or not self.columnType:
                raise ValueError(
                    "IcebergDmlActor: addColumn needs columnName + "
                    "columnType"
                )
            default = self.columnDefault
            if default is not None and self.columnType in (
                "int", "long",
            ):
                default = int(default)
            elif default is not None and self.columnType in (
                "float", "double",
            ):
                default = float(default)
            elif default is not None and self.columnType == "boolean":
                default = str(default).lower() == "true"
            ice.add_column(
                loc, self.columnName, self.columnType, default=default
            )
            return None
        if op == "renamecolumn":
            if not self.oldColumn or not self.newColumn:
                raise ValueError(
                    "IcebergDmlActor: renameColumn needs oldColumn + "
                    "newColumn"
                )
            ice.rename_column(loc, self.oldColumn, self.newColumn)
            return None
        if op == "dropcolumn":
            if not self.column:
                raise ValueError("IcebergDmlActor: dropColumn needs column")
            ice.drop_column(loc, self.column)
            return None
        if op == "updatecolumntype":
            # ALTER COLUMN TYPE (round 14): spec type promotion —
            # mirrors the delta actor's widenColumn
            if not self.column or not self.newType:
                raise ValueError(
                    "IcebergDmlActor: updateColumnType needs column + "
                    "newType"
                )
            ice.update_column_type(loc, self.column, self.newType)
            return None
        if op == "setidentifierfields":
            # SET IDENTIFIER FIELDS (round 14): the changelog
            # compute_updates identity; empty `columns` clears it
            cols = [
                c.strip() for c in (self.columns or "").split(",")
                if c.strip()
            ]
            ice.set_identifier_fields(loc, cols)
            return None
        if op == "rewritepositiondeletes":
            ice.rewrite_position_delete_files(spark, loc)
            return None
        if op == "partitionstats":
            ice.compute_partition_stats(spark, loc)
            return None
        if op == "analyze":
            ice.analyze_table(
                spark, loc,
                columns=[
                    c.strip() for c in (self.columns or "").split(",")
                    if c.strip()
                ] or None,
            )
            return None
        if op == "history":
            df = ice.read_meta(spark, loc, self.metadataTable)
            if self.view:
                df.createOrReplaceTempView(self.view)
            return df
        if op == "rollback":
            if self.snapshotId is None:
                raise ValueError("IcebergDmlActor: rollback needs snapshotId")
            ice.rollback_to_snapshot(loc, int(self.snapshotId))
            return None
        if op == "expiresnapshots":
            ice.expire_snapshots(
                loc,
                older_than_ms=(
                    int(self.olderThanMs) if self.olderThanMs is not None
                    else None
                ),
                retain_last=int(self.retainLast),
            )
            return None
        if op in ("createtag", "createbranch"):
            if not self.refName:
                raise ValueError(f"IcebergDmlActor: {op} needs refName")
            ice.create_ref(
                loc,
                self.refName,
                kind="tag" if op == "createtag" else "branch",
                snapshot_id=(
                    int(self.snapshotId) if self.snapshotId is not None
                    else None
                ),
                overwrite=bool(self.overwriteRef),
                max_ref_age_ms=(
                    int(self.maxRefAgeMs) if self.maxRefAgeMs is not None
                    else None
                ),
                min_snapshots_to_keep=(
                    int(self.minSnapshotsToKeep)
                    if self.minSnapshotsToKeep is not None else None
                ),
                max_snapshot_age_ms=(
                    int(self.maxSnapshotAgeMs)
                    if self.maxSnapshotAgeMs is not None else None
                ),
            )
            return None
        if op == "cherrypick":
            ice.cherrypick_snapshot(
                loc,
                snapshot_id=(
                    int(self.snapshotId) if self.snapshotId is not None
                    else None
                ),
                wap_id=self.wapId,
            )
            return None
        if op == "dropref":
            if not self.refName:
                raise ValueError("IcebergDmlActor: dropRef needs refName")
            ice.drop_ref(loc, self.refName)
            return None
        if op == "fastforward":
            if not self.refName:
                raise ValueError("IcebergDmlActor: fastForward needs refName")
            ice.fast_forward(loc, self.refName, to=self.toRef)
            return None
        if op == "convert":
            parts = [
                c.strip() for c in (self.partitionBy or "").split(",")
                if c.strip()
            ]
            ice.convert_to_iceberg(
                spark, loc, partition_by=parts or None,
                partition_schema=self.partitionSchema,
            )
            return None
        raise ValueError(f"IcebergDmlActor: unknown op {self.op!r}")
