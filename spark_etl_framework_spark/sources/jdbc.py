"""JDBC source actor (reference: etl/source/JdbcReader.scala:10,18-23;
etl/common/JdbcActor.scala:10-27).

Uses Spark's built-in jdbc format — predicate pushdown, partitioned reads via
partitionColumn/lowerBound/upperBound/numPartitions all come from options.
Requires the JDBC driver jar on the classpath (availability-gated: the test
environment ships none, so tests cover option plumbing, not a live RDBMS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.base import Actor
from ..plans.context import JobContext


class JdbcReader(Actor):
    connect: str | None = None  # dotted path to a DBAPI connect fn (see run)
    connection_driver: str | None = None
    connection_url: str | None = None
    connection_dbtable: str | None = None
    connection_user: str | None = None
    connection_password: str | None = None
    ddlSchemaString: str | None = None  # explicit schema for the DBAPI path
    maxRows: int = 1_000_000  # DBAPI path is driver-side: hard cap, not advisory

    def jdbc_options(self) -> dict[str, str]:
        opts = {
            "driver": self.connection_driver,
            "url": self.connection_url,
            "dbtable": self.connection_dbtable,
            "user": self.connection_user,
            "password": self.connection_password,
        }
        opts = {k: str(v) for k, v in opts.items() if v is not None}
        opts.update(
            {
                k.split(".", 1)[1]: str(v)
                for k, v in self._props.items()
                if k.startswith("options.")
            }
        )
        return opts

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if self.connect:
            return self._dbapi_read(spark)
        if not self.connection_url:
            raise ValueError("JdbcReader: 'connection.url' required")
        return spark.read.format("jdbc").options(**self.jdbc_options()).load()

    def _dbapi_read(self, spark: SparkSession) -> DataFrame:
        """DBAPI fallback read (symmetric to JdbcWriter's ``connect`` hook):
        fetch ``connection.dbtable`` through a Python DBAPI connection and
        parallelize it. This is the SMALL-relation path — config/dimension
        tables pulled once onto the driver and broadcast downstream; big
        tables must use the jdbc format's partitioned reads
        (partitionColumn/lowerBound/upperBound/numPartitions), which this
        deliberately does not replicate.

        The small-relation contract is enforced, not conventional:
        ``maxRows`` (default 1M) raises if exceeded so this path can't be
        pointed at a fact table by accident. ``connection.dbtable`` must be
        a plain (possibly schema-qualified) identifier — it is interpolated
        into SQL text, so anything else is rejected. An explicit
        ``ddlSchemaString`` makes empty result sets (or all-NULL columns)
        well-typed; without it an empty table raises a clear error instead
        of Spark's opaque can-not-infer-schema."""
        import re

        from ..functions.registration import load_class

        if not self.connection_dbtable:
            raise ValueError("JdbcReader: 'connection.dbtable' required")
        if not re.fullmatch(r'[A-Za-z_][\w$]*(\.[A-Za-z_][\w$]*)?|"[^"]+"', self.connection_dbtable):
            raise ValueError(
                f"JdbcReader: 'connection.dbtable' must be a plain identifier "
                f"for the DBAPI path, got {self.connection_dbtable!r}"
            )
        max_rows = int(self.maxRows)
        conn = load_class(self.connect)(self.jdbc_options())
        try:
            cur = conn.cursor()
            cur.execute(f"SELECT * FROM {self.connection_dbtable}")  # noqa: S608
            cols = [d[0] for d in cur.description]
            # DB-API only says fetchmany(size) "should try" to return size
            # rows — a driver may return one arraysize batch per call, so a
            # single fetchmany(max_rows + 1) could silently truncate the
            # relation AND never trip the maxRows guard. Loop until the
            # cursor is exhausted or the cap is provably exceeded.
            rows: list = []
            while len(rows) <= max_rows:
                batch = cur.fetchmany(max_rows + 1 - len(rows))
                if not batch:
                    break
                rows.extend(batch)
        finally:
            conn.close()
        if len(rows) > max_rows:
            raise ValueError(
                f"JdbcReader: DBAPI read of {self.connection_dbtable!r} exceeds "
                f"maxRows={max_rows} — this is the small/config-relation path; "
                "use the jdbc format's partitioned read "
                "(partitionColumn/lowerBound/upperBound/numPartitions) instead"
            )
        if self.ddlSchemaString:
            from pyspark.sql.types import StructType

            schema = StructType.fromDDL(self.ddlSchemaString)
            # createDataFrame binds rows to the schema POSITIONALLY; if the
            # declared field names are the cursor's columns in a different
            # order, reorder the data to the schema rather than silently
            # mislabeling columns whose types happen to line up
            want = [f.name for f in schema.fields]
            if len(want) != len(cols):
                raise ValueError(
                    f"JdbcReader: ddlSchemaString declares {len(want)} fields "
                    f"but {self.connection_dbtable!r} returned {len(cols)} columns"
                )
            lower_cols = [c.lower() for c in cols]
            lower_want = [w.lower() for w in want]
            overlap = set(lower_want) & set(lower_cols)
            unambiguous = (
                len(set(lower_cols)) == len(cols) and len(set(lower_want)) == len(want)
            )
            if lower_want == lower_cols:
                pass  # same names, same order: positional == by-name
            elif set(lower_want) == set(lower_cols) and unambiguous:
                # same name set, different order, no case-duplicates on
                # either side: bind BY NAME
                idx = [lower_cols.index(w) for w in lower_want]
                rows = [tuple(r[i] for i in idx) for r in rows]
            elif overlap:
                # partial overlap is ambiguous — one typo'd field would
                # silently shift data under positional binding
                raise ValueError(
                    f"JdbcReader: ddlSchemaString fields {want} partially "
                    f"overlap cursor columns {cols}; rename all fields "
                    "(full positional rebind) or match the column names"
                )
            # disjoint names = intentional wholesale rename: positional
            return spark.createDataFrame([tuple(r) for r in rows], schema)
        if not rows:
            raise ValueError(
                f"JdbcReader: {self.connection_dbtable!r} returned no rows and no "
                "'ddlSchemaString' was given — provide one so the empty relation "
                "is well-typed"
            )
        return spark.createDataFrame([tuple(r) for r in rows], cols)
