"""SQL actors — the workhorse operators.

All relational computation is delegated to Spark SQL exactly as in the
reference (reference: etl/common/SqlActor.scala:15,21-211;
etl/transform/SqlTransformer.scala:8): multi-statement scripts with comment
stripping, ``set``/``setrun`` variables, ``${var}`` substitution; the last
statement's DataFrame is the actor output. Catalyst handles every rewrite —
no hand-scheduling.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..plans import sqlutil
from ..plans.context import JobContext
from .base import Actor


class SqlActor(Actor):
    """Generic multi-statement SQL actor (reference: etl/common/SqlActor.scala).

    Properties: ``sqlString`` (inline) or ``sqlFile`` (path). Statements are
    split on ';' with comments stripped; ``set name = value`` records a
    variable (resolved against config vars immediately), ``setrun name =
    <query>`` executes the query at run time and records its first row/column
    as the variable, and other statements execute via ``spark.sql`` with all
    variables substituted. Variables recorded here are visible to later
    actors' deferred properties (runner-owned state replaces the reference's
    session-conf smuggling — reference: etl/common/Actor.scala:83-109).
    """

    sqlString: str | None = None
    sqlFile: str | None = None
    DEFERRED_KEYS = ("sqlString",)

    def _sql_text(self) -> str:
        if self.sqlString:
            return self.sqlString
        if self.sqlFile:
            return Path(self.sqlFile).read_text()
        raise ValueError(f"{type(self).__name__}: sqlString or sqlFile required")

    def _check(self, stmt: str) -> None:
        """Statement gate — subclasses constrain what they accept."""

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        variables = ctx.variables
        last: DataFrame | None = None
        for st in sqlutil.classify_statements(self._sql_text(), variables):
            if st.kind == "set":
                variables[st.name] = st.text
            elif st.kind == "setrun":
                # executed at run time; first row/col becomes the value
                # (reference: etl/common/SqlActor.scala:79-85,142-150)
                q = sqlutil.substitute(st.text, variables)
                row = spark.sql(q).first()
                variables[st.name] = str(row[0]) if row is not None else ""
            else:
                stmt = sqlutil.substitute(st.text, variables)
                self._check(stmt)
                # count relations for the auto-cache policy BEFORE execution
                for rel in sqlutil.extract_relations(stmt):
                    ctx.reference(rel)
                last = spark.sql(stmt)
        return last


class SqlTransformer(SqlActor):
    """Alias of SqlActor (reference: etl/transform/SqlTransformer.scala:8)."""


class SqlReader(SqlActor):
    """SQL actor whose statements must be queries
    (reference: etl/source/SqlReader.scala:10-21)."""

    def _check(self, stmt: str) -> None:
        if not sqlutil.is_query(stmt):
            raise ValueError(f"SqlReader only accepts queries, got: {stmt[:80]!r}")


class SqlWriter(SqlActor):
    """SQL actor constrained to DML — insert/update/merge/delete on
    delta/iceberg/catalog tables (reference: etl/sink/SqlWriter.scala:10-21)."""

    def _check(self, stmt: str) -> None:
        if not sqlutil.is_dml(stmt):
            raise ValueError(f"SqlWriter only accepts DML, got: {stmt[:80]!r}")


class SqlTableReader(Actor):
    """``spark.table(name)`` + optional filter predicate
    (reference: etl/source/SqlTableReader.scala:11,24-33)."""

    table: str | None = None
    filter: str | None = None
    DEFERRED_KEYS = ("table", "filter")

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.table:
            raise ValueError("SqlTableReader: 'table' required")
        ctx.reference(self.table)
        df = spark.table(self.table)
        if self.filter:
            df = df.filter(self.filter)  # predicate string → Catalyst pushdown
        return df


class SqlTableWriter(Actor):
    """Write a view into a catalog table; overwrite→saveAsTable,
    append→insertInto; optional repartition/coalesce pre-write
    (reference: etl/sink/SqlTableWriter.scala:12,33-46)."""

    table: str | None = None
    mode: str = "append"
    numPartitions: int | None = None
    partitionBy: str | None = None
    coalesce: int | None = None
    view: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.table or not self.view:
            raise ValueError("SqlTableWriter: 'table' and input view required")
        df = spark.table(self.view)
        if self.numPartitions:
            cols = [c.strip() for c in (self.partitionBy or "").split(",") if c.strip()]
            df = df.repartition(int(self.numPartitions), *cols) if cols else df.repartition(
                int(self.numPartitions)
            )
        elif self.coalesce:
            df = df.coalesce(int(self.coalesce))
        if self.mode == "overwrite":
            df.write.mode("overwrite").saveAsTable(self.table)
        else:
            df.write.insertInto(self.table)
        return None
