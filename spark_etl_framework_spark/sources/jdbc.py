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
    connection_driver: str | None = None
    connection_url: str | None = None
    connection_dbtable: str | None = None
    connection_user: str | None = None
    connection_password: str | None = None

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
        if not self.connection_url:
            raise ValueError("JdbcReader: 'connection.url' required")
        return spark.read.format("jdbc").options(**self.jdbc_options()).load()
