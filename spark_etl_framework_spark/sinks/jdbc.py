"""JDBC sink actor with merge semantics (reference: etl/sink/JdbcWriter.scala:
14,36-80; etl/sink/process/JdbcContinuousWriter.scala:96-221).

Non-merge modes go through Spark's jdbc writer. ``merge`` executes a
parameterized sink statement (``@field`` placeholders) per row batch via
``foreachPartition`` + a DBAPI connection — the PySpark-idiomatic equivalent
of the reference's per-partition JDBC prepared statements. A DBAPI connect
callable is injected (dotted path) because no JDBC drivers ship here; the
partition/batch discipline (``numPartitions`` connections × ``batchSize``
rows, reference defaults 16×1600) is the part that matters at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..functions.registration import load_class
from ..operators.base import Actor
from ..plans.context import JobContext

_PARAM = re.compile(r"@(\w+)")


def rewrite_param_sql(sql: str) -> tuple[str, list[str]]:
    """``insert ... values(@user, @ts)`` → (qmark SQL, [field order])
    (reference: JdbcContinuousWriter.scala:210-221)."""
    fields: list[str] = []

    def repl(m: re.Match) -> str:
        fields.append(m.group(1))
        return "?"

    return _PARAM.sub(repl, sql), fields


class JdbcWriter(Actor):
    """modes: overwrite/append (spark jdbc) or merge (parameterized batch)."""

    mode: str = "append"
    sinkStatement: str | None = None
    sinkStatementFile: str | None = None
    numPartitions: int | None = None
    batchSize: int | None = None
    connect: str | None = None  # dotted path to a zero/conf-arg DBAPI connect fn
    view: str | None = None
    connection_driver: str | None = None
    connection_url: str | None = None
    connection_dbtable: str | None = None
    connection_user: str | None = None
    connection_password: str | None = None
    DEFERRED_KEYS = ("sinkStatement",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.view:
            raise ValueError("JdbcWriter: input view required")
        df = spark.table(self.view)
        ctx.reference(self.view)
        if self.mode not in ("overwrite", "append", "merge"):
            raise ValueError(f"JdbcWriter: bad mode {self.mode!r}")
        if self.mode == "merge":
            self._merge(ctx, df)
            return None
        opts = {
            "driver": self.connection_driver,
            "url": self.connection_url,
            "dbtable": self.connection_dbtable,
            "user": self.connection_user,
            "password": self.connection_password,
        }
        opts = {k: str(v) for k, v in opts.items() if v is not None}
        df.write.format("jdbc").options(**opts).mode(self.mode).save()
        return None

    def _merge(self, ctx: JobContext, df: DataFrame) -> None:
        stmt = self.sinkStatement
        if not stmt and self.sinkStatementFile:
            from pathlib import Path

            stmt = Path(self.sinkStatementFile).read_text()
        if not stmt or not self.connect:
            raise ValueError("JdbcWriter merge: 'sinkStatement' and 'connect' required")
        sql, fields = rewrite_param_sql(stmt)
        n_conn = int(self.numPartitions or ctx.pipeline.io_connections)
        batch = int(self.batchSize or ctx.pipeline.io_batch_size)
        connect_path = self.connect
        # connection.* props ship to executors inside the closure — the
        # connect callable may take them as its single argument
        conn_opts = {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("connection.")
        }

        def write_partition(rows) -> None:
            connect = load_class(connect_path)
            try:
                conn = connect(conn_opts)
            except TypeError:
                conn = connect()
            try:
                cur = conn.cursor()
                buf = []
                for row in rows:
                    d = row.asDict()
                    buf.append(tuple(d.get(f) for f in fields))
                    if len(buf) >= batch:
                        cur.executemany(sql, buf)
                        conn.commit()
                        buf = []
                if buf:
                    cur.executemany(sql, buf)
                    conn.commit()
            finally:
                conn.close()

        # bound concurrent connections to n_conn (reference default 16)
        if df.rdd.getNumPartitions() > n_conn:
            df = df.coalesce(n_conn)
        df.foreachPartition(write_partition)
