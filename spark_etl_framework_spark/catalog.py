"""Test-data catalog: load the driver's parquet tables and register views.

The reference's only inter-operator handoff is Spark temp views
(reference: etl/pipeline/PipelineRunner.scala:137-148). This module gives the
query layer the same convention over the driver-generated TPC-H-ish tables
(TESTDATA.md): each table registered as a temp view named after itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table. Scans stay columnar; Catalyst prunes/pushes.

    The driver's ``events`` table has carried its ``ts`` column as
    TIMESTAMP(NANOS) (readable only as long via the legacy conf) and, in
    newer testdata drops, as TIMESTAMP_NTZ. Normalize both to TIMESTAMP
    (LTZ): streaming watermarks REQUIRE the instant type
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), and with the UTC
    session timezone the NTZ→LTZ cast is value- and rendering-preserving,
    so batch/oracle string comparisons are unchanged.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view named after itself; return the DFs."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
