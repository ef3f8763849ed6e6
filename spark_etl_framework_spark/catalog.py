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

    The driver's ``events`` table carries TIMESTAMP(NANOS) which Spark's
    parquet reader rejects natively; we read nanos as long (legacy conf) and
    rebuild a microsecond timestamp with integer division — no precision lost
    beyond the ns→µs truncation, no driver-side round-trip.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
