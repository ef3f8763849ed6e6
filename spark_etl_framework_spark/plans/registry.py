"""Actor registry: alias → class resolution.

The reference instantiates actors reflectively from fully-qualified class
names with user-defined aliases (reference: etl/pipeline/builder/
JsonPipelineBuilder.scala:265). Here: built-in short aliases for every
shipped actor + dotted-path importlib fallback for user plug-ins.
"""

from __future__ import annotations

from ..functions.registration import load_class

#: alias → "module:Class" within this package
_BUILTIN = {
    "file-reader": "spark_etl_framework_spark.sources.file.FileReader",
    "flat-file-reader": "spark_etl_framework_spark.sources.file.FlatFileReader",
    "binary-file-reader": "spark_etl_framework_spark.sources.file.BinaryFileReader",
    "jdbc-reader": "spark_etl_framework_spark.sources.jdbc.JdbcReader",
    "kafka-reader": "spark_etl_framework_spark.sources.connectors.KafkaReader",
    "delta-reader": "spark_etl_framework_spark.sources.connectors.DeltaReader",
    "iceberg-reader": "spark_etl_framework_spark.sources.connectors.IcebergReader",
    "sql-reader": "spark_etl_framework_spark.operators.sql.SqlReader",
    "sql-table-reader": "spark_etl_framework_spark.operators.sql.SqlTableReader",
    "sql": "spark_etl_framework_spark.operators.sql.SqlActor",
    "sql-transformer": "spark_etl_framework_spark.operators.sql.SqlTransformer",
    "stream-stateful-transformer": "spark_etl_framework_spark.streaming.stateful.StreamStatefulTransformer",
    "containment-dedup-transformer": "spark_etl_framework_spark.operators.curation.ContainmentDedupTransformer",
    "lsh-index-builder": "spark_etl_framework_spark.operators.indexing.LshIndexBuilder",
    "lsh-index-probe": "spark_etl_framework_spark.operators.indexing.LshIndexProbe",
    "ann-index-builder": "spark_etl_framework_spark.operators.indexing.AnnIndexBuilder",
    "ann-index-probe": "spark_etl_framework_spark.operators.indexing.AnnIndexProbe",
    "pii-scrub-transformer": "spark_etl_framework_spark.operators.curation.PiiScrubTransformer",
    "scd2-merge-transformer": "spark_etl_framework_spark.operators.curation.Scd2MergeTransformer",
    "bpe-train-transformer": "spark_etl_framework_spark.operators.curation.BpeTrainTransformer",
    "schema-validator": "spark_etl_framework_spark.operators.validators.SchemaValidator",
    "sql-data-validator": "spark_etl_framework_spark.operators.validators.SqlDataValidator",
    "view-partitioner": "spark_etl_framework_spark.operators.utils.ViewPartitioner",
    "variable-setter": "spark_etl_framework_spark.operators.utils.VariableSetter",
    "spark-conf": "spark_etl_framework_spark.operators.utils.SparkConfActor",
    "file-writer": "spark_etl_framework_spark.sinks.file.FileWriter",
    "jdbc-writer": "spark_etl_framework_spark.sinks.jdbc.JdbcWriter",
    "kafka-writer": "spark_etl_framework_spark.sinks.connectors.KafkaWriter",
    "delta-writer": "spark_etl_framework_spark.sinks.connectors.DeltaWriter",
    "delta-dml": "spark_etl_framework_spark.operators.tabledml.DeltaDmlActor",
    "iceberg-dml": "spark_etl_framework_spark.operators.tabledml.IcebergDmlActor",
    "iceberg-writer": "spark_etl_framework_spark.sinks.connectors.IcebergWriter",
    "sql-writer": "spark_etl_framework_spark.operators.sql.SqlWriter",
    "sql-table-writer": "spark_etl_framework_spark.operators.sql.SqlTableWriter",
    "file-stream-reader": "spark_etl_framework_spark.streaming.readers.FileStreamReader",
    "flat-stream-reader": "spark_etl_framework_spark.streaming.readers.FlatStreamReader",
    "kafka-stream-reader": "spark_etl_framework_spark.streaming.readers.KafkaStreamReader",
    "delta-stream-reader": "spark_etl_framework_spark.streaming.readers.DeltaStreamReader",
    "iceberg-stream-reader": "spark_etl_framework_spark.streaming.readers.IcebergStreamReader",
    "redis-stream-reader": "spark_etl_framework_spark.streaming.readers.RedisStreamReader",
    "file-stream-writer": "spark_etl_framework_spark.streaming.writers.FileStreamWriter",
    "memory-stream-writer": "spark_etl_framework_spark.streaming.writers.MemoryStreamWriter",
    "kafka-stream-writer": "spark_etl_framework_spark.streaming.writers.KafkaStreamWriter",
    "jdbc-stream-writer": "spark_etl_framework_spark.streaming.writers.JdbcStreamWriter",
    "delta-stream-writer": "spark_etl_framework_spark.streaming.writers.DeltaStreamWriter",
    "iceberg-stream-writer": "spark_etl_framework_spark.streaming.writers.IcebergStreamWriter",
    "foreachbatch-stream-writer": "spark_etl_framework_spark.streaming.writers.ForeachBatchConnectorStreamWriter",
    "hbase-reader": "spark_etl_framework_spark.sources.optional.HBaseReader",
    "mongo-reader": "spark_etl_framework_spark.sources.optional.MongoReader",
    "redis-reader": "spark_etl_framework_spark.sources.optional.RedisReader",
    "flight-reader": "spark_etl_framework_spark.sources.optional.FlightReader",
    "hbase-writer": "spark_etl_framework_spark.sinks.optional.HBaseWriter",
    "mongo-writer": "spark_etl_framework_spark.sinks.optional.MongoWriter",
    "redis-writer": "spark_etl_framework_spark.sinks.optional.RedisWriter",
    "flight-writer": "spark_etl_framework_spark.sinks.optional.FlightWriter",
}


def resolve_actor(type_name: str, aliases: dict[str, str] | None = None):
    """Resolve an actor type (pipeline alias > built-in alias > dotted path)."""
    name = (aliases or {}).get(type_name, type_name)
    name = _BUILTIN.get(name, name)
    return load_class(name)
