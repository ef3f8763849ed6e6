"""User UDF plug-in surface (reference: etl/common/UdfRegister.scala:16,
README.md:56-90): user classes register UDFs under a name prefix; classes are
loaded by dotted path with importlib (replacing Scala Class.forName).
"""

from __future__ import annotations

import importlib

from pyspark.sql import SparkSession


class UdfProvider:
    """Subclass and override ``register(prefix, spark)``."""

    def register(self, prefix: str, spark: SparkSession) -> None:
        raise NotImplementedError


def load_class(dotted: str):
    mod, _, cls = dotted.rpartition(".")
    return getattr(importlib.import_module(mod), cls)


def register_udfs(spark: SparkSession, registrations) -> None:
    """Apply a pipeline's udf-registration list
    (reference: etl/pipeline/definition/UdfRegistration.scala:15-20)."""
    for reg in registrations:
        provider = load_class(reg.cls)()
        provider.register(reg.prefix or "", spark)
