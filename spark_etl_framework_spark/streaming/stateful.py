"""Arbitrary stateful stream transformation.

The reference loads a user class implementing
``ArbitraryStatefulProcessor.transformState(df)`` that applies Scala
``mapGroupsWithState`` (reference: etl/transform/StreamStatefulTransformer.
scala:13,28-49; etl/common/stream/ArbitraryStatefulProcessor.scala:10). The
PySpark-idiomatic equivalent is ``applyInPandasWithState``: grouped pandas
batches + schema-declared state + timeout conf. We keep the reference's
plug-in contract (a user class loaded by dotted path) but define it as a
Python ABC whose hook receives (key, pandas batches, GroupState).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.registration import load_class
from ..operators.base import Actor
from ..plans.context import JobContext


class ArbitraryStatefulProcessor:
    """User contract for custom stateful streaming logic.

    Subclasses declare the group keys + schemas and implement
    ``process_group``; ``transform_state`` wires it into
    ``applyInPandasWithState``.
    """

    #: grouping columns
    group_keys: tuple[str, ...] = ()
    #: output schema (DDL string)
    output_schema: str = ""
    #: state schema (DDL string)
    state_schema: str = ""
    #: append | update
    output_mode: str = "update"
    #: NoTimeout | ProcessingTimeTimeout | EventTimeTimeout
    timeout_conf: str = "NoTimeout"

    def process_group(
        self, key: tuple, batches: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        """Called once per key per trigger with the key's new rows and its
        GroupState; yield zero or more output pandas DataFrames."""
        raise NotImplementedError

    def transform_state(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.group_keys).applyInPandasWithState(
            self.process_group,
            outputStructType=self.output_schema,
            stateStructType=self.state_schema,
            outputMode=self.output_mode,
            timeoutConf=self.timeout_conf,
        )


class StreamStatefulTransformer(Actor):
    """Load a processor class (``processor.type``) and apply it to the input
    view (reference: etl/transform/StreamStatefulTransformer.scala:28-49).
    Timeout properties are forwarded onto the processor instance."""

    processor_type: str | None = None
    processor_timeoutType: str | None = None
    view: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.processor_type or not self.view:
            raise ValueError("StreamStatefulTransformer: processor.type and view required")
        processor: ArbitraryStatefulProcessor = load_class(self.processor_type)()
        if self.processor_timeoutType:
            processor.timeout_conf = self.processor_timeoutType
        df = spark.table(self.view)
        return processor.transform_state(df)
