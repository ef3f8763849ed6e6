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


class ArbitraryStatefulProcessorV2:
    """Same plug-in contract on Spark 4's ``transformWithStateInPandas`` —
    the successor API to ``applyInPandasWithState`` (RocksDB-backed state,
    composable typed state variables, timers). Subclasses declare keys +
    schemas and implement ``handle_input``; ``transform_state`` wires a
    ``StatefulProcessor`` adapter into the new API.

    Availability-gated in this environment: the API's Python worker needs
    the ``protobuf`` package (``google.protobuf.descriptor``), which is
    not installed here (verified: StreamingPythonRunner crashes with
    ImportError) — ``transform_state`` raises a clear unavailable-error
    up front instead. On an environment with protobuf, it runs as-is with
    ``spark.sql.streaming.stateStore.providerClass`` set to the
    RocksDBStateStoreProvider.
    """

    group_keys: tuple[str, ...] = ()
    output_schema: str = ""
    state_schema: str = ""
    #: Update | Append
    output_mode: str = "Update"
    #: None | ProcessingTime | EventTime
    time_mode: str = "None"

    def handle_input(
        self, key: tuple, batches: Iterator[pd.DataFrame], value_state: Any
    ) -> Iterator[pd.DataFrame]:
        """Called per key per trigger; ``value_state`` is the handle's
        ValueState for ``state_schema`` (exists()/get()/update())."""
        raise NotImplementedError

    def transform_state(self, df: DataFrame) -> DataFrame:
        try:
            from google.protobuf import descriptor  # noqa: F401
            from pyspark.sql.streaming import StatefulProcessor  # Spark 4+
        except ImportError as e:
            raise RuntimeError(
                "transformWithStateInPandas unavailable: it needs Spark 4's "
                "StatefulProcessor API plus the 'protobuf' python package "
                f"(missing here: {e}). Use the applyInPandasWithState "
                "contract (ArbitraryStatefulProcessor) instead."
            ) from e

        outer = self

        class _Adapter(StatefulProcessor):
            def init(self, handle) -> None:
                self._vs = handle.getValueState("state", outer.state_schema)

            def handleInputRows(self, key, rows, timer_values):
                return outer.handle_input(key, rows, self._vs)

            def close(self) -> None:
                pass

        return df.groupBy(*self.group_keys).transformWithStateInPandas(
            statefulProcessor=_Adapter(),
            outputStructType=self.output_schema,
            outputMode=self.output_mode,
            timeMode=self.time_mode,
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
        processor = load_class(self.processor_type)()
        if self.processor_timeoutType:
            if isinstance(processor, ArbitraryStatefulProcessor):
                processor.timeout_conf = self.processor_timeoutType
            else:
                # don't silently drop declared timeout semantics: the v2 API
                # expresses them as time_mode + timers on the processor class
                raise ValueError(
                    "StreamStatefulTransformer: 'processor.timeoutType' applies "
                    "to the applyInPandasWithState contract; this processor is "
                    "a v2 (transformWithState) class — set its time_mode and "
                    "register timers in the class instead"
                )
        df = spark.table(self.view)
        # both processor generations expose the same transform_state hook
        return processor.transform_state(df)
