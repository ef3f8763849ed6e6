"""Pipeline / job execution contexts.

The reference smuggles SQL-set variables and cache ref-counts across
sub-sessions through session conf keys (reference: etl/common/Actor.scala:
83-109, JobContext.scala:21-35); here the runner owns all sessions, so both
live as plain Python state with identical observable behavior (variables set
by SQL are visible to later actors; a view persists on its 2nd reference).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


@dataclass
class PipelineContext:
    """Pipeline-scope state (reference: etl/common/PipelineContext.scala).

    ``io_connections``/``io_batch_size`` are the reference's sink-parallelism
    defaults (reference: etl/common/PipelineContext.scala:111,117).
    """

    variables: dict[str, str] = field(default_factory=dict)
    objects: dict[str, Any] = field(default_factory=dict)
    io_connections: int = 16
    io_batch_size: int = 1600
    #: validation run: None = off, N = limit every action output to N rows
    #: (reference: PipelineRunner.scala:21-29,78)
    validation_limit: int | None = None


class JobContext:
    """Job-scope state: view reference counts + auto-caching
    (reference: etl/common/JobContext.scala:18,44-51,74-85).

    Every time an action consumes a view, ``reference()`` bumps its count;
    from the 2nd reference on, the underlying DataFrame is persisted
    MEMORY_AND_DISK (the reference's auto-cache policy, README.md:374).
    Streaming DataFrames are never persisted.
    """

    def __init__(self, pipeline_ctx: PipelineContext, spark: SparkSession):
        self.pipeline = pipeline_ctx
        self.spark = spark
        self.objects: dict[str, Any] = {}
        self._ref_counts: dict[str, int] = {}
        self._view_dfs: dict[str, DataFrame] = {}
        self._persisted: set[str] = set()
        self._global_views: set[str] = set()

    @property
    def variables(self) -> dict[str, str]:
        return self.pipeline.variables

    def register_view(self, name: str, df: DataFrame, global_: bool = False) -> None:
        """Promote an actor output to a temp view
        (reference: etl/pipeline/PipelineRunner.scala:137-148)."""
        if global_:
            df.createOrReplaceGlobalTempView(name)
            self._global_views.add(name)
        else:
            df.createOrReplaceTempView(name)
        self._view_dfs[name] = df

    def reference(self, view: str) -> None:
        """Count a view reference; persist on the 2nd+ (batch only)."""
        n = self._ref_counts.get(view, 0) + 1
        self._ref_counts[view] = n
        df = self._view_dfs.get(view)
        if n >= 2 and df is not None and view not in self._persisted and not df.isStreaming:
            df.persist(StorageLevel.MEMORY_AND_DISK)
            self._persisted.add(view)

    def view_exists(self, view: str) -> bool:
        """Input-view existence check (reference: PipelineRunner.scala:119-134)."""
        if view.startswith("global_temp."):
            return self.spark.catalog.tableExists(view)
        return self.spark.catalog.tableExists(view) or view in self._view_dfs

    def cleanup(self) -> None:
        """Unpersist + drop temp views at job end
        (reference: PipelineRunner.scala:243-258).

        Local temp views are dropped: with ``settings.singleSparkSession=
        true`` jobs share one session, so an undropped local view would leak
        into the next job and let its missing-input-view check pass against
        stale data. Global temp views survive — they are the cross-job
        sharing mechanism in both session modes (the reference likewise only
        uncaches them, PipelineRunner.scala:243-258)."""
        for name in self._persisted:
            df = self._view_dfs.get(name)
            if df is not None:
                df.unpersist()
        for name in self._view_dfs:
            if name not in self._global_views:
                self.spark.catalog.dropTempView(name)
        self._persisted.clear()
        self._view_dfs.clear()
        self._ref_counts.clear()
        self._global_views.clear()
