"""Pipeline definition model.

Reference shape: Pipeline{settings, variables, aliases, udf-registrations,
jobs[actions[(name, actor, output-view?, input-views)]]}
(reference: etl/pipeline/definition/Pipeline.scala:10-121, Job.scala:9-25,
Action.scala:5, View.scala:3).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class View:
    """A named temp view; ``global_`` promotes to global_temp
    (reference: etl/pipeline/definition/View.scala:3)."""

    name: str
    global_: bool = False


@dataclass
class Action:
    """One pipeline step: an actor instance plus its view wiring
    (reference: etl/pipeline/definition/Action.scala:5)."""

    name: str
    actor: object  # Actor instance (operators.base.Actor)
    output_view: View | None = None
    input_views: list[str] = field(default_factory=list)


@dataclass
class UdfRegistration:
    """Register a UdfProvider class under a name prefix
    (reference: etl/pipeline/definition/UdfRegistration.scala:15-20)."""

    prefix: str
    cls: str  # dotted path to a UdfProvider


@dataclass
class Job:
    name: str
    actions: list[Action] = field(default_factory=list)


@dataclass
class MetricsLogging:
    uri: str
    actions: list[str] = field(default_factory=list)


@dataclass
class DebugStaging:
    uri: str
    actions: list[str] = field(default_factory=list)


@dataclass
class Pipeline:
    name: str
    jobs: list[Job] = field(default_factory=list)
    #: resolved variables (pipeline > CLI > conf precedence applied at build)
    variables: dict[str, str] = field(default_factory=dict)
    udf_registrations: list[UdfRegistration] = field(default_factory=list)
    #: settings (reference: README.md:23): singleSparkSession, globalViewAsLocal
    single_spark_session: bool = False
    global_view_as_local: bool = True
    metrics_logging: MetricsLogging | None = None
    debug_staging: DebugStaging | None = None
