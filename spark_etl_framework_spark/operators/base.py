"""Actor base class + property binding.

The reference injects flattened ``properties`` into ``@PropertyKey``-annotated
fields via runtime reflection (reference: common/PropertyInitializer.scala:
51-102); here an Actor simply declares typed attributes and ``bind()`` assigns
from the flattened dict with type coercion — idiomatic Python, same observable
config surface.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from ..plans import sqlutil

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

    from ..plans.context import JobContext


def flatten_properties(props: dict[str, Any], prefix: str = "") -> dict[str, Any]:
    """Nested properties map → dotted keys
    (reference: etl/pipeline/builder/JsonPipelineBuilder.scala:331-344)."""
    out: dict[str, Any] = {}
    for k, v in (props or {}).items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_properties(v, f"{key}."))
        else:
            out[key] = v
    return out


def coerce(value: Any, like: Any) -> Any:
    """Coerce a config string toward the type of the attribute default
    (reference: common/ValueOperator.scala:28-56)."""
    if like is None or value is None:
        return value
    if isinstance(like, bool) and not isinstance(value, bool):
        return str(value).strip().lower() in ("true", "1", "yes")
    if isinstance(like, int) and not isinstance(like, bool):
        return int(value)
    if isinstance(like, float):
        return float(value)
    return value


class Actor:
    """Base operator: bind flattened properties, then ``run(ctx, spark)``
    returning an optional DataFrame (reference: etl/common/Actor.scala:15,76).

    Subclasses declare config as class attributes (the dotted property key is
    the attribute name with ``_`` for ``.``) and override ``run``.
    """

    #: dotted property keys that hold SQL/text and get ${var} substitution
    #: deferred to just-before-run (reference: etl/common/Actor.scala:60-68)
    DEFERRED_KEYS: tuple[str, ...] = ()

    def __init__(self, **props: Any):
        self._props: dict[str, Any] = {}
        self.bind(props)

    # -- config -------------------------------------------------------------
    def bind(self, props: dict[str, Any]) -> "Actor":
        flat = flatten_properties(props)
        self._props.update(flat)
        for key, value in flat.items():
            attr = key.replace(".", "_")
            if hasattr(type(self), attr):
                setattr(self, attr, coerce(value, getattr(type(self), attr)))
            else:
                setattr(self, attr, value)
        return self

    def prop(self, key: str, default: Any = None) -> Any:
        return self._props.get(key, default)

    def before_run(self, variables: dict[str, str]) -> None:
        """Late-bind ``${var}`` in deferred text properties (values set by
        earlier SQL ``set``/``setrun`` statements —
        reference: etl/common/Actor.scala:60-68)."""
        for key in self.DEFERRED_KEYS:
            attr = key.replace(".", "_")
            val = getattr(self, attr, None)
            if isinstance(val, str):
                setattr(self, attr, sqlutil.substitute(val, variables))

    # -- execution ----------------------------------------------------------
    def run(self, ctx: "JobContext", spark: "SparkSession") -> "DataFrame | None":
        raise NotImplementedError

    def collect_metrics(self, df: "DataFrame") -> dict[str, str]:
        """Actor-specific metrics merged into the runner's metric record."""
        return {}
