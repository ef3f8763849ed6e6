"""Pipeline builders: YAML / JSON / XML definition → Pipeline model.

Reference behavior (reference: etl/pipeline/builder/*):
- dispatch on file extension; YAML/JSON share one shape, XML has a walker
  (reference: PipelineFactory.scala:40-45)
- version check ``1.0.0`` (reference: JsonPipelineBuilder.scala:40-44)
- sections in order: settings → aliases → udf-registration → variables →
  jobs (with ``include:`` files) → metrics-logging → debug-staging
- variable precedence pipeline > CLI args > app conf (reference: README.md:105)
- variable values may be SQL expressions evaluated via a throwaway
  ``spark.sql`` round-trip (reference: JsonPipelineBuilder.scala:113-155)
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

from . import sqlutil
from .model import (
    Action,
    DebugStaging,
    Job,
    MetricsLogging,
    Pipeline,
    UdfRegistration,
    View,
)
from .registry import resolve_actor

_SQL_EXPR_VALUE = re.compile(r"^\s*(select)\b", re.IGNORECASE)


def _load_definition(path: str | Path) -> dict:
    p = Path(path)
    text = p.read_text()
    suffix = p.suffix.lower()
    if suffix in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(text)
    if suffix == ".json":
        return json.loads(text)
    if suffix == ".xml":
        return _xml_to_dict(text)
    raise ValueError(f"unsupported pipeline definition extension: {suffix}")


def _xml_to_dict(text: str) -> dict:
    """Minimal XML walker for the reference's XML pipeline shape
    (reference: etl/pipeline/builder/XmlPipelineBuilder.scala:29-40):
    elements nest like the JSON shape; repeated tags become lists;
    attributes merge as keys."""
    import xml.etree.ElementTree as ET

    def walk(el) -> Any:
        children = list(el)
        if not children:
            return el.text.strip() if el.text and el.text.strip() else dict(el.attrib) or None
        out: dict[str, Any] = dict(el.attrib)
        for child in children:
            val = walk(child)
            if child.tag in out:
                prev = out[child.tag]
                out[child.tag] = prev + [val] if isinstance(prev, list) else [prev, val]
            else:
                out[child.tag] = val
        return out

    root = ET.fromstring(text)
    return {root.tag: walk(root)} if root.tag != "pipeline-def" else walk(root)


def _as_list(v: Any) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def build_pipeline_from_file(
    path: str | Path,
    cli_vars: dict[str, str] | None = None,
    app_conf: dict[str, str] | None = None,
    spark=None,
) -> Pipeline:
    defn = _load_definition(path)
    return build_pipeline(defn, cli_vars, app_conf, spark, base_dir=Path(path).parent)


def build_pipeline(
    defn: dict,
    cli_vars: dict[str, str] | None = None,
    app_conf: dict[str, str] | None = None,
    spark=None,
    base_dir: Path | None = None,
) -> Pipeline:
    """Definition dict → Pipeline. ``spark`` is only needed when variable
    values are SQL expressions."""
    if "pipeline-def" in defn:
        defn = defn["pipeline-def"]
    version = str(defn.get("version", "1.0.0"))
    if version != "1.0.0":
        raise ValueError(f"unsupported pipeline-def version {version!r}")

    base_dir = base_dir or Path(".")
    settings = defn.get("settings") or {}
    aliases = {}
    for a in _as_list(defn.get("aliases")):
        if isinstance(a, dict) and "include" in a:
            aliases.update(_load_definition(base_dir / a["include"]))
        elif isinstance(a, dict):
            aliases[a["name"]] = a["type"]

    # variables: precedence pipeline > CLI > conf; ${..} resolved against the
    # lower-precedence scopes; "select ..." values evaluated via spark.sql
    variables: dict[str, str] = dict(app_conf or {})
    variables.update(cli_vars or {})
    for v in _as_list(defn.get("variables")):
        name, value = v["name"], str(v["value"])
        value = sqlutil.substitute(value, variables)
        if _SQL_EXPR_VALUE.match(value):
            if spark is None:
                raise ValueError(f"variable {name!r} needs a SparkSession to evaluate")
            row = spark.sql(value).first()
            value = str(row[0]) if row is not None else ""
        if str(v.get("decrypt", "false")).lower() == "true":
            value = _decrypt(value, variables)
        variables[name] = value

    udf_regs = [
        UdfRegistration(prefix=u.get("prefix", ""), cls=u["type"])
        for u in _as_list(defn.get("udf-registration"))
    ]

    jobs: list[Job] = []
    for j in _as_list(defn.get("jobs")):
        if "include" in j:
            included = _load_definition(base_dir / j["include"])
            j = {**included, **{k: v for k, v in j.items() if k != "include"}}
        actions = []
        for a in _as_list(j.get("actions")):
            actor_cls = resolve_actor(a["actor"]["type"], aliases)
            props = a["actor"].get("properties") or {}
            # ${var} substitution on string properties at build time; unknown
            # names (runtime SQL variables) stay for before_run
            props = _substitute_tree(props, variables)
            actor = actor_cls(**props)
            output = a.get("output-view")
            ov = (
                View(output["name"], str(output.get("global", "false")).lower() == "true")
                if output
                else None
            )
            input_views = [str(x) for x in _as_list(a.get("input-views"))]
            # convenience: single-input actors get their 'view' prop wired
            if input_views and getattr(actor, "view", "__absent__") is None:
                actor.view = input_views[0]
            actions.append(Action(a["name"], actor, ov, input_views))
        jobs.append(Job(j.get("name", f"job-{len(jobs)}"), actions))

    ml = defn.get("metrics-logging")
    ds = defn.get("debug-staging")
    return Pipeline(
        name=str(defn.get("name", "pipeline")),
        jobs=jobs,
        variables=variables,
        udf_registrations=udf_regs,
        single_spark_session=str(settings.get("singleSparkSession", "false")).lower()
        == "true",
        global_view_as_local=str(settings.get("globalViewAsLocal", "true")).lower()
        == "true",
        metrics_logging=MetricsLogging(ml["uri"], _as_list(ml.get("actions")))
        if ml
        else None,
        debug_staging=DebugStaging(ds["uri"], _as_list(ds.get("actions"))) if ds else None,
    )


def _substitute_tree(node: Any, variables: dict[str, str]) -> Any:
    if isinstance(node, dict):
        return {k: _substitute_tree(v, variables) for k, v in node.items()}
    if isinstance(node, list):
        return [_substitute_tree(v, variables) for v in node]
    if isinstance(node, str):
        return sqlutil.substitute(node, variables)
    return node


def _decrypt(value: str, variables: dict[str, str]) -> str:
    """Encrypted-variable hook (reference: JsonPipelineBuilder.scala:144-154
    uses jasypt AES-256). Implemented with ``cryptography`` when available;
    raises a clear error otherwise rather than silently passing ciphertext."""
    key = variables.get("decrypt.key")
    if not key:
        raise ValueError("decrypt=true variable but no 'decrypt.key' provided")
    try:
        import base64
        import hashlib

        from cryptography.fernet import Fernet

        fkey = base64.urlsafe_b64encode(hashlib.sha256(key.encode()).digest())
        return Fernet(fkey).decrypt(value.encode()).decode()
    except ImportError as e:
        raise RuntimeError(
            "encrypted variables require the 'cryptography' package"
        ) from e
