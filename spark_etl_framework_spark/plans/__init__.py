"""Pipeline layer: declarative pipeline spec → actors → runner.

Mirrors the reference's capability set (pipelines declared in YAML/JSON/XML
as ordered actions; actors exchange data as Spark temp views; all relational
work delegated to Spark SQL — reference: etl/pipeline/*), re-expressed as
plain Python: dataclasses for the model, importlib for plug-ins, dicts for
variable scopes.
"""

from .model import Action, Job, Pipeline, View  # noqa: F401
from .builder import build_pipeline, build_pipeline_from_file  # noqa: F401
from .runner import PipelineRunner  # noqa: F401
