"""spark_etl_framework_spark — a PySpark-native ETL/analytics engine.

A brand-new implementation (Spark DataFrame/SQL-first) of the capabilities of
the reference `spark-etl-framework` (a config-driven ETL pipeline framework):
pipelines declared in YAML/JSON/XML as sequences of actions, each action an
actor (reader / transformer / validator / writer / utility), with DataFrames
exchanged exclusively through Spark temp views and all relational computation
delegated to Spark SQL / the DataFrame API (Catalyst optimizes; we do not
hand-schedule).

Reference parity map: see SURVEY.md §2 (operator inventory). Citations into
/root/reference appear in class docstrings as `path:line`.

Beyond reference parity, the package ships first-class large-scale
training-data-pipeline operators (deduplication, similarity search, text
analysis, multimodal binary columns) under ``operators/``.
"""

__version__ = "0.1.0"

from .session import get_session  # noqa: F401
