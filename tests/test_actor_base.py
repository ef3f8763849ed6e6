from spark_etl_framework_spark.operators.base import Actor, flatten_properties


class Demo(Actor):
    fileUri: str | None = None
    count: int = 10
    enabled: bool = False
    row_valueField: str = "row_value"
    DEFERRED_KEYS = ("fileUri",)


def test_flatten_properties():
    flat = flatten_properties({"a": {"b": {"c": 1}}, "d": 2})
    assert flat == {"a.b.c": 1, "d": 2}


def test_bind_with_coercion_and_nesting():
    a = Demo(fileUri="/x", count="42", enabled="true", row={"valueField": "rv"})
    assert a.count == 42 and a.enabled is True
    assert a.row_valueField == "rv"
    assert a.prop("row.valueField") == "rv"


def test_before_run_substitutes_deferred():
    a = Demo(fileUri="/data/${ds}/x")
    a.before_run({"ds": "2024-01-01"})
    assert a.fileUri == "/data/2024-01-01/x"
