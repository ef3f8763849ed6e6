from spark_etl_framework_spark.plans import sqlutil as S


def test_strip_comments_keeps_hints():
    sql = "select /*+ BROADCAST(t) */ * from t /* drop this */ -- and this"
    out = S.strip_comments(sql)
    assert "/*+ BROADCAST(t) */" in out
    assert "drop this" not in out and "and this" not in out


def test_split_statements_respects_quotes():
    stmts = S.split_statements("select ';' as a; select 1;;")
    assert stmts == ["select ';' as a", "select 1"]


def test_classify_set_setrun_sql():
    sql = "set a = ${x}; setrun b = select max(i) from t; select ${a} from u"
    stmts = S.classify_statements(sql, {"x": "42"})
    assert [s.kind for s in stmts] == ["set", "setrun", "sql"]
    assert stmts[0].name == "a" and stmts[0].text == "42"
    assert stmts[1].name == "b" and stmts[1].text.startswith("select max")
    # plain SQL keeps ${a}: runtime variable, resolved at execution
    assert "${a}" in stmts[2].text


def test_substitute_unknown_kept():
    assert S.substitute("x=${a},y=${b}", {"a": "1"}) == "x=1,y=${b}"


def test_extract_relations_excludes_ctes():
    sql = """with c as (select * from base), d as (select * from c)
             select * from d join other o on d.k = o.k"""
    rels = S.extract_relations(sql)
    assert "base" in rels and "other" in rels
    assert "c" not in rels and "d" not in rels


def test_is_query_is_dml():
    assert S.is_query("  WITH x AS (select 1) select * from x")
    assert not S.is_query("insert into t values (1)")
    assert S.is_dml("MERGE INTO t USING s ON t.k = s.k")
    assert not S.is_dml("select 1")
