"""Painless-subset interpreter tests — examples mirror the shapes in the
reference's yaml suite (``modules/lang-painless/src/yamlRestTest/resources/
rest-api-spec/test/painless/``): locals, loops, conditionals, Map/List
state, doc values, Java numeric semantics."""

from __future__ import annotations

import pytest

from elasticsearch_spark.functions.painless import (
    DocMap,
    PainlessError,
    compile_painless,
    execute,
    is_painless,
    referenced_doc_fields,
    script_column,
)


def run(src, **env):
    return execute(compile_painless(src), dict(env))


# ---- expressions & Java semantics ----

def test_arithmetic_and_precedence():
    assert run("1 + 2 * 3") == 7
    assert run("(1 + 2) * 3") == 9
    assert run("2 + 3 * 4 - 6 / 2") == 11


def test_java_int_division_truncates_toward_zero():
    assert run("7 / 2") == 3
    assert run("-7 / 2") == -3          # Python // gives -4; Java gives -3
    assert run("7 / -2") == -3
    assert run("7.0 / 2") == 3.5


def test_java_modulo_keeps_dividend_sign():
    assert run("-7 % 3") == -1          # Python gives 2; Java gives -1
    assert run("7 % -3") == 1


def test_string_concat_java_tostring():
    assert run("'a' + 1") == "a1"
    assert run("'v=' + true") == "v=true"
    assert run("'x' + 1.5") == "x1.5"
    assert run("'d=' + 2.0") == "d=2.0"  # Java prints the .0
    assert run("1 + 2 + 'x'") == "3x"
    assert run("'' + null") == "null"


def test_ternary_elvis_nullsafe():
    assert run("true ? 1 : 2") == 1
    assert run("null ?: 'fallback'") == "fallback"
    assert run("'v' ?: 'fallback'") == "v"
    assert run("def m = null; return m?.size()") is None
    assert run("def s = null; return s?.length() ?: -1") == -1


def test_comparison_and_logic():
    assert run("1 < 2 && 3 >= 3") is True
    assert run("1 == 1.0") is True
    assert run("'a' != 'b'") is True
    assert run("!false || false") is True


def test_bitwise_and_shift():
    assert run("5 & 3") == 1
    assert run("5 | 3") == 7
    assert run("5 ^ 3") == 6
    assert run("1 << 4") == 16
    assert run("16 >> 2") == 4


def test_cast():
    assert run("(int) 3.9") == 3
    assert run("(int) -3.9") == -3      # trunc, not floor
    assert run("(double) 3") == 3.0
    assert run("(String) 42") == "42"


def test_instanceof():
    assert run("def x = 'a'; return x instanceof String") is True
    assert run("def x = [1]; return x instanceof List") is True
    assert run("def x = [:]; return x instanceof Map") is True
    assert run("def x = 1; return x instanceof String") is False


# ---- statements ----

def test_locals_and_compound_assignment():
    assert run("def x = 1; x += 4; x *= 2; return x") == 10
    assert run("int a = 2, b = 3; return a + b") == 5
    assert run("def s = 'a'; s += 'b'; return s") == "ab"


def test_if_else_chain():
    src = "def v = 15; if (v > 20) { return 'big' } else if (v > 10) { return 'mid' } else { return 'small' }"
    assert run(src) == "mid"


def test_classic_for_loop():
    assert run("def t = 0; for (int i = 0; i < 5; i++) { t += i } return t") == 10
    assert run("def t = 1; for (int i = 1; i <= 4; ++i) t *= i; return t") == 24


def test_foreach_over_list_and_map():
    assert run("def t = 0; for (x in [1, 2, 3]) { t += x } return t") == 6
    assert run("def m = ['a': 1, 'b': 2]; def t = 0; for (k in m) { t += m[k] } return t") == 3
    assert run("def t = 0; for (def e in ['a': 1, 'b': 2].entrySet()) { t += e.getValue() } return t") == 3


def test_while_break_continue():
    src = """
    def i = 0; def t = 0;
    while (true) {
      i++;
      if (i > 10) break;
      if (i % 2 == 0) continue;
      t += i;
    }
    return t
    """
    assert run(src) == 25  # 1+3+5+7+9


def test_do_while():
    assert run("def i = 0; do { i++ } while (i < 3); return i") == 3


def test_implicit_return_of_last_expression():
    assert run("def x = 3; x * 2") == 6


# ---- collections ----

def test_list_methods():
    src = """
    List l = new ArrayList();
    l.add(3); l.add(1); l.add(2);
    l.sort((a, b) -> a - b);
    return l.get(0) + '|' + l.size() + '|' + l.contains(2)
    """
    assert run(src) == "1|3|true"


def test_map_state_accumulation():
    src = """
    Map m = new HashMap();
    for (w in ['a', 'b', 'a', 'c', 'a']) {
      m[w] = m.containsKey(w) ? m[w] + 1 : 1;
    }
    return m['a'] + ',' + m.getOrDefault('z', 0)
    """
    assert run(src) == "3,0"


def test_map_merge_and_entryset():
    src = """
    Map m = [:];
    m.merge('k', 2, (a, b) -> a + b);
    m.merge('k', 5, (a, b) -> a + b);
    def best = null; def bv = -1;
    for (e in m.entrySet()) { if (e.getValue() > bv) { bv = e.getValue(); best = e.getKey() } }
    return best + ':' + bv
    """
    assert run(src) == "k:7"


def test_hashset_and_stringbuilder():
    src = """
    def s = new HashSet(); s.add(1); s.add(1); s.add(2);
    def sb = new StringBuilder(); sb.append('n='); sb.append(s.size());
    return sb.toString()
    """
    assert run(src) == "n=2"


def test_stream_subset():
    assert run("[1, 2, 3, 4].stream().filter(x -> x % 2 == 0).map(x -> x * 10).sum()") == 60


# ---- strings / statics ----

def test_string_methods():
    assert run("'Hello World'.toLowerCase().contains('world')") is True
    assert run("'a,b,,c,,'.split(',').length") == 4  # Java drops trailing empties
    assert run("'abcdef'.substring(1, 3)") == "bc"
    assert run("'abc'.indexOf('c')") == 2
    assert run("'ab12'.matches('[a-z]+[0-9]+')") is True
    assert run("'x-y'.replace('-', '_')") == "x_y"


def test_statics():
    assert run("Math.max(3, 7) + Math.abs(-2)") == 9
    assert run("Math.floor(3.7)") == 3.0
    assert run("(int) Math.pow(2, 10)") == 1024
    assert run("Integer.parseInt('42') + 1") == 43
    assert run("Double.parseDouble('1.5') * 2") == 3.0
    assert run("String.valueOf(12)") == "12"
    assert run("def l = [3, 1, 2]; Collections.sort(l); return l.get(0)") == 1
    assert run("Math.log(Math.E)") == pytest.approx(1.0)


# ---- context globals ----

def test_doc_values():
    doc = DocMap({"rank": 7, "tags": ["a", "b"], "missing": None})
    assert run("doc['rank'].value * 2", doc=doc, params={}) == 14
    assert run("doc['tags'].size()", doc=doc) == 2
    assert run("doc['tags'].values.contains('b')", doc=doc) is True
    assert run("doc['missing'].size() == 0 ? -1 : doc['missing'].value", doc=doc) == -1
    assert run("doc['missing'].empty", doc=doc) is True
    assert run("doc.containsKey('rank')", doc=doc) is True
    assert run("doc.containsKey('nope')", doc=doc) is False


def test_score_and_params():
    assert run("_score * params.boost", _score=2.0, params={"boost": 3}) == 6.0
    assert run("params.get('k') + 1", params={"k": 10}) == 11
    assert run("params['k'] * 2", params={"k": 5}) == 10


def test_emit_runtime_field():
    emitted = []
    run("emit(doc['v'].value * 2)", doc=DocMap({"v": 21}), emit=emitted.append)
    assert emitted == [42]


def test_ctx_ingest_mutation():
    ctx = {"a": 2, "b": "x"}
    run("ctx.c = ctx.a * 10; ctx['d'] = ctx.b + '!'; ctx.a += 1", ctx=ctx)
    assert ctx == {"a": 3, "b": "x", "c": 20, "d": "x!"}


def test_scripted_metric_state_shape():
    # the canonical state-map metric: per-key sums with a combine/reduce
    state = {"m": {}}
    for row in [{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3}]:
        run("state.m.merge(doc['k'].value, doc['v'].value, (x, y) -> x + y)",
            state=state, doc=DocMap(row))
    assert state["m"] == {"a": 4, "b": 2}
    partial = run("return state.m", state=state)
    merged = run("""
      Map total = [:];
      for (s in states) { for (e in s.entrySet()) { total.merge(e.getKey(), e.getValue(), (a, b) -> a + b) } }
      return total
    """, states=[partial, {"a": 10}])
    assert merged == {"a": 14, "b": 2}


# ---- error + bound behavior ----

def test_runaway_loop_bounded():
    with pytest.raises(PainlessError):
        run("def i = 0; while (true) { i++ } return i")


def test_null_pointer_raises():
    with pytest.raises(PainlessError):
        run("def m = null; return m.size()")


def test_unknown_method_raises():
    with pytest.raises(PainlessError):
        run("'s'.bogusMethod()")


# ---- dispatcher ----

def test_is_painless_routing():
    assert is_painless("def x = 1; return x")
    assert is_painless("doc['f'].value * 2")
    assert is_painless("for (x in [1,2]) { }")
    assert is_painless("Math.log(_score + 1)")
    assert is_painless("ctx.a = 1")
    assert is_painless("state.m.put('k', 1)")
    # Spark SQL expressions must stay on the legacy JVM path
    assert not is_painless("popularity * 2")
    assert not is_painless("if(lang = 'en', 1, 0)")
    assert not is_painless("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    assert not is_painless("length(text) > 10 and lang = 'en'")


def test_referenced_doc_fields():
    fields, dyn = referenced_doc_fields("doc['a'].value + doc['b'].size() + params.x")
    assert fields == {"a", "b"} and not dyn
    fields, dyn = referenced_doc_fields("def f = 'a'; return doc[f].value")
    assert dyn


# ---- Spark integration ----

def test_script_column_score_and_fields(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("u1", 2, [1, 2, 3]), ("u2", 5, []), ("u3", None, [7])],
        "url string, rank int, nums array<int>")
    out = df.withColumn("s", script_column(
        df,
        """
        def base = doc['rank'].size() == 0 ? 0 : doc['rank'].value;
        def t = 0;
        for (n in doc['nums'].values) { t += n }
        return (base + t) * params.w
        """,
        params={"w": 2.0},
        ret_type="double",
    )).orderBy("url")
    vals = [r["s"] for r in out.collect()]
    assert vals == [16.0, 10.0, 14.0]


def test_script_column_boolean_predicate(spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 30)], "url string, rank int")
    out = df.where(script_column(
        df, "doc['rank'].value > params.min;", params={"min": 10},
        ret_type="boolean"))
    assert [r["url"] for r in out.collect()] == ["b"]


# ---- engine-context integration ----

def test_dsl_script_query_painless(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("u1", "alpha beta", 3), ("u2", "gamma", 30), ("u3", "delta", 7)],
        "url string, text string, rank int")
    ctx = dsl.SearchContext(df, "url", text_col="text")
    node = dsl.parse({"script": {"script": {
        "source": "def r = doc['rank'].value; return r > params.lo && r < params.hi",
        "params": {"lo": 5, "hi": 20}}}})
    got = [r["url"] for r in df.where(node.predicate(ctx)).collect()]
    assert got == ["u3"]


def test_function_score_painless_script_score(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("u1", "x x", 2.0), ("u2", "x", 10.0)],
        "url string, text string, boost double")
    ctx = dsl.SearchContext(df, "url", text_col="text")
    node = dsl.parse({"function_score": {
        "query": {"match_all": {}},
        "functions": [{"script_score": {"script": {
            "source": "def b = doc['boost'].value; return _score * Math.max(b, 1.0);"}}}],
        "boost_mode": "replace",
    }})
    rows = {r["__key"]: r["_score"] for r in node.frame(ctx).collect()}
    assert rows["u1"] == pytest.approx(2.0)   # match_all score 1 * boost 2
    assert rows["u2"] == pytest.approx(10.0)


def test_runtime_field_painless_emit(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame([("u1", 4), ("u2", 9)], "url string, v int")
    col = dsl.runtime_field_expr({"type": "double", "script": {
        "source": "def x = doc['v'].value; if (x > 5) { emit(x * 100.0) } else { emit(x + 0.5) }"}})
    got = {r["url"]: r["rf"] for r in df.withColumn("rf", col).collect()}
    assert got == {"u1": 4.5, "u2": 900.0}


def test_scripted_metric_painless_state_map(spark):
    from elasticsearch_spark.plans import aggs

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0), ("c", 4.0), ("b", 0.5)],
        "k string, v double").repartition(3)
    out = aggs.aggregate(df, {"sums": {"scripted_metric": {
        "init_script": "state.m = [:]",
        "map_script": "state.m.merge(doc['k'].value, doc['v'].value, (a, b) -> a + b)",
        "combine_script": "return state.m",
        "reduce_script": """
          Map total = [:];
          for (s in states) {
            for (e in s.entrySet()) { total.merge(e.getKey(), e.getValue(), (a, b) -> a + b) }
          }
          return total
        """,
    }}})["sums"]
    got = {r["key"]: r["sums"] for r in out.collect()}
    assert got == {"a": 4.0, "b": 2.5, "c": 4.0}


def test_scripted_metric_painless_scalar(spark):
    from elasticsearch_spark.plans import aggs

    df = spark.createDataFrame([(x,) for x in range(1, 11)], "v int").repartition(4)
    out = aggs.aggregate(df, {"m": {"scripted_metric": {
        "init_script": "state.t = 0; state.n = 0",
        "map_script": "state.t += doc['v'].value; state.n++",
        "combine_script": "return [state.t, state.n]",
        "reduce_script": """
          def t = 0; def n = 0;
          for (s in states) { t += s[0]; n += s[1] }
          return n == 0 ? 0 : (double) t / n
        """,
    }}})["m"]
    assert out.collect()[0]["m"] == pytest.approx(5.5)


def test_ingest_ctx_script(spark):
    from elasticsearch_spark.sources.ingest_pipeline import run_pipeline

    df = spark.createDataFrame(
        [("u1", "alpha beta gamma", 2), ("u2", "x", 5)],
        "url string, text string, n int")
    out = run_pipeline(df, [{"script": {"source": """
        ctx.words = ctx.text.split(' ').length;
        ctx.score = ctx.words * ctx.n * 1.0;
        ctx.flag = ctx.n > 3;
        ctx.remove('n');
    """}}])
    assert "n" not in out.columns
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["words"] == 3 and rows["u1"]["score"] == 6.0
    assert rows["u2"]["flag"] is True
    assert dict(out.dtypes)["words"] == "bigint"


def test_script_fields_painless(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("u1", "a b c", 1), ("u2", "d", 2)], "url string, text string, r int")
    res = dsl.search(spark, df, {
        "query": {"match_all": {}},
        "script_fields": {"wc": {"script": {
            "source": "doc['text'].value.split(' ').length + params.off",
            "params": {"off": 10}}}},
        "sort": [{"url": "asc"}],
    }, key="url", text_col="text")
    got = [r["wc"] for r in res.collect()]
    assert got == [13, 11]


def test_script_sort_painless(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("u1", "x", 3), ("u2", "x", 1), ("u3", "x", 2)],
        "url string, text string, r int")
    res = dsl.search(spark, df, {
        "query": {"match_all": {}},
        "sort": [{"_script": {"type": "number", "order": "desc", "script": {
            "source": "doc['r'].value * -1;"}}}],
    }, key="url", text_col="text")
    assert [r["url"] for r in res.collect()] == ["u2", "u3", "u1"]


def test_scripts_painless_execute_api(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "px"))
    out = es.scripts_painless_execute(
        {"source": "def t = 0; for (x in params.xs) { t += x } return t",
         "params": {"xs": [1, 2, 3]}})
    assert out["result"] == 6
    out = es.scripts_painless_execute(
        {"source": "doc['v'].value.toUpperCase()"}, context_doc={"v": "ab"})
    assert out["result"] == "AB"


def test_update_by_query_painless_ctx_source(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    eng = Engine(spark, root=str(tmp_path / "ubq"))
    eng.create_index("u", num_partitions=2)
    eng.bulk("u", spark.createDataFrame(
        [("a1", "old text", "en", 5), ("a2", "keep", "de", 1)],
        "url string, text string, lang string, votes int"))
    # mutating existing fields (adding NEW fields via update_by_query hits
    # the one-docs-schema-per-index guard loudly — documented subset; new
    # fields go through reindex into a fresh index instead)
    eng.update_by_query("u", {"term": {"lang": "en"}}, """
        ctx._source.text = ctx._source.text + ' edited';
        ctx._source.votes += 10;
    """)
    got = eng.get("u", "a1")
    assert got["text"] == "old text edited" and got["votes"] == 15
    assert eng.get("u", "a2")["text"] == "keep"  # unmatched untouched


def test_reindex_with_painless_script(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    eng = Engine(spark, root=str(tmp_path / "ri"))
    eng.create_index("src", num_partitions=1)
    eng.bulk("src", spark.createDataFrame(
        [("r1", "alpha words here", "en")], "url string, text string, lang string"))
    eng.create_index("dst", num_partitions=1)
    eng.reindex("src", "dst", script={"source":
        "ctx._source.wc = ctx._source.text.split(' ').length; ctx._source.lang = ctx._source.lang.toUpperCase()"})
    got = eng.get("dst", "r1")
    assert got["wc"] == 3 and got["lang"] == "EN"


def test_user_defined_functions():
    src = """
    int fib(int n) { if (n < 2) { return n } return fib(n - 1) + fib(n - 2) }
    double scale(def x, def f) { return x * f }
    return scale(fib(10), 0.5)
    """
    assert run(src) == 27.5
    # function using a loop + list
    src2 = """
    def total(List xs) { def t = 0; for (x in xs) { t += x } return t }
    return total([1, 2, 3]) + total([10])
    """
    assert run(src2) == 16


def test_ingest_ctx_script_conditional_add(spark):
    """Fields added only inside conditionals must appear in the schema even
    when the first row doesn't exercise the branch (static assign scan)."""
    from elasticsearch_spark.sources.ingest_pipeline import run_pipeline

    df = spark.createDataFrame(
        [("u1", "de", 1), ("u2", "en", 2), ("u3", "en", 3)],
        "url string, lang string, n int").repartition(1)
    out = run_pipeline(df, [{"script": {"source": """
        if (ctx.lang == 'en') { ctx.flag = ctx.n * 10 }
        if (ctx.lang == 'xx') { ctx.never = 'y' }
    """}}])
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["flag"] is None          # branch not taken → null
    assert rows["u2"]["flag"] == 20 and rows["u3"]["flag"] == 30
    # a field no trial row exercises still exists (string-typed fallback)
    assert "never" in out.columns and rows["u1"]["never"] is None


# ---- regex literals (PainlessLexer.g4 REGEX mode; Pattern/Matcher subset) ----

def test_regex_find_and_match_operators():
    assert run("'foobar' =~ /bar/") is True          # find: substring hit
    assert run("'foobar' ==~ /bar/") is False        # matches: whole string
    assert run("'foobar' ==~ /foo.*/") is True
    assert run("'FooBar' =~ /foo/i") is True         # case-insensitive flag
    assert run("'a1b2' ==~ /[a-z]\\d[a-z]\\d/") is True
    # non-string LHS stringifies through Java toString
    assert run("123 ==~ /\\d+/") is True


def test_regex_slash_stays_division_after_operands():
    assert run("def x = 10 / 2; return x") == 5
    assert run("int a = 7; int b = a / 2; b") == 3
    assert run("(4 + 4) / 2") == 4


def test_regex_matcher_loop_and_groups():
    src = "def m = /(\\d+)-(\\d+)/.matcher('12-34'); " \
          "if (m.matches()) { return m.group(2); } return 'no'"
    assert run(src) == "34"
    assert run("def m = /o/.matcher('foo'); int n = 0; "
               "while (m.find()) { n++; } return n") == 2
    assert run("def p = /x+/; p.matcher('xxy').replaceAll('Z')") == "Zy"


def test_regex_pattern_split():
    assert run("/,/.split('a,b,c')") == ["a", "b", "c"]
    # Java limit=0 strips trailing empties
    assert run("/,/.split('a,b,,')") == ["a", "b"]


def test_regex_in_condition_and_dispatcher():
    assert run("'2024-01-02' =~ /^(\\d{4})/ ? 'y' : 'n'") == "y"
    # the =~ marker routes params-only scripts to this interpreter
    assert is_painless("params.v ==~ /x/")
    assert is_painless("doc['lang'].value =~ /^e/")


def test_map_put_if_absent_returns_previous():
    assert run("Map m = [:]; def r = m.putIfAbsent('k', 1); "
               "[r, m.get('k'), m.putIfAbsent('k', 2), m.get('k')]") == \
        [None, 1, 1, 1]


# ---- try/catch/throw (PainlessParser.g4 trap grammar) ----

def test_try_catch_arithmetic():
    assert run("try { return 10 / 0 } catch (ArithmeticException e) "
               "{ return 'div:' + e.getMessage() }") == "div:/ by zero"
    assert run("try { return 1 } catch (Exception e) { return 2 }") == 1


def test_throw_and_typed_catch_chain():
    assert run("try { throw new IllegalArgumentException('bad'); } "
               "catch (IllegalArgumentException e) { return e.getMessage() }") == "bad"
    # first matching trap wins; Exception is the catch-all
    assert run("def r = 'x'; try { throw new RuntimeException('a') } "
               "catch (ArithmeticException e) { r = 'no' } "
               "catch (Exception e) { r = 'yes' } return r") == "yes"


def test_python_level_errors_map_to_java_types():
    assert run("try { def l = []; l.get(3) } "
               "catch (IndexOutOfBoundsException e) { return 'oob' }") == "oob"
    assert run("try { def m = null; m.size() } "
               "catch (NullPointerException e) { return 'npe' }") == "npe"
    assert run("try { Integer.parseInt('xx') } "
               "catch (Exception e) { return 'nfe' }") == "nfe"


def test_uncaught_type_propagates():
    with pytest.raises(PainlessError, match="RuntimeException: x"):
        run("try { throw new RuntimeException('x') } "
            "catch (ArithmeticException e) { return 1 }")
