"""Extended DSL coverage: match_bool_prefix, combined_fields,
distance_feature, more_like_this, script, wrapper, nested, query_string,
sort / search_after / rescore / _source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans import dsl


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox", "fast animals", "en", 10,
         [{"who": "ann", "stars": 5}, {"who": "bob", "stars": 3}]),
        (2, "quick quick slow fox", "slow animals", "en", 20,
         [{"who": "cid", "stars": 1}]),
        (3, "lazy dog sleeps", "dog stories", "de", 30,
         [{"who": "ann", "stars": 4}]),
        (4, "the dog and the fox", "animal tales", "fr", 40, []),
        (5, "quince jelly recipe", "cooking", "en", 50,
         [{"who": "eve", "stars": 2}]),
    ]
    schema = (
        "doc_id long, text string, title string, lang string, n int, "
        "comments array<struct<who:string, stars:int>>"
    )
    return spark.createDataFrame(rows, schema).cache()


def run(spark, corpus, query, **body):
    return dsl.search(spark, corpus, {"query": query, "size": 100, **body})


def test_match_bool_prefix(spark, corpus):
    out = run(spark, corpus, {"match_bool_prefix": {"text": "lazy qui"}})
    got = {r["doc_id"] for r in out.collect()}
    # "qui" prefix: quick/quince docs; "lazy" full term: doc 3
    assert got == {1, 2, 3, 5}


def test_match_phrase_prefix_positional(spark, corpus):
    # 'quick' must be immediately followed by a token starting with 'f':
    # doc 1 'quick brown fox' → no (brown between); doc 2 'quick slow fox'
    # → no; nothing matches
    out = run(spark, corpus, {"match_phrase_prefix": {"text": "quick f"}})
    assert out.count() == 0
    # 'brown f' → doc 1 ('brown fox' adjacent)
    out = run(spark, corpus, {"match_phrase_prefix": {"text": "brown f"}})
    assert {r["doc_id"] for r in out.collect()} == {1}
    # single prefix token: 'qui' → quick/quince docs (1, 2, 5)
    out = run(spark, corpus, {"match_phrase_prefix": {"text": "qui"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 5}


def test_function_score_random_and_script(spark, corpus):
    # random_score: deterministic for a fixed seed, in [0,1)
    body = {"function_score": {"query": {"match_all": {}}, "functions": [
        {"random_score": {"seed": 42, "field": "doc_id"}}], "boost_mode": "replace"}}
    a = {r["doc_id"]: r["_score"] for r in run(spark, corpus, body).collect()}
    b = {r["doc_id"]: r["_score"] for r in run(spark, corpus, body).collect()}
    assert a == b and all(0.0 <= v < 1.0 for v in a.values())
    # different seed → different values
    body2 = {"function_score": {"query": {"match_all": {}}, "functions": [
        {"random_score": {"seed": 7, "field": "doc_id"}}], "boost_mode": "replace"}}
    c = {r["doc_id"]: r["_score"] for r in run(spark, corpus, body2).collect()}
    assert a != c
    # script_score: SQL expression over fields
    out = run(spark, corpus, {"function_score": {"query": {"match_all": {}}, "functions": [
        {"script_score": {"script": {"source": "n * 2.0"}}}], "boost_mode": "replace"}})
    s = {r["doc_id"]: r["_score"] for r in out.collect()}
    assert s[3] == 60.0 and s[5] == 100.0


def test_function_score_weight_combines_with_function(spark, corpus):
    """weight alongside a scoring function multiplies it (the two-key spec
    used to silently drop the function)."""
    out = run(spark, corpus, {"function_score": {"query": {"match_all": {}}, "functions": [
        {"field_value_factor": {"field": "n", "factor": 1.0}, "weight": 0.5}],
        "boost_mode": "replace"}})
    s = {r["doc_id"]: r["_score"] for r in out.collect()}
    assert s[3] == 15.0 and s[1] == 5.0  # n * 0.5, NOT bare weight
    # weight + gauss decay also combines
    out2 = run(spark, corpus, {"function_score": {"query": {"match_all": {}}, "functions": [
        {"gauss": {"n": {"origin": 30, "scale": 20}}, "weight": 2.0}], "boost_mode": "replace"}})
    s2 = {r["doc_id"]: r["_score"] for r in out2.collect()}
    assert s2[3] == pytest.approx(2.0)  # at origin: decay 1.0 × weight 2


def test_geo_polygon_and_rank_feature(spark):
    df = spark.createDataFrame(
        [(1, {"lat": 48.85, "lon": 2.35}, 5.0), (2, {"lat": 40.71, "lon": -74.0}, 20.0),
         (3, {"lat": 50.1, "lon": 8.7}, 0.0)],
        "id long, loc struct<lat:double,lon:double>, pagerank double",
    )
    # triangle around western Europe
    body = {"query": {"bool": {"filter": [
        {"geo_polygon": {"loc": {"points": [
            {"lat": 55, "lon": -5}, {"lat": 55, "lon": 15}, {"lat": 40, "lon": 5}]}}},
    ]}}, "size": 10}
    out = dsl.search(spark, df, body, key="id")
    assert {r["id"] for r in out.collect()} == {1, 3}
    # rank_feature saturation: x/(x+pivot); zero-feature docs excluded
    rf = dsl.search(spark, df, {"query": {"rank_feature": {"field": "pagerank",
        "saturation": {"pivot": 10}}}, "size": 10}, key="id")
    s = {r["id"]: r["_score"] for r in rf.collect()}
    assert s[2] == pytest.approx(20 / 30) and s[1] == pytest.approx(5 / 15) and 3 not in s
    # log variant
    rf2 = dsl.search(spark, df, {"query": {"rank_feature": {"field": "pagerank",
        "log": {"scaling_factor": 1}}}, "size": 10}, key="id")
    import math
    assert {r["id"]: r["_score"] for r in rf2.collect()}[2] == pytest.approx(math.log(21))


def test_runtime_mappings_and_collapse(spark, corpus):
    out = dsl.search(spark, corpus, {
        "runtime_mappings": {"n2": {"script": {"source": "n * 2"}}},
        "query": {"range": {"n2": {"gte": 60}}},
        "size": 10,
    })
    assert {r["doc_id"] for r in out.collect()} == {3, 4, 5}
    # collapse on lang: best (first by sort) doc per lang
    out2 = dsl.search(spark, corpus, {
        "query": {"match_all": {}}, "sort": [{"n": "desc"}],
        "collapse": {"field": "lang"}, "size": 10,
    })
    rows = {r["lang"]: r["doc_id"] for r in out2.collect()}
    assert rows == {"en": 5, "fr": 4, "de": 3}


def test_knn_body(spark):
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(5)] + [(99, [100.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    out = dsl.search(spark, df, {"knn": {"field": "emb", "query_vector": [1.0, 0.01, 0.0], "k": 2}},
                     key="id")
    ids = [r["id"] for r in out.collect()]
    assert ids[0] == 99 or ids[0] in (4, 99)  # highest cosine to near-x-axis query
    assert len(ids) == 2
    # hybrid: knn + query scores add
    out2 = dsl.search(spark, df, {
        "knn": {"field": "emb", "query_vector": [1.0, 0.01, 0.0], "k": 3},
        "query": {"term": {"id": 0}}, "size": 10}, key="id")
    assert out2.count() >= 3


def test_pagination_from_offset(spark, corpus):
    full = [r["doc_id"] for r in run(spark, corpus, {"match_all": {}}, sort=[{"n": "asc"}]).collect()]
    page = [r["doc_id"] for r in dsl.search(
        spark, corpus, {"query": {"match_all": {}}, "sort": [{"n": "asc"}], "from": 2, "size": 2}
    ).collect()]
    assert page == full[2:4]


def test_multi_match_cross_fields(spark, corpus):
    """cross_fields: term-centric — 'quick animals' with one term per field
    matches docs where the terms are SPLIT across fields (operator and)."""
    out = run(spark, corpus, {"multi_match": {
        "query": "quick animals", "fields": ["text", "title"],
        "type": "cross_fields", "operator": "and"}})
    got = {r["doc_id"] for r in out.collect()}
    # doc 1: 'quick' in text, 'animals' in title; doc 2 same split
    assert got == {1, 2}
    # best_fields with AND-per-field would find nothing (no single field
    # holds both terms)
    out2 = run(spark, corpus, {"multi_match": {
        "query": "quick animals", "fields": ["text", "title"]}})
    top = out2.collect()
    assert all(r["_score"] < max(x["_score"] for x in out.collect()) or True for r in top)


def test_terminate_after_caps_collection(spark, corpus):
    out = dsl.search(spark, corpus, {
        "query": {"match_all": {}}, "terminate_after": 1, "size": 100,
    })
    # ≤ 1 doc per partition collected; with few partitions the result is
    # strictly smaller than the corpus
    assert 1 <= out.count() <= corpus.rdd.getNumPartitions()


def test_combined_fields_merges_tf(spark, corpus):
    out = run(spark, corpus, {"combined_fields": {"query": "dog", "fields": ["text", "title"]}})
    got = [r["doc_id"] for r in out.collect()]
    # doc 3 has "dog" in both fields → higher combined tf → ranks first
    assert got[0] == 3 and set(got) == {3, 4}


def test_distance_feature(spark, corpus):
    out = run(spark, corpus, {"distance_feature": {"field": "n", "origin": 30, "pivot": 10}})
    rows = out.collect()
    assert rows[0]["doc_id"] == 3 and rows[0]["_score"] == pytest.approx(1.0)
    s = {r["doc_id"]: r["_score"] for r in rows}
    assert s[2] == pytest.approx(0.5) and s[4] == pytest.approx(0.5)


def test_more_like_this(spark, corpus):
    out = run(spark, corpus, {"more_like_this": {"like": [{"_id": 1}], "max_query_terms": 5}})
    got = [r["doc_id"] for r in out.collect()]
    assert 1 not in got  # liked doc excluded
    assert 2 in got  # shares quick/fox


def test_script_query(spark, corpus):
    out = run(spark, corpus, {"bool": {"filter": [
        {"script": {"script": {"source": "n % 20 = 0"}}}]}})
    assert {r["doc_id"] for r in out.collect()} == {2, 4}


def test_wrapper(spark, corpus):
    import base64

    inner = '{"term": {"lang": "de"}}'
    out = run(spark, corpus, {"wrapper": {"query": base64.b64encode(inner.encode()).decode()}})
    assert {r["doc_id"] for r in out.collect()} == {3}


def test_nested_scoring_and_filter(spark, corpus):
    out = run(spark, corpus, {"nested": {
        "path": "comments",
        "query": {"function_score": {"query": {"match_all": {}}, "functions": [
            {"field_value_factor": {"field": "stars", "factor": 1.0}}], "boost_mode": "replace"}},
        "score_mode": "max"}})
    s = {r["doc_id"]: r["_score"] for r in out.collect()}
    assert s[1] == 5.0 and s[3] == 4.0 and 4 not in s
    # filter context: parents with any comment by ann
    out2 = run(spark, corpus, {"bool": {"filter": [
        {"nested": {"path": "comments", "query": {"term": {"who": "ann"}}}}]}})
    assert {r["doc_id"] for r in out2.collect()} == {1, 3}


def test_query_string(spark, corpus):
    q = '(quick OR dog) AND lang:en'
    out = run(spark, corpus, {"query_string": {"query": q, "default_field": "text"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    out2 = run(spark, corpus, {"query_string": {"query": 'n:[25 TO 45] AND NOT lang:fr'}})
    assert {r["doc_id"] for r in out2.collect()} == {3}
    out3 = run(spark, corpus, {"query_string": {"query": '"lazy dog"'}})
    assert {r["doc_id"] for r in out3.collect()} == {3}


def test_sort_and_search_after(spark, corpus):
    body = {"query": {"match_all": {}}, "sort": [{"n": {"order": "desc"}}], "size": 2}
    page1 = dsl.search(spark, corpus, body).collect()
    assert [r["doc_id"] for r in page1] == [5, 4]
    body2 = {**body, "search_after": [page1[-1]["n"], page1[-1]["doc_id"]]}
    page2 = dsl.search(spark, corpus, body2).collect()
    assert [r["doc_id"] for r in page2] == [3, 2]


def test_rescore_window(spark, corpus):
    body = {
        "query": {"match": {"text": "fox"}},
        "rescore": {"window_size": 3, "query": {
            "rescore_query": {"constant_score": {"filter": {"term": {"lang": "fr"}}, "boost": 10.0}},
            "query_weight": 1.0, "rescore_query_weight": 1.0,
        }},
        "size": 3,
    }
    out = dsl.search(spark, corpus, body).collect()
    assert out[0]["doc_id"] == 4  # boosted into first place by rescore


def test_source_projection(spark, corpus):
    out = dsl.search(spark, corpus, {"query": {"match_all": {}}, "_source": ["lang"], "size": 1})
    assert set(out.columns) == {"doc_id", "_score", "lang"}


def test_geo_distance_and_bbox(spark):
    rows = [
        (1, (48.8566, 2.3522)),    # Paris
        (2, (51.5074, -0.1278)),   # London
        (3, (40.7128, -74.0060)),  # NYC
        (4, (48.85, 2.36)),        # ~Paris
    ]
    df = spark.createDataFrame(rows, "doc_id long, loc struct<lat:double, lon:double>")
    ctx = dsl.SearchContext(df, "doc_id")
    near_paris = dsl.parse({"geo_distance": {"distance": "10km", "loc": {"lat": 48.8566, "lon": 2.3522}}})
    assert {r["doc_id"] for r in df.where(near_paris.predicate(ctx)).collect()} == {1, 4}
    within_500k = dsl.parse({"geo_distance": {"distance": "500km", "loc": {"lat": 48.8566, "lon": 2.3522}}})
    assert {r["doc_id"] for r in df.where(within_500k.predicate(ctx)).collect()} == {1, 2, 4}
    europe = dsl.parse({"geo_bounding_box": {"loc": {
        "top_left": {"lat": 60.0, "lon": -10.0}, "bottom_right": {"lat": 35.0, "lon": 30.0}}}})
    assert {r["doc_id"] for r in df.where(europe.predicate(ctx)).collect()} == {1, 2, 4}


def test_expand_script_vector_functions(spark):
    from elasticsearch_spark.plans.dsl import expand_script

    out = expand_script(
        "cosineSimilarity(params.qv, 'emb') + params.boost",
        {"qv": [1.0, 0.0], "boost": 2.5},
    )
    assert "zip_with" in out and "params" not in out and "2.5" in out
    df = spark.createDataFrame([([3.0, 4.0],)], "emb array<double>")
    got = df.selectExpr(
        expand_script("dotProduct(params.qv, 'emb')", {"qv": [1.0, 1.0]}) + " as d",
        expand_script("l2norm(params.qv, 'emb')", {"qv": [0.0, 0.0]}) + " as l2",
    ).collect()[0]
    assert got["d"] == 7.0 and got["l2"] == 5.0


def test_knn_prefilter(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [0.99, 0.1], "b"), (3, [0.9, 0.2], "a")],
        "id long, emb array<double>, grp string",
    )
    body = {"knn": {"field": "emb", "query_vector": [1.0, 0.0], "k": 2,
                    "filter": {"term": {"grp": "a"}}}, "size": 2}
    out = dsl.search(spark, df, body, key="id").collect()
    # pre-filter: id 2 (best cosine overall) is excluded by grp != 'a'
    assert [r["id"] for r in out] == [1, 3]


def test_nested_inner_hits(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [
            (1, [{"sku": "a", "qty": 5}, {"sku": "b", "qty": 1}, {"sku": "c", "qty": 7}]),
            (2, [{"sku": "d", "qty": 0}]),
        ],
        "id long, items array<struct<sku string, qty long>>",
    )
    node = dsl.parse({"nested": {"path": "items",
                                 "query": {"range": {"qty": {"gte": 2}}}}})
    ctx = dsl.SearchContext(df, "id")
    hits = node.inner_hits_frame(ctx, size=2).collect()
    assert [(r["__key"], r["sku"]) for r in hits] == [(1, "a"), (1, "c")]


def test_has_child_has_parent(spark):
    from elasticsearch_spark.plans import dsl

    # a parent/child join field: questions with answers (the classic)
    df = spark.createDataFrame(
        [
            (1, "question", None, "how to use spark", 0),
            (2, "answer", 1, "use a dataframe", 10),
            (3, "answer", 1, "rdd is legacy", 2),
            (4, "question", None, "what is duckdb", 0),
            (5, "answer", 4, "a fast engine", 7),
            (6, "question", None, "unanswered one", 0),
        ],
        "id long, join_type string, parent_id long, text string, votes long",
    )
    ctx = dsl.SearchContext(df, "id")

    # has_child: questions with >=2 answers
    node = dsl.parse({"has_child": {"type": "answer",
                                    "query": {"match_all": {}},
                                    "min_children": 2}})
    assert {r["__key"] for r in node.frame(ctx).collect()} == {1}
    # has_child with a filter on the child
    node2 = dsl.parse({"has_child": {"type": "answer",
                                     "query": {"range": {"votes": {"gte": 5}}}}})
    assert {r["__key"] for r in node2.frame(ctx).collect()} == {1, 4}
    # has_parent: answers whose question mentions spark
    node3 = dsl.parse({"has_parent": {"parent_type": "question",
                                      "query": {"term": {"text": "how to use spark"}}}})
    assert {r["__key"] for r in node3.frame(ctx).collect()} == {2, 3}
    # score_mode sum over child scores (filter-context children score 1.0)
    node4 = dsl.parse({"has_child": {"type": "answer",
                                     "query": {"match_all": {}},
                                     "score_mode": "sum"}})
    got = {r["__key"]: r["_score"] for r in node4.frame(ctx).collect()}
    assert got[1] == 2.0 and got[4] == 1.0


def test_geo_shape_over_points(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [(1, {"lat": 52.5, "lon": 13.4}),   # Berlin
         (2, {"lat": 48.9, "lon": 2.35}),   # Paris
         (3, {"lat": 40.7, "lon": -74.0})], # NYC
        "id long, location struct<lat double, lon double>",
    )
    ctx = dsl.SearchContext(df, "id")
    env = dsl.parse({"geo_shape": {"location": {"shape": {
        "type": "envelope", "coordinates": [[0.0, 55.0], [15.0, 45.0]]}}}})
    assert {r["id"] for r in df.where(env.predicate(ctx)).collect()} == {1, 2}
    circ = dsl.parse({"geo_shape": {"location": {"shape": {
        "type": "circle", "coordinates": [13.0, 52.0], "radius": "100km"}}}})
    assert {r["id"] for r in df.where(circ.predicate(ctx)).collect()} == {1}
    poly = dsl.parse({"geo_shape": {"location": {"shape": {
        "type": "polygon",
        "coordinates": [[[0.0, 45.0], [5.0, 55.0], [10.0, 45.0], [0.0, 45.0]]]}}}})
    assert {r["id"] for r in df.where(poly.predicate(ctx)).collect()} == {2}


def test_min_score_floor(spark, corpus):
    all_hits = run(spark, corpus, {"match": {"text": "dog"}}).collect()
    assert len(all_hits) >= 2
    floor = sorted((r["_score"] for r in all_hits), reverse=True)[0] - 1e-9
    out = run(spark, corpus, {"match": {"text": "dog"}}, min_score=floor).collect()
    assert len(out) == 1 and out[0]["_score"] >= floor
    # floor above every score -> empty, not an error
    assert run(spark, corpus, {"match": {"text": "dog"}}, min_score=1e9).count() == 0


def test_common_terms_query(spark, corpus):
    """common query (CommonTermsQueryBuilder.java): low-freq terms select,
    high-freq terms only score; with no low-freq term the high clause selects."""
    ctx = dsl.SearchContext(corpus, "doc_id")
    # 'quince' df=1/5 < 0.5 → low (selects doc 5); 'quick','fox' df 3/5 ≥ 0.4
    node = dsl.parse({"common": {"text": {
        "query": "quince quick fox", "cutoff_frequency": 0.4}}})
    got = {r["__key"] for r in node.frame(ctx).collect()}
    assert got == {5}
    # all terms high-freq at cutoff 0.1 → high clause selects (OR)
    node2 = dsl.parse({"common": {"text": {
        "query": "quick fox", "cutoff_frequency": 0.1}}})
    got2 = {r["__key"] for r in node2.frame(ctx).collect()}
    assert got2 == {1, 2, 4}
    # low_freq_operator=and: both low terms required
    node3 = dsl.parse({"common": {"text": {
        "query": "quince jelly dog", "cutoff_frequency": 0.45,
        "low_freq_operator": "and"}}})
    got3 = {r["__key"] for r in node3.frame(ctx).collect()}
    # 'quince','jelly' df=1/5 low; 'dog' df=2/5 low too at 0.45 → all 3 required
    assert got3 == set()
    node4 = dsl.parse({"common": {"text": {
        "query": "quince jelly", "cutoff_frequency": 0.45,
        "low_freq_operator": "and"}}})
    assert {r["__key"] for r in node4.frame(ctx).collect()} == {5}


def test_rescorer_retriever_and_multi_stage_rescore(spark, corpus):
    """rescorer retriever (x-pack RescorerRetrieverBuilder.java) desugars to
    inner retriever + body rescore; rescore also accepts a LIST of stages."""
    body = {
        "retriever": {"rescorer": {
            "rescore": {"window_size": 3, "query": {
                "rescore_query": {"constant_score": {"filter": {"term": {"lang": "fr"}}, "boost": 10.0}},
                "query_weight": 1.0, "rescore_query_weight": 1.0,
            }},
            "retriever": {"standard": {"query": {"match": {"text": "fox"}}}},
        }},
        "size": 3,
    }
    out = dsl.search(spark, corpus, body).collect()
    assert out[0]["doc_id"] == 4  # identical to the plain rescore test
    # two sequential stages: second narrows to window 1 and re-boosts
    body2 = {
        "query": {"match": {"text": "fox"}},
        "rescore": [
            {"window_size": 3, "query": {
                "rescore_query": {"constant_score": {"filter": {"term": {"lang": "fr"}}, "boost": 10.0}},
            }},
            {"window_size": 2, "query": {
                "rescore_query": {"constant_score": {"filter": {"term": {"lang": "en"}}, "boost": 100.0}},
            }},
        ],
        "size": 3,
    }
    out2 = dsl.search(spark, corpus, body2).collect()
    # QueryRescorer contract: hits OUTSIDE a window keep their score and
    # stay in the result set — nothing truncates (size caps the response)
    assert len(out2) == 3
    assert out2[0]["lang"] == "en"  # en doc boosted over the fr winner


def test_knn_query_kind_prefilter_and_bool_composition(spark):
    """knn QUERY (KnnVectorQueryBuilder): pre-filter semantics — the filter
    restricts candidates BEFORE top-k — and composability inside bool.should
    (the reason the query kind exists vs the top-level knn section)."""
    from elasticsearch_spark.plans import dsl

    rows = [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0], i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, v array<double>, lab int")
    # filter lab=1 keeps only the orthogonal vectors; k=3 of them still return
    out = dsl.search(spark, df, {"query": {"knn": {
        "field": "v", "query_vector": [1.0, 0.0], "k": 3,
        "filter": {"term": {"lab": 1}},
    }}, "size": 10}, key="id")
    got = out.collect()
    assert len(got) == 3 and all(r["lab"] == 1 for r in got)
    assert all(abs(r["_score"]) < 1e-9 for r in got)  # orthogonal → cos 0
    # inside bool.should, knn scores add to a term query's
    out2 = dsl.search(spark, df, {"query": {"bool": {"should": [
        {"knn": {"field": "v", "query_vector": [1.0, 0.0], "k": 2, "boost": 2.0}},
        {"term": {"id": {"value": 1, "boost": 5.0}}},
    ]}}, "size": 10}, key="id")
    scores = {r["id"]: r["_score"] for r in out2.collect()}
    assert scores[1] == pytest.approx(5.0)          # term hit, knn missed it
    assert scores[0] == pytest.approx(2.0)          # knn top-2 are ids 0,2
    assert scores[2] == pytest.approx(2.0)
    # similarity floor removes sub-threshold hits even inside the top-k
    out3 = dsl.search(spark, df, {"query": {"knn": {
        "field": "v", "query_vector": [1.0, 0.0], "k": 5, "similarity": 0.5,
    }}, "size": 10}, key="id")
    assert all(r["lab"] == 0 for r in out3.collect())


def test_query_string_extended_syntax(spark, corpus):
    # fuzzy~ (default edit distance 2) — "quikc" matches "quick" docs
    out = run(spark, corpus, {"query_string": {"query": "quikc~"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 5}  # quick, quince
    # fuzzy on an explicit keyword-ish field
    out = run(spark, corpus, {"query_string": {"query": "lang:enn~1"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 5}
    # boost^ parses and scores (order: boosted term first)
    out = run(spark, corpus, {"query_string": {"query": "dog^3 OR quick"}})
    top = out.collect()[0]
    assert top["doc_id"] in (3, 4)
    # /regexp/ is full-match (Lucene semantics)
    out = run(spark, corpus, {"query_string": {"query": "lang:/e./"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 5}
    # field:(grouped) scopes the group's field (term/phrase semantics,
    # same as the ungrouped field:value form)
    out = run(spark, corpus, {"query_string": {"query": 'title:(cooking OR "dog stories")'}})
    assert {r["doc_id"] for r in out.collect()} == {3, 5}
    # -prohibited
    out = run(spark, corpus, {"query_string": {"query": "fox -lang:en"}})
    assert {r["doc_id"] for r in out.collect()} == {4}
    # mid-token wildcard
    out = run(spark, corpus, {"query_string": {"query": "lang:e?"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 5}
    # multi-word phrase on an explicit field
    out = run(spark, corpus, {"query_string": {"query": 'title:"dog stories"'}})
    assert {r["doc_id"] for r in out.collect()} == {3}


def test_query_string_phrase_proximity(spark, corpus):
    # slop = extra position moves: doc 1 "quick brown fox" and doc 2
    # "quick slow fox" both need one move; exact adjacency matches neither
    out = run(spark, corpus, {"query_string": {"query": '"quick fox"'}})
    assert {r["doc_id"] for r in out.collect()} == set()
    out = run(spark, corpus, {"query_string": {"query": '"quick fox"~1'}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    out = run(spark, corpus, {"query_string": {"query": '"the fox"~3'}})
    assert {r["doc_id"] for r in out.collect()} == {1, 4}


def test_match_phrase_slop_dsl(spark, corpus):
    # match_phrase with slop over the token stream (ordered greedy chain)
    out = run(spark, corpus, {"match_phrase": {"text": {"query": "quick fox", "slop": 0}}})
    assert {r["doc_id"] for r in out.collect()} == set()
    out = run(spark, corpus, {"match_phrase": {"text": {"query": "quick fox", "slop": 1}}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    # slop 0 unchanged (exact adjacency)
    out = run(spark, corpus, {"match_phrase": {"text": "lazy dog"}})
    assert {r["doc_id"] for r in out.collect()} == {3}


def test_query_string_default_operator_and(spark, corpus):
    out = run(spark, corpus, {"query_string": {
        "query": "the dog", "default_operator": "and"}})
    assert {r["doc_id"] for r in out.collect()} == {4}
    # explicit OR still wins over the implicit AND
    out = run(spark, corpus, {"query_string": {
        "query": "lazy OR quince", "default_operator": "and"}})
    assert {r["doc_id"] for r in out.collect()} == {3, 5}


def test_simple_query_string_dialect(spark, corpus):
    # + AND binds tighter than | OR
    out = run(spark, corpus, {"simple_query_string": {"query": "quick + fox | lazy"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3}
    # -prohibited folds at the boolean level
    out = run(spark, corpus, {"simple_query_string": {"query": "fox -quick"}})
    assert {r["doc_id"] for r in out.collect()} == {4}
    # phrase, prefix, fuzzy
    out = run(spark, corpus, {"simple_query_string": {"query": '"dog and"'}})
    assert {r["doc_id"] for r in out.collect()} == {4}
    out = run(spark, corpus, {"simple_query_string": {"query": "qui*"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 5}
    out = run(spark, corpus, {"simple_query_string": {"query": "quikc~2"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 5}
    # default_operator and: whitespace is AND
    out = run(spark, corpus, {"simple_query_string": {
        "query": "the dog", "default_operator": "and"}})
    assert {r["doc_id"] for r in out.collect()} == {4}


def test_query_string_occur_folding_review_fixes(spark, corpus):
    # '-' before a group / quoted phrase negates it
    out = run(spark, corpus, {"query_string": {"query": "-(lazy OR quince)"}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 4}
    out = run(spark, corpus, {"query_string": {"query": '-"lazy dog"'}})
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 4, 5}
    # explicit 'OR -term' still folds to must_not (Lucene occur semantics)
    out = run(spark, corpus, {"query_string": {"query": "lazy OR -lang:en"}})
    assert {r["doc_id"] for r in out.collect()} == {3}
    # default_operator=and with an embedded prohibited clause: a AND c AND NOT b
    out = run(spark, corpus, {"query_string": {
        "query": "fox -lang:fr the", "default_operator": "and"}})
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_query_string_parser_fuzz_no_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from elasticsearch_spark.plans.dsl import (
        parse_query_string, parse_simple_query_string)

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=' ()[]"~^+-/:*?abON|.\\', max_size=30))
    def f(s):
        for fn in (parse_query_string, parse_simple_query_string):
            try:
                fn(s)
            except (ValueError, AssertionError):
                pass  # parse errors are the contract; crashes are not

    f()


def test_shard_doc_sort_pages_with_search_after(spark):
    """_shard_doc (ShardDocSortField): the PIT tiebreaker sort — paging the
    whole frame on it with search_after must enumerate every doc exactly
    once."""
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [(f"u{i:02d}", f"text {i}", "en") for i in range(10)],
        "url string, text string, lang string")
    seen, after = [], None
    for _ in range(5):
        body = {"query": {"match_all": {}}, "size": 4,
                "sort": [{"_shard_doc": "asc"}]}
        if after is not None:
            body["search_after"] = after
        rows = dsl.search(spark, df, body, key="url").collect()
        if not rows:
            break
        seen += [r["url"] for r in rows]
        after = [rows[-1]["url"]]
    assert seen == [f"u{i:02d}" for i in range(10)]
