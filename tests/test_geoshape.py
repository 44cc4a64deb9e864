"""geo_shape FIELD type: planar geometry kernel (functions/geometry.py) +
stored-shape query path (plans/fields.shape_relate_col via the DSL)."""

from __future__ import annotations

import json

import pytest

from elasticsearch_spark.functions.geometry import (
    geom_bbox,
    intersects,
    parse_geojson,
    relate,
    within,
)


def P(*rings):
    return parse_geojson({"type": "Polygon", "coordinates": [list(r) for r in rings]})


SQ = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]           # 4x4 square
INNER = [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]        # inside SQ
FAR = [(10, 10), (12, 10), (12, 12), (10, 12), (10, 10)]
CROSS = [(3, 3), (6, 3), (6, 6), (3, 6), (3, 3)]        # overlaps SQ corner


def test_polygon_polygon_relations():
    sq, inner, far, cross = P(SQ), P(INNER), P(FAR), P(CROSS)
    assert intersects(sq, inner) and intersects(sq, cross)
    assert not intersects(sq, far)
    assert within(inner, sq) and not within(cross, sq)
    assert relate(sq, inner, "contains") and not relate(sq, cross, "contains")
    assert relate(sq, far, "disjoint")


def test_polygon_with_hole():
    donut = P(SQ, [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)])
    dot = P([(1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5), (1.5, 1.5)])
    # the dot sits entirely in the hole: vertices outside the donut area
    assert not within(dot, donut)
    assert not intersects(dot, donut)
    edge_dot = P([(0.2, 0.2), (0.8, 0.2), (0.8, 0.8), (0.2, 0.8), (0.2, 0.2)])
    assert within(edge_dot, donut)  # in the solid ring part


def test_diamond_vs_rect_is_not_bbox():
    # diamond whose bbox overlaps the rect while the shape does not
    diamond = parse_geojson({"type": "Polygon", "coordinates": [
        [[4, 0], [0, 4], [-4, 0], [0, -4], [4, 0]]]})
    corner_rect = parse_geojson({"type": "envelope",
                                 "coordinates": [[3.5, 4.0], [4.0, 3.5]]})
    bb = geom_bbox(diamond)
    assert bb == (-4, -4, 4, 4)  # bbox DOES overlap the corner rect
    assert not intersects(diamond, corner_rect)  # the shape does NOT


def test_linestring_relations():
    line = parse_geojson({"type": "LineString", "coordinates": [[-1, 2], [5, 2]]})
    sq = P(SQ)
    assert intersects(line, sq)
    inside_line = parse_geojson({"type": "LineString", "coordinates": [[1, 1], [2, 2]]})
    assert within(inside_line, sq)
    outside = parse_geojson({"type": "LineString", "coordinates": [[10, 10], [11, 11]]})
    assert relate(outside, sq, "disjoint")


def test_point_and_multipolygon():
    pt_in = parse_geojson({"type": "Point", "coordinates": [2, 2]})
    pt_out = parse_geojson({"type": "Point", "coordinates": [9, 9]})
    multi = parse_geojson({"type": "MultiPolygon", "coordinates": [
        [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
        [[[8, 8], [10, 8], [10, 10], [8, 10], [8, 8]]],
    ]})
    assert intersects(pt_in, multi) and intersects(pt_out, multi)
    assert within(pt_in, multi)
    pt_nowhere = parse_geojson({"type": "Point", "coordinates": [6, 6]})
    assert relate(pt_nowhere, multi, "disjoint")


def test_touching_counts_as_intersects():
    a = P(SQ)
    touch = P([(4, 0), (8, 0), (8, 4), (4, 4), (4, 0)])  # shares an edge
    assert intersects(a, touch)
    assert not within(touch, a)


def test_stored_shape_query_path(spark):
    from pyspark.sql import functions as F

    from elasticsearch_spark.plans import dsl
    from elasticsearch_spark.plans.fields import with_shape_bbox

    shapes = [
        ("in", {"type": "Polygon", "coordinates": [[[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]}),
        ("cross", {"type": "Polygon", "coordinates": [[[3, 3], [6, 3], [6, 6], [3, 6], [3, 3]]]}),
        ("out", {"type": "Polygon", "coordinates": [[[10, 10], [11, 10], [11, 11], [10, 11], [10, 10]]]}),
        ("line", {"type": "LineString", "coordinates": [[0, 2], [5, 2]]}),
        ("null", None),
    ]
    df = spark.createDataFrame(
        [(k, json.dumps(s) if s else None) for k, s in shapes], "id string, shape string")
    df = with_shape_bbox(df, "shape")
    assert {"shape_minx", "shape_maxy"} <= set(df.columns)
    ctx = dsl.SearchContext(df, "id")
    q = {"type": "envelope", "coordinates": [[0.0, 4.0], [4.0, 0.0]]}

    def ids(rel):
        node = dsl.parse({"geo_shape": {"shape": {"shape": q, "relation": rel}}})
        return sorted(r["id"] for r in df.where(node.predicate(ctx)).collect())

    assert ids("intersects") == ["cross", "in", "line"]
    assert ids("within") == ["in"]
    # a missing shape matches NOTHING, disjoint included (the reference
    # only relates docs that have the field)
    assert ids("disjoint") == ["out"]
    assert ids("contains") == []
    # contains with a small query rect inside "in"
    q2 = {"type": "envelope", "coordinates": [[1.2, 1.8], [1.8, 1.2]]}
    node = dsl.parse({"geo_shape": {"shape": {"shape": q2, "relation": "contains"}}})
    assert sorted(r["id"] for r in df.where(node.predicate(ctx)).collect()) == ["in"]


def test_point_field_still_dispatches(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("a", (1.0, 1.0)), ("b", (9.0, 9.0))],
        "id string, loc struct<lat:double, lon:double>")
    ctx = dsl.SearchContext(df, "id")
    node = dsl.parse({"geo_shape": {"loc": {"shape": {
        "type": "envelope", "coordinates": [[0.0, 2.0], [2.0, 0.0]]}}}})
    assert [r["id"] for r in df.where(node.predicate(ctx)).collect()] == ["a"]
