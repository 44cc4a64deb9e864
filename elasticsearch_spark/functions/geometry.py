"""Planar geometry kernel for the geo_shape FIELD type.

The reference indexes shapes as BKD-tree triangle tessellations
(``server/src/main/java/org/elasticsearch/index/mapper/GeoShapeFieldMapper
.java``, queries via ``server/.../index/query/GeoShapeQueryBuilder.java``).
This engine stores shapes as GeoJSON strings with flat bbox sibling
columns (min/max lon/lat — parquet row-group stats prune on them, the
BKD-prefilter analog) and evaluates the EXACT spatial relation with this
pure-python/numpy kernel inside Arrow-batched UDFs.

Supported geometries: Point, LineString, MultiLineString, Polygon (with
holes, even-odd rule), MultiPolygon, Envelope, GeometryCollection.
Relations: intersects / disjoint / within / contains.

Documented subset: planar (lon/lat treated as a plane — the reference's
quadtree legacy mode made the same call for small shapes), no dateline
splitting, and hole-through-interior containment is resolved by the
edge-crossing + vertex test (a polygon that fully surrounds another's
hole without touching it reads as within).
"""

from __future__ import annotations

import json

__all__ = ["parse_geojson", "geom_bbox", "relate", "geojson_bbox"]

# geometry normal form: ("points", [(x,y), ...]) | ("lines", [line, ...])
# where line = [(x,y), ...] | ("polys", [poly, ...]) where poly = [ring, ...]
# (first ring = exterior, rest = holes; rings are closed coordinate lists)


def parse_geojson(obj) -> tuple:
    """GeoJSON (dict or string) → normal form. Coordinates are [lon, lat]."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    t = obj["type"].lower()
    c = obj.get("coordinates")
    if t == "point":
        return ("points", [tuple(c)])
    if t == "multipoint":
        return ("points", [tuple(p) for p in c])
    if t == "linestring":
        return ("lines", [[tuple(p) for p in c]])
    if t == "multilinestring":
        return ("lines", [[tuple(p) for p in ln] for ln in c])
    if t == "polygon":
        return ("polys", [[_close([tuple(p) for p in ring]) for ring in c]])
    if t == "multipolygon":
        return ("polys", [[_close([tuple(p) for p in ring]) for ring in poly]
                          for poly in c])
    if t == "envelope":
        # ES extension: [[minLon, maxLat], [maxLon, minLat]]
        (x0, y1), (x1, y0) = c
        ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        return ("polys", [[ring]])
    if t == "geometrycollection":
        parts = [parse_geojson(g) for g in obj["geometries"]]
        return ("collection", parts)
    if t == "circle":
        # ES circle: approximate with a 32-gon (the reference tessellates
        # circles too)
        import math

        x, y = c
        r = obj["radius"]
        if isinstance(r, str):
            # DistanceUnit suffixes (server/.../common/unit/DistanceUnit.java)
            # → meters, then planar degrees at the equator scale
            s = r.strip().lower()
            # DistanceUnit's full suffix set, longest-match first so nmi
            # (nautical) never reads as mi (statute) and full names resolve
            for suf, mult in (
                    ("nauticalmiles", 1852.0), ("kilometers", 1000.0),
                    ("centimeters", 0.01), ("millimeters", 0.001),
                    ("meters", 1.0), ("miles", 1609.344), ("yards", 0.9144),
                    ("inch", 0.0254), ("feet", 0.3048), ("nmi", 1852.0),
                    ("km", 1000.0), ("mi", 1609.344), ("nm", 1852.0),
                    ("yd", 0.9144), ("ft", 0.3048), ("cm", 0.01),
                    ("mm", 0.001), ("in", 0.0254), ("m", 1.0)):
                if s.endswith(suf):
                    r = float(s[:-len(suf)]) * mult / 111_320.0
                    break
            else:
                r = float(s) / 111_320.0
        ring = [(x + r * math.cos(2 * math.pi * i / 32),
                 y + r * math.sin(2 * math.pi * i / 32)) for i in range(33)]
        return ("polys", [[ring]])
    raise ValueError(f"unsupported GeoJSON type: {obj['type']}")


def _close(ring):
    if ring and ring[0] != ring[-1]:
        ring = ring + [ring[0]]
    return ring


def geom_bbox(geom) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy)."""
    kind, data = geom
    xs, ys = [], []

    def add(pts):
        for x, y in pts:
            xs.append(x)
            ys.append(y)

    if kind == "points":
        add(data)
    elif kind == "lines":
        for ln in data:
            add(ln)
    elif kind == "polys":
        for poly in data:
            add(poly[0])  # exterior bounds the holes
    else:  # collection
        for g in data:
            b = geom_bbox(g)
            xs.extend((b[0], b[2]))
            ys.extend((b[1], b[3]))
    return (min(xs), min(ys), max(xs), max(ys))


def geojson_bbox(s) -> tuple[float, float, float, float] | None:
    try:
        return geom_bbox(parse_geojson(s))
    except Exception:  # noqa: BLE001 — malformed shapes read as no-bbox
        return None


# ---- primitives ----

def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_seg(ax, ay, bx, by, px, py) -> bool:
    return (min(ax, bx) <= px <= max(ax, bx)
            and min(ay, by) <= py <= max(ay, by))


def _seg_intersect(p1, p2, p3, p4) -> bool:
    """Closed-segment intersection (touching counts — the reference's
    INTERSECTS is inclusive)."""
    d1 = _orient(*p3, *p4, *p1)
    d2 = _orient(*p3, *p4, *p2)
    d3 = _orient(*p1, *p2, *p3)
    d4 = _orient(*p1, *p2, *p4)
    if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
            and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0):
        return True
    if d1 == 0 and _on_seg(*p3, *p4, *p1):
        return True
    if d2 == 0 and _on_seg(*p3, *p4, *p2):
        return True
    if d3 == 0 and _on_seg(*p1, *p2, *p3):
        return True
    return bool(d4 == 0 and _on_seg(*p1, *p2, *p4))


def _point_in_ring(x, y, ring) -> bool:
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        # boundary counts as inside (inclusive relations)
        if _orient(x1, y1, x2, y2, x, y) == 0 and _on_seg(x1, y1, x2, y2, x, y):
            return True
        if (y1 > y) != (y2 > y):
            xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
            if x < xin:
                inside = not inside
    return inside


def _point_in_poly(x, y, poly) -> bool:
    """Even-odd over all rings: interior of exterior minus holes; the
    boundary of any ring counts as inside."""
    if not _point_in_ring(x, y, poly[0]):
        return False
    for hole in poly[1:]:
        # on the hole boundary = still inside the polygon
        on_edge = any(
            _orient(*hole[i], *hole[i + 1], x, y) == 0
            and _on_seg(*hole[i], *hole[i + 1], x, y)
            for i in range(len(hole) - 1))
        if not on_edge and _point_in_ring(x, y, hole):
            return False
    return True


def _edges(geom):
    kind, data = geom
    if kind == "lines":
        for ln in data:
            for i in range(len(ln) - 1):
                yield ln[i], ln[i + 1]
    elif kind == "polys":
        for poly in data:
            for ring in poly:
                for i in range(len(ring) - 1):
                    yield ring[i], ring[i + 1]
    elif kind == "collection":
        for g in data:
            yield from _edges(g)


def _vertices(geom):
    kind, data = geom
    if kind == "points":
        yield from data
    elif kind == "lines":
        for ln in data:
            yield from ln
    elif kind == "polys":
        for poly in data:
            for ring in poly:
                yield from ring[:-1]
    else:
        for g in data:
            yield from _vertices(g)


def _point_in_geom(x, y, geom) -> bool:
    """Point containment in a geometry's closure (area for polygons,
    the line itself for lines, identity for points)."""
    kind, data = geom
    if kind == "polys":
        return any(_point_in_poly(x, y, poly) for poly in data)
    if kind == "lines":
        return any(
            _orient(*ln[i], *ln[i + 1], x, y) == 0
            and _on_seg(*ln[i], *ln[i + 1], x, y)
            for ln in data for i in range(len(ln) - 1))
    if kind == "points":
        return (x, y) in data
    return any(_point_in_geom(x, y, g) for g in data)


def _has_area(geom) -> bool:
    kind, data = geom
    if kind == "polys":
        return True
    if kind == "collection":
        return any(_has_area(g) for g in data)
    return False


def intersects(a, b) -> bool:
    """Closed-set intersection: any edge pair crosses/touches, or either
    geometry has a vertex inside the other's area, or a point coincides."""
    ea, eb = list(_edges(a)), list(_edges(b))
    for p1, p2 in ea:
        for p3, p4 in eb:
            if _seg_intersect(p1, p2, p3, p4):
                return True
    if _has_area(b) and any(_point_in_geom(x, y, b) for x, y in _vertices(a)):
        return True
    if _has_area(a) and any(_point_in_geom(x, y, a) for x, y in _vertices(b)):
        return True
    if a[0] == "points":
        return any(_point_in_geom(x, y, b) for x, y in a[1])
    if b[0] == "points":
        return any(_point_in_geom(x, y, a) for x, y in b[1])
    return False


def _crosses_properly(a, b) -> bool:
    """Any proper (interior) edge crossing between a's and b's edges."""
    for p1, p2 in _edges(a):
        for p3, p4 in _edges(b):
            d1 = _orient(*p3, *p4, *p1)
            d2 = _orient(*p3, *p4, *p2)
            d3 = _orient(*p1, *p2, *p3)
            d4 = _orient(*p1, *p2, *p4)
            if d1 * d2 < 0 and d3 * d4 < 0:
                return True
    return False


def within(a, b) -> bool:
    """a within b: every vertex of a inside b and no proper edge crossing.
    b must have area (nothing is within a line/point except equal points)."""
    if not _has_area(b):
        return a[0] == "points" and b[0] == "points" and \
            all(p in b[1] for p in a[1])
    if _crosses_properly(a, b):
        return False
    return all(_point_in_geom(x, y, b) for x, y in _vertices(a))


def contains(a, b) -> bool:
    return within(b, a)


def relate(a, b, relation: str) -> bool:
    if relation == "intersects":
        return intersects(a, b)
    if relation == "disjoint":
        return not intersects(a, b)
    if relation == "within":
        return within(a, b)
    if relation == "contains":
        return contains(a, b)
    raise ValueError(f"unsupported geo_shape relation: {relation}")
