"""LatLonShape role — indexed document GEOMETRIES (polygon/line/point).

Reference:
- lucene/core/src/java/org/apache/lucene/document/LatLonShape.java:78-160
  (createIndexableFields: polygons tessellate to triangles, lines become
  "flat" triangles, points become degenerate one-vertex triangles)
- lucene/core/src/java/org/apache/lucene/geo/Tessellator.java (ear-clipping
  tessellation with hole elimination via bridge edges)
- lucene/core/src/java/org/apache/lucene/document/ShapeField.java:121-127
  (QueryRelation INTERSECTS / WITHIN / DISJOINT / CONTAINS; triangles carry
  per-edge isEdgefromPolygon flags used by CONTAINS)
- lucene/core/src/java/org/apache/lucene/document/LatLonShapeBoundingBoxQuery.java
  (box-vs-shape with the two-phase BKD traversal)

Spark disposition: a shape field ``f`` is stored on the docs table as
``f_tris`` = array<struct<ax,ay,bx,by,cx,cy, ab,bc,ca>> — the tessellation
with x = lon, y = lat and ab/bc/ca the boundary-edge flags — plus four
scalar bbox columns ``f_minlat / f_maxlat / f_minlon / f_maxlon``. Queries
run the reference's two phases as one Catalyst predicate: the scalar bbox
range condition is pushed down to the parquet scan (min-max row-group
pruning plays the BKD coarse traversal) and the exact phase is a
whole-stage-codegen higher-order-function expression (F.exists / F.forall
over ``f_tris`` with closed-form separating-axis tests) — no Python
anywhere in the plan, driver and distributed modes share the same column
expression. WITHIN needs no exact phase at all: a connected shape lies
within a convex box iff its bbox does.

Geometric semantics are CLOSED-region (boundary contact counts as
intersecting), matching the reference's effective behavior; the per-doc
relation aggregation follows ShapeQuery: INTERSECTS = any triangle,
DISJOINT = shape present and no triangle, WITHIN = shape present and every
triangle inside, CONTAINS = the triangle union covers the query box (all
four corners covered and no original-polygon boundary edge passes through
the open box interior).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ShapePolygon",
    "ShapeLine",
    "ShapePoint",
    "tessellate",
    "shape_schema_ddl",
    "shape_box_condition",
    "shape_polygon_condition",
    "tri_box_intersects_np",
    "point_in_tri_np",
]


# ---------------------------------------------------------------------------
# geometries (lucene/geo/Polygon.java, Line.java, Point.java roles)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ShapePolygon:
    """Simple polygon with optional holes (Polygon.java): ``lats``/``lons``
    are the shell ring (open or closed form accepted), ``holes`` a tuple of
    (lats, lons) rings. No dateline-crossing shells (documented subset, the
    same restriction as GeoPolygonQuery)."""

    lats: tuple
    lons: tuple
    holes: tuple = ()  # ((lats, lons), ...)


@dataclass(frozen=True)
class ShapeLine:
    lats: tuple
    lons: tuple


@dataclass(frozen=True)
class ShapePoint:
    lat: float
    lon: float


def _open_ring(lats, lons):
    lats, lons = list(map(float, lats)), list(map(float, lons))
    if len(lats) != len(lons):
        raise ValueError("lats/lons length mismatch")
    if len(lats) >= 2 and lats[0] == lats[-1] and lons[0] == lons[-1]:
        lats, lons = lats[:-1], lons[:-1]
    return lats, lons


def _signed_area(xs, ys):
    s = 0.0
    n = len(xs)
    for i in range(n):
        j = (i + 1) % n
        s += xs[i] * ys[j] - xs[j] * ys[i]
    return 0.5 * s


# ---------------------------------------------------------------------------
# tessellator (Tessellator.java role: ear clipping + hole bridges)
# ---------------------------------------------------------------------------


def _cross3(ox, oy, ax, ay, bx, by) -> float:
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _point_in_tri_strict_or_edge(px, py, ax, ay, bx, by, cx, cy) -> bool:
    """Closed point-in-triangle used by the ear test (any containment,
    including boundary, blocks an ear)."""
    if not (min(ax, bx, cx) <= px <= max(ax, bx, cx) and min(ay, by, cy) <= py <= max(ay, by, cy)):
        return False
    s1 = _cross3(ax, ay, bx, by, px, py)
    s2 = _cross3(bx, by, cx, cy, px, py)
    s3 = _cross3(cx, cy, ax, ay, px, py)
    return (s1 >= 0 and s2 >= 0 and s3 >= 0) or (s1 <= 0 and s2 <= 0 and s3 <= 0)


def tessellate(shape) -> list[tuple]:
    """Geometry → list of triangles
    ``(ax, ay, bx, by, cx, cy, ab, bc, ca)`` with x = lon, y = lat and
    ab/bc/ca True when that edge lies on the ORIGINAL geometry boundary
    (ShapeField isEdgefromPolygon role; bridge edges and ear diagonals are
    False). Lines yield flat triangles ``(a, b, a)`` and points degenerate
    ``(p, p, p)`` exactly as LatLonShape.createIndexableFields does
    (LatLonShape.java:135-160)."""
    if isinstance(shape, ShapePoint):
        x, y = float(shape.lon), float(shape.lat)
        return [(x, y, x, y, x, y, True, True, True)]
    if isinstance(shape, ShapeLine):
        lats, lons = list(map(float, shape.lats)), list(map(float, shape.lons))
        if len(lats) < 2:
            raise ValueError("line needs >= 2 points")
        out = []
        for i in range(len(lats) - 1):
            ax, ay, bx, by = lons[i], lats[i], lons[i + 1], lats[i + 1]
            out.append((ax, ay, bx, by, ax, ay, True, True, True))
        return out
    if not isinstance(shape, ShapePolygon):
        raise TypeError(f"unsupported shape: {type(shape).__name__}")

    sh_lats, sh_lons = _open_ring(shape.lats, shape.lons)
    if len(sh_lats) < 3:
        raise ValueError("polygon shell needs >= 3 points")
    # vertex list as (x, y, vid); input boundary edges as vid pairs
    verts: list[tuple] = []
    boundary: set[frozenset] = set()

    def _add_ring(lats, lons, want_ccw: bool):
        xs, ys = lons, lats
        if (_signed_area(xs, ys) > 0) != want_ccw:
            xs, ys = xs[::-1], ys[::-1]
        base = len(_all_pts)
        ids = list(range(base, base + len(xs)))
        for x, y in zip(xs, ys):
            _all_pts.append((x, y))
        for i in range(len(ids)):
            boundary.add(frozenset((ids[i], ids[(i + 1) % len(ids)])))
        return ids

    _all_pts: list[tuple] = []
    shell_ids = _add_ring(sh_lats, sh_lons, want_ccw=True)
    hole_rings = []
    for h in shape.holes:
        h_lats, h_lons = _open_ring(h[0], h[1])
        if len(h_lats) < 3:
            raise ValueError("hole needs >= 3 points")
        hole_rings.append(_add_ring(h_lats, h_lons, want_ccw=False))

    # ring as a cyclic list of vids over _all_pts
    ring = list(shell_ids)

    def _x(v):
        return _all_pts[v][0]

    def _y(v):
        return _all_pts[v][1]

    # hole elimination (Tessellator.eliminateHoles role): bridge each
    # hole's max-x vertex to a visible shell vertex found by casting a
    # +x ray onto the current ring (David Eberly's method, the same one
    # the reference cites).
    for hids in sorted(hole_rings, key=lambda ids: -max(_x(v) for v in ids)):
        mi = max(range(len(hids)), key=lambda i: (_x(hids[i]), _y(hids[i])))
        M = hids[mi]
        mx, my = _x(M), _y(M)
        # closest ring edge intersected by the +x ray from M
        best_t, best_edge = math.inf, None
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            ay_, by_ = _y(a), _y(b)
            if (ay_ > my) == (by_ > my):  # edge doesn't straddle the ray line
                continue
            t = _x(a) + (my - ay_) * (_x(b) - _x(a)) / (by_ - ay_)
            if t >= mx and t < best_t:
                best_t, best_edge = t, i
        if best_edge is None:
            raise ValueError("hole outside shell (no bridge target)")
        a, b = ring[best_edge], ring[(best_edge + 1) % len(ring)]
        P = a if _x(a) > _x(b) else b
        # prefer a reflex ring vertex inside triangle (M, I, P) closest in
        # angle to the ray (guards bridges crossing the ring)
        Ix, Iy = best_t, my
        cand, best_tan = P, math.inf
        for v in ring:
            vx, vy = _x(v), _y(v)
            if vx < mx or v in (a, b):
                continue
            if _point_in_tri_strict_or_edge(vx, vy, mx, my, Ix, Iy, _x(P), _y(P)):
                tan = abs(vy - my) / (vx - mx) if vx > mx else math.inf
                if tan < best_tan:
                    cand, best_tan = v, tan
        # splice: ring = [... cand, M, hole..., M', cand' ...] (duplicate
        # the two bridge endpoints, standard ear-clip hole join)
        ci = ring.index(cand)
        hole_cycle = hids[mi:] + hids[:mi]  # starts at M
        ring = ring[: ci + 1] + hole_cycle + [M, cand] + ring[ci + 1 :]

    # ear clipping (O(n^2); shapes are per-doc small)
    tris: list[tuple] = []

    def _emit(a, b, c):
        tris.append(
            (
                _x(a), _y(a), _x(b), _y(b), _x(c), _y(c),
                frozenset((a, b)) in boundary,
                frozenset((b, c)) in boundary,
                frozenset((c, a)) in boundary,
            )
        )

    guard = 0
    while len(ring) > 3:
        n = len(ring)
        clipped = False
        for i in range(n):
            a, b, c = ring[(i - 1) % n], ring[i], ring[(i + 1) % n]
            if _cross3(_x(a), _y(a), _x(b), _y(b), _x(c), _y(c)) <= 0:
                continue  # reflex or collinear — not an ear
            ok = True
            for v in ring:
                if v in (a, b, c) or (_x(v), _y(v)) in ((_x(a), _y(a)), (_x(b), _y(b)), (_x(c), _y(c))):
                    continue
                if _point_in_tri_strict_or_edge(_x(v), _y(v), _x(a), _y(a), _x(b), _y(b), _x(c), _y(c)):
                    ok = False
                    break
            if ok:
                _emit(a, b, c)
                ring.pop(i)
                clipped = True
                break
        if not clipped:
            # fallback: clip the first convex vertex (degenerate/collinear
            # leftovers); guards infinite loops on pathological input
            for i in range(len(ring)):
                a, b, c = ring[(i - 1) % len(ring)], ring[i], ring[(i + 1) % len(ring)]
                if _cross3(_x(a), _y(a), _x(b), _y(b), _x(c), _y(c)) > 0:
                    _emit(a, b, c)
                    ring.pop(i)
                    break
            else:
                raise ValueError("cannot tessellate polygon (self-intersecting?)")
        guard += 1
        if guard > 10_000:
            raise ValueError("tessellation did not converge")
    a, b, c = ring
    _emit(a, b, c)
    return tris


def shape_schema_ddl(field: str = "shape") -> str:
    """DDL for the tessellation column (docs-table side)."""
    return (
        f"{field}_tris array<struct<ax:double,ay:double,bx:double,by:double,"
        "cx:double,cy:double,ab:boolean,bc:boolean,ca:boolean>>"
    )


# ---------------------------------------------------------------------------
# Catalyst exact-phase predicates
# ---------------------------------------------------------------------------


def _xc(v) -> Column:
    return v if isinstance(v, Column) else F.lit(float(v))


def _cross_c(ox, oy, ax, ay, bx, by) -> Column:
    ox, oy, ax, ay, bx, by = map(_xc, (ox, oy, ax, ay, bx, by))
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _pin_tri_c(px, py, t) -> Column:
    """Closed point-in-triangle as a Column (bbox guard makes the
    degenerate flat/point triangles exact on-segment tests)."""
    px, py = _xc(px), _xc(py)
    ax, ay, bx, by, cx, cy = t["ax"], t["ay"], t["bx"], t["by"], t["cx"], t["cy"]
    s1 = _cross_c(ax, ay, bx, by, px, py)
    s2 = _cross_c(bx, by, cx, cy, px, py)
    s3 = _cross_c(cx, cy, ax, ay, px, py)
    z = F.lit(0.0)
    signs = ((s1 >= z) & (s2 >= z) & (s3 >= z)) | ((s1 <= z) & (s2 <= z) & (s3 <= z))
    bbox = (
        (px >= F.least(ax, bx, cx)) & (px <= F.greatest(ax, bx, cx))
        & (py >= F.least(ay, by, cy)) & (py <= F.greatest(ay, by, cy))
    )
    return bbox & signs


def _seg_box_closed_c(px, py, qx, qy, bminx, bminy, bmaxx, bmaxy) -> Column:
    """Closed segment-vs-box: bbox overlap AND box corners not all
    STRICTLY on one side of the segment line (exact for closed sets; a
    degenerate segment reduces to point-in-box)."""
    px, py, qx, qy = map(_xc, (px, py, qx, qy))
    ds = [
        _cross_c(px, py, qx, qy, F.lit(bx), F.lit(by))
        for bx, by in ((bminx, bminy), (bmaxx, bminy), (bmaxx, bmaxy), (bminx, bmaxy))
    ]
    straddle = (F.least(*ds) <= 0.0) & (F.greatest(*ds) >= 0.0)
    overlap = (
        (F.greatest(px, qx) >= bminx) & (F.least(px, qx) <= bmaxx)
        & (F.greatest(py, qy) >= bminy) & (F.least(py, qy) <= bmaxy)
    )
    return overlap & straddle


def _tri_box_intersects_c(t, bminx, bminy, bmaxx, bmaxy) -> Column:
    """Closed triangle-vs-box intersection: any triangle vertex in the
    box, any box corner in the triangle, or any triangle edge meeting
    the box (the classic complete decomposition; exact for closed
    regions including the reference's degenerate line/point
    triangles)."""
    ax, ay, bx, by, cx, cy = t["ax"], t["ay"], t["bx"], t["by"], t["cx"], t["cy"]

    def vin(x, y):
        return (x >= bminx) & (x <= bmaxx) & (y >= bminy) & (y <= bmaxy)

    v_in = vin(ax, ay) | vin(bx, by) | vin(cx, cy)
    corner_in = F.lit(False)
    for kx, ky in ((bminx, bminy), (bmaxx, bminy), (bmaxx, bmaxy), (bminx, bmaxy)):
        corner_in = corner_in | _pin_tri_c(kx, ky, t)
    edge = F.lit(False)
    for p, q in (((ax, ay), (bx, by)), ((bx, by), (cx, cy)), ((cx, cy), (ax, ay))):
        edge = edge | _seg_box_closed_c(p[0], p[1], q[0], q[1], bminx, bminy, bmaxx, bmaxy)
    return v_in | corner_in | edge


def _edge_crosses_open_box_c(px, py, qx, qy, bminx, bminy, bmaxx, bmaxy) -> Column:
    """Segment meets the OPEN box interior: an endpoint strictly inside,
    or the segment line strictly separates box corners while the
    segment's bbox overlaps the open box on both axes (interval/Helly
    argument; used by the CONTAINS relation's boundary test)."""
    px, py, qx, qy = map(_xc, (px, py, qx, qy))

    def pin_open(x, y):
        return (x > bminx) & (x < bmaxx) & (y > bminy) & (y < bmaxy)

    ds = [
        _cross_c(px, py, qx, qy, F.lit(bx), F.lit(by))
        for bx, by in ((bminx, bminy), (bmaxx, bminy), (bmaxx, bmaxy), (bminx, bmaxy))
    ]
    strict = (F.least(*ds) < 0.0) & (F.greatest(*ds) > 0.0)
    open_overlap = (
        (F.greatest(px, qx) > bminx) & (F.least(px, qx) < bmaxx)
        & (F.greatest(py, qy) > bminy) & (F.least(py, qy) < bmaxy)
    )
    return pin_open(px, py) | pin_open(qx, qy) | (strict & open_overlap)


def shape_box_condition(q) -> Column:
    """Docs-table predicate for ShapeBoxQuery (ast.ShapeBoxQuery): the
    scalar bbox phase (parquet-prunable) AND the exact triangle phase as
    a higher-order-function expression over ``{field}_tris``."""
    f = q.field
    tris = F.col(f"{f}_tris")
    has = tris.isNotNull() & (F.size(tris) > 0)
    bminx, bminy = float(q.min_lon), float(q.min_lat)
    bmaxx, bmaxy = float(q.max_lon), float(q.max_lat)
    if bminx > bmaxx:
        raise ValueError("dateline-crossing boxes unsupported for shapes (documented subset)")
    bbox_overlap = (
        (F.col(f"{f}_minlon") <= bmaxx) & (F.col(f"{f}_maxlon") >= bminx)
        & (F.col(f"{f}_minlat") <= bmaxy) & (F.col(f"{f}_maxlat") >= bminy)
    )
    bbox_within = (
        (F.col(f"{f}_minlon") >= bminx) & (F.col(f"{f}_maxlon") <= bmaxx)
        & (F.col(f"{f}_minlat") >= bminy) & (F.col(f"{f}_maxlat") <= bmaxy)
    )
    intersects = has & bbox_overlap & F.exists(
        tris, lambda t: _tri_box_intersects_c(t, bminx, bminy, bmaxx, bmaxy)
    )
    if q.relation == "intersects":
        return intersects
    if q.relation == "within":
        # a connected shape is inside a convex box iff its bbox is — the
        # exact phase is free (pure pushed-down scalar range predicate)
        return has & bbox_within
    if q.relation == "disjoint":
        return has & ~(bbox_overlap & F.exists(
            tris, lambda t: _tri_box_intersects_c(t, bminx, bminy, bmaxx, bmaxy)
        ))
    if q.relation == "contains":
        # box ⊆ triangle-union: all four corners covered by some triangle
        # and no ORIGINAL-boundary edge passes through the open interior
        # (ShapeField isEdgefromPolygon flags drive the boundary test)
        def _corner_covered(kx, ky):
            def fn(t):
                return _pin_tri_c(kx, ky, t)

            return fn

        corners = F.lit(True)
        for kx, ky in ((bminx, bminy), (bmaxx, bminy), (bmaxx, bmaxy), (bminx, bmaxy)):
            corners = corners & F.exists(tris, _corner_covered(kx, ky))
        boundary_cross = F.exists(
            tris,
            lambda t: (
                (t["ab"] & _edge_crosses_open_box_c(t["ax"], t["ay"], t["bx"], t["by"], bminx, bminy, bmaxx, bmaxy))
                | (t["bc"] & _edge_crosses_open_box_c(t["bx"], t["by"], t["cx"], t["cy"], bminx, bminy, bmaxx, bmaxy))
                | (t["ca"] & _edge_crosses_open_box_c(t["cx"], t["cy"], t["ax"], t["ay"], bminx, bminy, bmaxx, bmaxy))
            ),
        )
        return has & corners & ~boundary_cross
    raise ValueError(f"unsupported shape-box relation {q.relation!r}")


def _seg_seg_closed_c(ax, ay, bx, by, cx, cy, dx, dy) -> Column:
    """Closed segment-segment intersection: straddle-or-touch both ways
    plus the bbox overlap that disambiguates the collinear case."""
    ax, ay, bx, by = map(_xc, (ax, ay, bx, by))
    cx, cy, dx, dy = map(_xc, (cx, cy, dx, dy))
    o1 = _cross_c(ax, ay, bx, by, cx, cy)
    o2 = _cross_c(ax, ay, bx, by, dx, dy)
    o3 = _cross_c(cx, cy, dx, dy, ax, ay)
    o4 = _cross_c(cx, cy, dx, dy, bx, by)
    overlap = (
        (F.greatest(ax, bx) >= F.least(cx, dx)) & (F.least(ax, bx) <= F.greatest(cx, dx))
        & (F.greatest(ay, by) >= F.least(cy, dy)) & (F.least(ay, by) <= F.greatest(cy, dy))
    )
    return overlap & (o1 * o2 <= 0.0) & (o3 * o4 <= 0.0)


def _pin_tri_const(px: Column, py: Column, qt: tuple) -> Column:
    """Closed point-in-CONSTANT-triangle (query-side triangle as lits)."""
    ax, ay, bx, by, cx, cy = qt[:6]
    s1 = _cross_c(ax, ay, bx, by, px, py)
    s2 = _cross_c(bx, by, cx, cy, px, py)
    s3 = _cross_c(cx, cy, ax, ay, px, py)
    z = F.lit(0.0)
    signs = ((s1 >= z) & (s2 >= z) & (s3 >= z)) | ((s1 <= z) & (s2 <= z) & (s3 <= z))
    bbox = (
        (px >= min(ax, bx, cx)) & (px <= max(ax, bx, cx))
        & (py >= min(ay, by, cy)) & (py <= max(ay, by, cy))
    )
    return bbox & signs


def _tri_tri_closed_c(t, qt: tuple) -> Column:
    """Closed doc-triangle vs constant query-triangle intersection:
    vertex containment both ways or any edge pair meeting."""
    ax, ay, bx, by, cx, cy = t["ax"], t["ay"], t["bx"], t["by"], t["cx"], t["cy"]
    cond = (
        _pin_tri_const(ax, ay, qt) | _pin_tri_const(bx, by, qt) | _pin_tri_const(cx, cy, qt)
    )
    for kx, ky in ((qt[0], qt[1]), (qt[2], qt[3]), (qt[4], qt[5])):
        cond = cond | _pin_tri_c(kx, ky, t)
    doc_edges = (((ax, ay), (bx, by)), ((bx, by), (cx, cy)), ((cx, cy), (ax, ay)))
    q_edges = (
        (qt[0], qt[1], qt[2], qt[3]),
        (qt[2], qt[3], qt[4], qt[5]),
        (qt[4], qt[5], qt[0], qt[1]),
    )
    for (p, r) in doc_edges:
        for (ex, ey, fx, fy) in q_edges:
            cond = cond | _seg_seg_closed_c(p[0], p[1], r[0], r[1], ex, ey, fx, fy)
    return cond


def shape_polygon_condition(q) -> Column:
    """Docs-table predicate for ShapePolygonQuery: the query polygon is
    tessellated at plan time (Tessellator role) into constant triangles;
    the exact phase tests doc triangles against them. Relations:
    intersects / disjoint / within (within = every doc triangle's
    vertices inside the polygon by even-odd ray cast and no doc edge
    crossing an original polygon boundary edge)."""
    f = q.field
    poly = ShapePolygon(
        tuple(p[0] for p in q.points),
        tuple(p[1] for p in q.points),
        tuple((tuple(p[0] for p in h), tuple(p[1] for p in h)) for h in q.holes),
    )
    qtris = tessellate(poly)
    tris = F.col(f"{f}_tris")
    has = tris.isNotNull() & (F.size(tris) > 0)
    all_lats = [p[0] for p in q.points] + [p[0] for h in q.holes for p in h]
    all_lons = [p[1] for p in q.points] + [p[1] for h in q.holes for p in h]
    bminx, bmaxx = min(all_lons), max(all_lons)
    bminy, bmaxy = min(all_lats), max(all_lats)
    bbox_overlap = (
        (F.col(f"{f}_minlon") <= bmaxx) & (F.col(f"{f}_maxlon") >= bminx)
        & (F.col(f"{f}_minlat") <= bmaxy) & (F.col(f"{f}_maxlat") >= bminy)
    )

    def any_tri(t):
        c = F.lit(False)
        for qt in qtris:
            c = c | _tri_tri_closed_c(t, qt)
        return c

    intersects = has & bbox_overlap & F.exists(tris, any_tri)
    if q.relation == "intersects":
        return intersects
    if q.relation == "disjoint":
        return has & ~(bbox_overlap & F.exists(tris, any_tri))
    if q.relation == "within":
        # every doc-triangle vertex inside the polygon (even-odd over the
        # ORIGINAL rings, the GeoPolygonQuery convention) and no doc edge
        # crossing any original boundary edge
        shell = [(float(p[1]), float(p[0])) for p in q.points]  # (x, y)
        rings = [shell] + [[(float(p[1]), float(p[0])) for p in h] for h in q.holes]
        for r in rings:
            if len(r) >= 2 and r[0] == r[-1]:
                r.pop()

        def ray_cast(px: Column, py: Column) -> Column:
            inside = F.lit(False)
            for ring in rings:
                n = len(ring)
                for i in range(n):
                    x1, y1 = ring[i]
                    x2, y2 = ring[(i + 1) % n]
                    if y1 == y2:
                        continue
                    crosses = ((F.lit(y1) > py) != (F.lit(y2) > py)) & (
                        px < (F.lit(x2 - x1) * (py - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1))
                    )
                    inside = F.when(crosses, ~inside).otherwise(inside)
            return inside

        def tri_within(t):
            c = F.lit(True)
            for vx, vy in ((t["ax"], t["ay"]), (t["bx"], t["by"]), (t["cx"], t["cy"])):
                c = c & ray_cast(vx, vy)
            doc_edges = (
                (t["ax"], t["ay"], t["bx"], t["by"]),
                (t["bx"], t["by"], t["cx"], t["cy"]),
                (t["cx"], t["cy"], t["ax"], t["ay"]),
            )
            for ring in rings:
                n = len(ring)
                for i in range(n):
                    x1, y1 = ring[i]
                    x2, y2 = ring[(i + 1) % n]
                    for (px, py, qx, qy) in doc_edges:
                        # proper crossings only: boundary touch stays within
                        o1 = _cross_c(px, py, qx, qy, F.lit(x1), F.lit(y1))
                        o2 = _cross_c(px, py, qx, qy, F.lit(x2), F.lit(y2))
                        o3 = _cross_c(F.lit(x1), F.lit(y1), F.lit(x2), F.lit(y2), px, py)
                        o4 = _cross_c(F.lit(x1), F.lit(y1), F.lit(x2), F.lit(y2), qx, qy)
                        c = c & ~((o1 * o2 < 0.0) & (o3 * o4 < 0.0))
            return c

        return has & bbox_overlap & F.forall(tris, tri_within)
    raise ValueError(f"unsupported shape-polygon relation {q.relation!r} (CONTAINS is box-only)")


def shape_point_condition(q) -> Column:
    """Docs-table predicate for ShapePointQuery (LatLonShape.newPointQuery
    role): geometries containing/intersecting the query point — one
    point-in-triangle test per tessellation triangle, closed semantics.
    Relations: intersects / disjoint."""
    f = q.field
    tris = F.col(f"{f}_tris")
    has = tris.isNotNull() & (F.size(tris) > 0)
    px, py = float(q.lon), float(q.lat)
    bbox = (
        (F.col(f"{f}_minlon") <= px) & (F.col(f"{f}_maxlon") >= px)
        & (F.col(f"{f}_minlat") <= py) & (F.col(f"{f}_maxlat") >= py)
    )
    hit = bbox & F.exists(tris, lambda t: _pin_tri_c(px, py, t))
    if q.relation == "intersects":
        return has & hit
    if q.relation == "disjoint":
        return has & ~hit
    raise ValueError(f"unsupported shape-point relation {q.relation!r}")


def _seg_seg_const_c(p, r, c, d) -> Column:
    """Closed segment-segment with one CONSTANT segment (c, d)."""
    return _seg_seg_closed_c(p[0], p[1], r[0], r[1], c[0], c[1], d[0], d[1])


def shape_line_condition(q) -> Column:
    """Docs-table predicate for ShapeLineQuery (LatLonShape.newLineQuery
    role): geometries meeting the query polyline. A segment meets a
    closed triangle iff an endpoint lies inside or it crosses an edge
    (segments have no interior of their own). Relations: intersects /
    disjoint (WITHIN/CONTAINS are degenerate for line queries — the
    reference's javadoc makes the same restriction)."""
    f = q.field
    tris = F.col(f"{f}_tris")
    has = tris.isNotNull() & (F.size(tris) > 0)
    pts = [(float(lon), float(lat)) for lat, lon in q.points]
    if len(pts) < 2:
        raise ValueError("line query needs >= 2 points")
    segs = list(zip(pts, pts[1:]))
    all_x = [p[0] for p in pts]
    all_y = [p[1] for p in pts]
    bbox_overlap = (
        (F.col(f"{f}_minlon") <= max(all_x)) & (F.col(f"{f}_maxlon") >= min(all_x))
        & (F.col(f"{f}_minlat") <= max(all_y)) & (F.col(f"{f}_maxlat") >= min(all_y))
    )

    def tri_hits_line(t):
        cond = F.lit(False)
        for c, d in segs:
            cond = cond | _pin_tri_c(c[0], c[1], t) | _pin_tri_c(d[0], d[1], t)
            doc_edges = (
                ((t["ax"], t["ay"]), (t["bx"], t["by"])),
                ((t["bx"], t["by"]), (t["cx"], t["cy"])),
                ((t["cx"], t["cy"]), (t["ax"], t["ay"])),
            )
            for p, r in doc_edges:
                cond = cond | _seg_seg_const_c(p, r, c, d)
        return cond

    hit = bbox_overlap & F.exists(tris, tri_hits_line)
    if q.relation == "intersects":
        return has & hit
    if q.relation == "disjoint":
        return has & ~hit
    raise ValueError(f"unsupported shape-line relation {q.relation!r}")


# ---------------------------------------------------------------------------
# numpy twins (test oracles; same closed semantics, same formulas)
# ---------------------------------------------------------------------------


def point_in_tri_np(px, py, tri) -> bool:
    ax, ay, bx, by, cx, cy = tri[:6]
    if not (min(ax, bx, cx) <= px <= max(ax, bx, cx) and min(ay, by, cy) <= py <= max(ay, by, cy)):
        return False
    s1 = _cross3(ax, ay, bx, by, px, py)
    s2 = _cross3(bx, by, cx, cy, px, py)
    s3 = _cross3(cx, cy, ax, ay, px, py)
    return (s1 >= 0 and s2 >= 0 and s3 >= 0) or (s1 <= 0 and s2 <= 0 and s3 <= 0)


def _seg_box_closed_np(px, py, qx, qy, bminx, bminy, bmaxx, bmaxy) -> bool:
    if max(px, qx) < bminx or min(px, qx) > bmaxx or max(py, qy) < bminy or min(py, qy) > bmaxy:
        return False
    ds = [
        _cross3(px, py, qx, qy, bx, by)
        for bx, by in ((bminx, bminy), (bmaxx, bminy), (bmaxx, bmaxy), (bminx, bmaxy))
    ]
    return min(ds) <= 0 <= max(ds)


def tri_box_intersects_np(tri, bminx, bminy, bmaxx, bmaxy) -> bool:
    ax, ay, bx, by, cx, cy = tri[:6]
    for x, y in ((ax, ay), (bx, by), (cx, cy)):
        if bminx <= x <= bmaxx and bminy <= y <= bmaxy:
            return True
    for kx, ky in ((bminx, bminy), (bmaxx, bminy), (bmaxx, bmaxy), (bminx, bmaxy)):
        if point_in_tri_np(kx, ky, tri):
            return True
    for p, r in (((ax, ay), (bx, by)), ((bx, by), (cx, cy)), ((cx, cy), (ax, ay))):
        if _seg_box_closed_np(p[0], p[1], r[0], r[1], bminx, bminy, bmaxx, bmaxy):
            return True
    return False
