"""LatLonShape role — tessellator invariants, closed-geometry predicate
exactness, Catalyst/numpy parity, and e2e box/polygon shape queries in
driver and distributed modes."""

from __future__ import annotations

import math
import random
import shutil

import pytest

from lucene_spark.fixtures import make_corpus
from lucene_spark.index.builder import IndexBuilder, IndexConfig, assign_doc_ids
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.shapes import (
    ShapeLine,
    ShapePoint,
    ShapePolygon,
    point_in_tri_np,
    tessellate,
    tri_box_intersects_np,
)


def _tri_area(t):
    ax, ay, bx, by, cx, cy = t[:6]
    return abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) / 2.0


def _poly_area(lats, lons):
    n = len(lats)
    s = 0.0
    for i in range(n):
        j = (i + 1) % n
        s += lons[i] * lats[j] - lons[j] * lats[i]
    return abs(s) / 2.0


def _ray_cast(px, py, rings):
    """Independent even-odd point-in-polygon over (x, y) rings."""
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                inside = not inside
    return inside


CONCAVE = ShapePolygon((0.0, 0.0, 4.0, 4.0, 2.0, 2.0), (0.0, 4.0, 4.0, 2.0, 2.0, 0.0))
HOLED = ShapePolygon(
    (0.0, 0.0, 6.0, 6.0),
    (0.0, 6.0, 6.0, 0.0),
    holes=(((2.0, 2.0, 4.0, 4.0), (2.0, 4.0, 4.0, 2.0)),),
)


class TestTessellator:
    def test_square_two_triangles_area(self):
        sq = ShapePolygon((0.0, 0.0, 2.0, 2.0), (0.0, 2.0, 2.0, 0.0))
        tris = tessellate(sq)
        assert len(tris) == 2
        assert sum(_tri_area(t) for t in tris) == pytest.approx(4.0)

    def test_concave_area(self):
        tris = tessellate(CONCAVE)
        assert len(tris) == 4  # 6 vertices -> n-2
        assert sum(_tri_area(t) for t in tris) == pytest.approx(
            _poly_area(CONCAVE.lats, CONCAVE.lons)
        )

    def test_holed_area_and_coverage(self):
        tris = tessellate(HOLED)
        assert sum(_tri_area(t) for t in tris) == pytest.approx(36.0 - 4.0)
        rings = [
            list(zip(HOLED.lons, HOLED.lats)),
            list(zip(HOLED.holes[0][1], HOLED.holes[0][0])),
        ]
        rng = random.Random(7)
        for _ in range(300):
            px, py = rng.uniform(-1, 7), rng.uniform(-1, 7)
            # stay away from every boundary segment (closed-vs-open fuzz)
            if min(abs(px - v) for v in (0, 2, 4, 6)) < 1e-6 or min(
                abs(py - v) for v in (0, 2, 4, 6)
            ) < 1e-6:
                continue
            want = _ray_cast(px, py, rings)
            got = any(point_in_tri_np(px, py, t) for t in tris)
            assert got == want, (px, py)

    def test_boundary_flags_square(self):
        sq = ShapePolygon((0.0, 0.0, 2.0, 2.0), (0.0, 2.0, 2.0, 0.0))
        tris = tessellate(sq)
        flagged = sum(int(t[6]) + int(t[7]) + int(t[8]) for t in tris)
        assert flagged == 4  # the 4 input edges; the shared diagonal unflagged

    def test_holed_bridge_edges_unflagged(self):
        tris = tessellate(HOLED)
        flagged = sum(int(t[6]) + int(t[7]) + int(t[8]) for t in tris)
        assert flagged == 8  # 4 shell + 4 hole edges; bridges/diagonals not

    def test_line_flat_triangles(self):
        tris = tessellate(ShapeLine((0.0, 1.0, 1.0), (0.0, 0.0, 2.0)))
        assert len(tris) == 2
        assert tris[0][:6] == (0.0, 0.0, 0.0, 1.0, 0.0, 0.0)

    def test_point_degenerate(self):
        tris = tessellate(ShapePoint(3.0, 5.0))
        assert tris == [(5.0, 3.0, 5.0, 3.0, 5.0, 3.0, True, True, True)]


class TestPredicatesNp:
    TRI = (0.0, 0.0, 4.0, 0.0, 0.0, 4.0, True, True, True)

    def test_disjoint(self):
        assert not tri_box_intersects_np(self.TRI, 5.0, 5.0, 6.0, 6.0)

    def test_vertex_touch_counts(self):
        assert tri_box_intersects_np(self.TRI, 4.0, -1.0, 5.0, 0.0)  # corner (4,0)

    def test_edge_tangent_counts(self):
        # box touching the hypotenuse line x+y=4 at exactly one point
        assert tri_box_intersects_np(self.TRI, 2.0, 2.0, 5.0, 5.0)

    def test_box_inside_triangle(self):
        assert tri_box_intersects_np(self.TRI, 0.5, 0.5, 1.0, 1.0)

    def test_triangle_inside_box(self):
        assert tri_box_intersects_np(self.TRI, -1.0, -1.0, 5.0, 5.0)

    def test_edge_cross_no_vertex_containment(self):
        # thin box crossing the triangle's interior: no tri vertex in box,
        # no box corner in tri
        assert tri_box_intersects_np(self.TRI, 1.0, -1.0, 1.5, 5.0)

    def test_degenerate_line_triangle(self):
        seg = (0.0, 0.0, 4.0, 4.0, 0.0, 0.0, True, True, True)
        assert tri_box_intersects_np(seg, 1.0, 1.0, 2.0, 2.0)  # passes through
        assert not tri_box_intersects_np(seg, 3.0, 0.0, 4.0, 0.5)  # below the line

    def test_degenerate_point_triangle(self):
        pt = (2.0, 3.0, 2.0, 3.0, 2.0, 3.0, True, True, True)
        assert tri_box_intersects_np(pt, 1.0, 2.0, 3.0, 4.0)
        assert not tri_box_intersects_np(pt, 4.0, 4.0, 5.0, 5.0)

    def test_grid_sanity_fuzz(self):
        """When the exact test says DISJOINT, no box grid sample may lie
        in the triangle and no triangle vertex in the box (independent
        one-directional rasterized check)."""
        rng = random.Random(42)
        for _ in range(200):
            tri = tuple(rng.uniform(-10, 10) for _ in range(6)) + (True, True, True)
            x0, y0 = rng.uniform(-10, 10), rng.uniform(-10, 10)
            box = (x0, y0, x0 + rng.uniform(0.1, 6), y0 + rng.uniform(0.1, 6))
            if not tri_box_intersects_np(tri, *box):
                for i in range(6):
                    for j in range(6):
                        px = box[0] + (box[2] - box[0]) * i / 5
                        py = box[1] + (box[3] - box[1]) * j / 5
                        assert not point_in_tri_np(px, py, tri)


def _np_contains(tris, bminx, bminy, bmaxx, bmaxy):
    """Box ⊆ triangle-union (numpy twin of the CONTAINS relation)."""
    corners = ((bminx, bminy), (bmaxx, bminy), (bmaxx, bmaxy), (bminx, bmaxy))
    if not all(any(point_in_tri_np(kx, ky, t) for t in tris) for kx, ky in corners):
        return False

    def crosses_open(px, py, qx, qy):
        if bminx < px < bmaxx and bminy < py < bmaxy:
            return True
        if bminx < qx < bmaxx and bminy < qy < bmaxy:
            return True
        ds = [
            (qx - px) * (by - py) - (qy - py) * (bx - px)
            for bx, by in corners
        ]
        strict = min(ds) < 0 < max(ds)
        open_overlap = (
            max(px, qx) > bminx and min(px, qx) < bmaxx
            and max(py, qy) > bminy and min(py, qy) < bmaxy
        )
        return strict and open_overlap

    for t in tris:
        edges = (
            (t[0], t[1], t[2], t[3], t[6]),
            (t[2], t[3], t[4], t[5], t[7]),
            (t[4], t[5], t[0], t[1], t[8]),
        )
        for px, py, qx, qy, flag in edges:
            if flag and crosses_open(px, py, qx, qy):
                return False
    return True


def _doc_shape(i):
    """Deterministic per-doc geometry mix used by the e2e fixtures."""
    rng = random.Random(1000 + i)
    cx, cy = rng.uniform(-8, 8), rng.uniform(-8, 8)
    kind = i % 5
    if kind == 0:  # triangle
        pts = [(cy + rng.uniform(0.5, 2), cx + rng.uniform(0.5, 2)) for _ in range(1)]
        return ShapePolygon(
            (cy, cy + rng.uniform(1, 3), cy + rng.uniform(-3, -1)),
            (cx, cx + rng.uniform(1, 3), cx + rng.uniform(1, 2)),
        )
    if kind == 1:  # axis-aligned quad
        w, h = rng.uniform(0.5, 3), rng.uniform(0.5, 3)
        return ShapePolygon((cy, cy, cy + h, cy + h), (cx, cx + w, cx + w, cx))
    if kind == 2:  # concave hexagon
        return ShapePolygon(
            (cy, cy, cy + 2, cy + 2, cy + 1, cy + 1),
            (cx, cx + 2, cx + 2, cx + 1, cx + 1, cx),
        )
    if kind == 3:  # line
        return ShapeLine((cy, cy + rng.uniform(-2, 2), cy + rng.uniform(-2, 2)),
                         (cx, cx + rng.uniform(-2, 2), cx + rng.uniform(-2, 2)))
    return ShapePoint(cy, cx)


TRI_SCHEMA = (
    "array<struct<ax:double,ay:double,bx:double,by:double,"
    "cx:double,cy:double,ab:boolean,bc:boolean,ca:boolean>>"
)


@pytest.fixture(scope="module")
def shape_index(tmp_path_factory, spark):
    """80-doc index whose docs carry a tessellated shape column; docs
    with doc_id % 7 == 6 have NO shape (null relation semantics)."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = make_corpus(n_docs=80, seed=29)
    rows = []
    shapes = {}
    for i in range(80):
        if i % 7 == 6:
            rows.append((i, None, None, None, None, None))
            continue
        tris = tessellate(_doc_shape(i))
        shapes[i] = tris
        xs = [v for t in tris for v in (t[0], t[2], t[4])]
        ys = [v for t in tris for v in (t[1], t[3], t[5])]
        rows.append((i, [tuple(t) for t in tris], min(ys), max(ys), min(xs), max(xs)))
    sdf = spark.createDataFrame(
        rows,
        schema=(
            f"doc_id long, shape_tris {TRI_SCHEMA}, shape_minlat double, "
            "shape_maxlat double, shape_minlon double, shape_maxlon double"
        ),
    )
    base = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
    df = base.join(sdf, "doc_id")
    d = str(tmp_path_factory.mktemp("ix_shapes"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=32, term_buckets=2)).build(
        df, d, assign_ids=False
    )
    yield SearchIndex(spark, d), shapes
    shutil.rmtree(d, ignore_errors=True)


BOX = (-2.0, 3.0, -4.0, 5.0)  # min_lat, max_lat, min_lon, max_lon


def _brute_box(shapes, relation):
    bminy, bmaxy, bminx, bmaxx = BOX
    out = set()
    for i, tris in shapes.items():
        inter = any(tri_box_intersects_np(t, bminx, bminy, bmaxx, bmaxy) for t in tris)
        xs = [v for t in tris for v in (t[0], t[2], t[4])]
        ys = [v for t in tris for v in (t[1], t[3], t[5])]
        within = (
            min(xs) >= bminx and max(xs) <= bmaxx and min(ys) >= bminy and max(ys) <= bmaxy
        )
        contains = _np_contains(tris, bminx, bminy, bmaxx, bmaxy)
        ok = {
            "intersects": inter,
            "disjoint": not inter,
            "within": within,
            "contains": contains,
        }[relation]
        if ok:
            out.add(i)
    return out


class TestShapeBoxE2E:
    @pytest.mark.parametrize("relation", ["intersects", "within", "disjoint", "contains"])
    def test_relation_matches_brute(self, spark, shape_index, relation):
        index, shapes = shape_index
        s = Searcher(index)
        td = s.search(A.ShapeBoxQuery("shape", *BOX, relation=relation), k=1000)
        got = {d for d, _ in td.hits}
        assert got == _brute_box(shapes, relation), relation
        assert all(x == 1.0 for _, x in td.hits)

    def test_no_shape_docs_never_match(self, shape_index):
        index, _ = shape_index
        s = Searcher(index)
        for rel in ("intersects", "within", "disjoint", "contains"):
            got = {d for d, _ in s.search(A.ShapeBoxQuery("shape", *BOX, relation=rel), k=1000).hits}
            assert not any(d % 7 == 6 for d in got), rel

    def test_distributed_equals_driver(self, shape_index):
        index, _ = shape_index
        s = Searcher(index)
        for rel in ("intersects", "disjoint", "contains"):
            q = A.BooleanQuery(
                (
                    (A.Occur.MUST, A.TermQuery("return")),
                    (A.Occur.FILTER, A.ShapeBoxQuery("shape", *BOX, relation=rel)),
                )
            )
            drv = s.search(q, k=50).hits
            dist = s.search(q, k=50, mode="distributed").hits
            assert [(d, round(x, 5)) for d, x in drv] == [(d, round(x, 5)) for d, x in dist]


QPOLY = ((-3.0, -5.0), (-3.0, 4.0), (2.0, 6.0), (5.0, 0.0), (1.0, -6.0))  # convex-ish pentagon
QPOLY_HOLE = (((-1.0, -2.0), (-1.0, 1.0), (2.0, 1.0), (2.0, -2.0)),)


def _np_seg_seg(ax, ay, bx, by, cx, cy, dx, dy):
    def cr(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    if (
        max(ax, bx) < min(cx, dx) or min(ax, bx) > max(cx, dx)
        or max(ay, by) < min(cy, dy) or min(ay, by) > max(cy, dy)
    ):
        return False
    o1 = cr(ax, ay, bx, by, cx, cy)
    o2 = cr(ax, ay, bx, by, dx, dy)
    o3 = cr(cx, cy, dx, dy, ax, ay)
    o4 = cr(cx, cy, dx, dy, bx, by)
    return o1 * o2 <= 0 and o3 * o4 <= 0


def _np_tri_tri(t, q):
    for x, y in ((t[0], t[1]), (t[2], t[3]), (t[4], t[5])):
        if point_in_tri_np(x, y, q):
            return True
    for x, y in ((q[0], q[1]), (q[2], q[3]), (q[4], q[5])):
        if point_in_tri_np(x, y, t):
            return True
    te = ((t[0], t[1], t[2], t[3]), (t[2], t[3], t[4], t[5]), (t[4], t[5], t[0], t[1]))
    qe = ((q[0], q[1], q[2], q[3]), (q[2], q[3], q[4], q[5]), (q[4], q[5], q[0], q[1]))
    return any(_np_seg_seg(*a, *b) for a in te for b in qe)


class TestShapePolygonE2E:
    def _qtris(self, points, holes):
        return tessellate(
            ShapePolygon(
                tuple(p[0] for p in points),
                tuple(p[1] for p in points),
                tuple((tuple(p[0] for p in h), tuple(p[1] for p in h)) for h in holes),
            )
        )

    @pytest.mark.parametrize("holes", [(), QPOLY_HOLE])
    def test_intersects_matches_brute(self, shape_index, holes):
        index, shapes = shape_index
        s = Searcher(index)
        qtris = self._qtris(QPOLY, holes)
        td = s.search(A.ShapePolygonQuery("shape", QPOLY, holes), k=1000)
        got = {d for d, _ in td.hits}
        want = {
            i
            for i, tris in shapes.items()
            if any(_np_tri_tri(t, qt) for t in tris for qt in qtris)
        }
        assert got == want

    def test_disjoint_is_complement_over_shaped_docs(self, shape_index):
        index, shapes = shape_index
        s = Searcher(index)
        inter = {d for d, _ in s.search(A.ShapePolygonQuery("shape", QPOLY), k=1000).hits}
        disj = {
            d
            for d, _ in s.search(
                A.ShapePolygonQuery("shape", QPOLY, relation="disjoint"), k=1000
            ).hits
        }
        assert inter | disj == set(shapes)
        assert not inter & disj

    def test_within_matches_brute(self, shape_index):
        index, shapes = shape_index
        s = Searcher(index)
        got = {
            d
            for d, _ in s.search(
                A.ShapePolygonQuery("shape", QPOLY, relation="within"), k=1000
            ).hits
        }
        rings = [[(p[1], p[0]) for p in QPOLY]]
        want = set()
        for i, tris in shapes.items():
            ok = True
            for t in tris:
                for x, y in ((t[0], t[1]), (t[2], t[3]), (t[4], t[5])):
                    if not _ray_cast(x, y, rings):
                        ok = False
            # no proper edge crossing with the polygon boundary
            n = len(rings[0])
            for t in tris:
                te = ((t[0], t[1], t[2], t[3]), (t[2], t[3], t[4], t[5]), (t[4], t[5], t[0], t[1]))
                for k in range(n):
                    x1, y1 = rings[0][k]
                    x2, y2 = rings[0][(k + 1) % n]
                    for (px, py, qx, qy) in te:
                        o1 = (qx - px) * (y1 - py) - (qy - py) * (x1 - px)
                        o2 = (qx - px) * (y2 - py) - (qy - py) * (x2 - px)
                        o3 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                        o4 = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
                        if o1 * o2 < 0 and o3 * o4 < 0:
                            ok = False
            if ok:
                want.add(i)
        assert got == want

    def test_distributed_equals_driver(self, shape_index):
        index, _ = shape_index
        s = Searcher(index)
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("data")),
                (A.Occur.FILTER, A.ShapePolygonQuery("shape", QPOLY)),
            )
        )
        drv = s.search(q, k=50).hits
        dist = s.search(q, k=50, mode="distributed").hits
        assert [(d, round(x, 5)) for d, x in drv] == [(d, round(x, 5)) for d, x in dist]


QPOINT = (1.0, -2.0)  # (lat, lon)
QLINE = ((-8.0, -9.0), (2.0, 1.0), (8.0, -3.0))  # polyline (lat, lon)


class TestShapePointLineE2E:
    def test_point_matches_brute(self, shape_index):
        index, shapes = shape_index
        s = Searcher(index)
        got = {
            d for d, _ in s.search(A.ShapePointQuery("shape", *QPOINT), k=1000).hits
        }
        want = {
            i
            for i, tris in shapes.items()
            if any(point_in_tri_np(QPOINT[1], QPOINT[0], t) for t in tris)
        }
        assert got == want

    def test_point_disjoint_complement(self, shape_index):
        index, shapes = shape_index
        s = Searcher(index)
        inter = {d for d, _ in s.search(A.ShapePointQuery("shape", *QPOINT), k=1000).hits}
        disj = {
            d
            for d, _ in s.search(
                A.ShapePointQuery("shape", *QPOINT, relation="disjoint"), k=1000
            ).hits
        }
        assert inter | disj == set(shapes) and not inter & disj

    def test_line_matches_brute(self, shape_index):
        index, shapes = shape_index
        s = Searcher(index)
        got = {d for d, _ in s.search(A.ShapeLineQuery("shape", QLINE), k=1000).hits}
        pts = [(lon, lat) for lat, lon in QLINE]
        segs = list(zip(pts, pts[1:]))
        want = set()
        for i, tris in shapes.items():
            hit = False
            for t in tris:
                te = (
                    (t[0], t[1], t[2], t[3]),
                    (t[2], t[3], t[4], t[5]),
                    (t[4], t[5], t[0], t[1]),
                )
                for (cx, cy), (dx, dy) in segs:
                    if point_in_tri_np(cx, cy, t) or point_in_tri_np(dx, dy, t):
                        hit = True
                    for e in te:
                        if _np_seg_seg(*e, cx, cy, dx, dy):
                            hit = True
            if hit:
                want.add(i)
        assert got == want

    def test_line_distributed_equals_driver(self, shape_index):
        index, _ = shape_index
        s = Searcher(index)
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, A.ShapeLineQuery("shape", QLINE)),
            )
        )
        drv = s.search(q, k=50).hits
        dist = s.search(q, k=50, mode="distributed").hits
        assert [(d, round(x, 5)) for d, x in drv] == [(d, round(x, 5)) for d, x in dist]

    def test_bad_relations_rejected(self, shape_index):
        index, _ = shape_index
        s = Searcher(index)
        with pytest.raises(ValueError):
            s.search(A.ShapePointQuery("shape", *QPOINT, relation="within"), k=5)
        with pytest.raises(ValueError):
            s.search(A.ShapeLineQuery("shape", QLINE, relation="contains"), k=5)
