"""WKT parser goldens — reference src/from_wkt.rs:105-289 (F10)."""

import numpy as np
import pytest

from segment_rtree_spark.sources.wkt import parse_wkt, parse_wkt_file_polygons


def test_point():
    t, parts = parse_wkt("POINT (1 2)")
    assert t == "POINT" and parts[0][0].tolist() == [1.0] and parts[0][1].tolist() == [2.0]


def test_integer_point():
    t, parts = parse_wkt("POINT(3 4)")
    assert parts[0][0][0] == 3.0


def test_linestring_empty():
    t, parts = parse_wkt("LINESTRING EMPTY")
    assert t == "LINESTRING" and parts == []


def test_linestring():
    t, parts = parse_wkt("LINESTRING (0 0, 1 1, 2 0, 3 3)")
    assert len(parts) == 1 and parts[0][0].tolist() == [0, 1, 2, 3]


def test_polygon_simple():
    t, parts = parse_wkt("POLYGON ((0 0, 0 1, 1 1, 0 0))")
    assert t == "POLYGON" and len(parts) == 1
    assert parts[0][1].tolist() == [0, 1, 1, 0]


def test_polygon_with_holes():
    t, parts = parse_wkt(
        "POLYGON ((0 0, 0 9, 9 9, 9 0, 0 0), (1 1, 1 2, 2 2, 1 1), (5 5, 5 6, 6 6, 5 5))"
    )
    assert len(parts) == 3


def test_multipoint_bare_and_nested():
    t, parts = parse_wkt("MULTIPOINT (1 2, 3 4)")
    assert t == "MULTIPOINT" and len(parts) == 2
    t, parts = parse_wkt("MULTIPOINT ((1 2), (3 4))")
    assert len(parts) == 2 and parts[1][0][0] == 3.0


def test_multilinestring():
    t, parts = parse_wkt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))")
    assert len(parts) == 2 and len(parts[1][0]) == 3


def test_multipolygon():
    t, polys = parse_wkt(
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 0 0)), ((5 5, 5 9, 9 9, 5 5), (6 6, 6 7, 7 7, 6 6)))"
    )
    assert t == "MULTIPOLYGON" and len(polys) == 2
    assert len(polys[1]) == 2  # shell + hole


def test_malformed():
    with pytest.raises(ValueError):
        parse_wkt("xyz")


def test_reference_corpus_files():
    rows = parse_wkt_file_polygons("data/wkt/uk-arrows.wkt")
    pids = {r[0] for r in rows}
    assert len(pids) == 4  # the four arrow polygons
    rows = parse_wkt_file_polygons("data/wkt/africa.wkt")
    assert len({r[0] for r in rows}) == 49  # 49 shells (bench reader golden)
    for _, part, xs, ys in rows[:5]:
        assert xs[0] == xs[-1] and ys[0] == ys[-1]  # rings closed
