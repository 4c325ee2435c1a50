"""WAsP .map driver vs the reference autotest's own constructed data
(autotest/ogr/ogr_wasp.py)."""
import math

import numpy as np

from gdal_ray.sources.wasp import (read_wasp, write_wasp_elevation,
                                   write_wasp_roughness_lines,
                                   write_wasp_roughness_polys)


def test_wasp_elevation_from_linestring_z(tmp_path):
    # 10 3-point lines at z=i; file body: "h n" lines, n==3, h==i
    path = str(tmp_path / "tmp.map")
    lines = [np.array([[i, 0, i], [i, 0.5, i], [i, 1, i]], float)
             for i in range(10)]
    write_wasp_elevation(path, lines)
    body = open(path).read().splitlines()[4:]
    j = 0
    for i, line in enumerate(body):
        if i % 2 == 0:
            h, n = line.split()
            assert int(n) == 3
            assert float(h) == j
            j += 1
    assert j == 10


def test_wasp_elevation_tolerance(tmp_path):
    # WASP_TOLERANCE=.1 drops the collinear midpoint: n==2
    path = str(tmp_path / "tmp.map")
    lines = [np.array([[i, 0, i], [i, 0.5, i], [i, 1, i]], float)
             for i in range(10)]
    write_wasp_elevation(path, lines, tolerance=0.1)
    body = open(path).read().splitlines()[4:]
    j = 0
    for i, line in enumerate(body):
        if i % 2 == 0:
            h, n = line.split()
            assert int(n) == 2
            assert float(h) == j
            j += 1
    assert j == 10


def test_wasp_roughness_from_linestring_fields(tmp_path):
    # z_left = i-1, z_right = i
    path = str(tmp_path / "tmp.map")
    lines = [np.array([[i, 0], [i, 0.5], [i, 1]], float) for i in range(10)]
    write_wasp_roughness_lines(path, lines,
                               left=[i - 1.0 for i in range(10)],
                               right=[float(i) for i in range(10)])
    body = open(path).read().splitlines()[4:]
    j = 0
    for i, line in enumerate(body):
        if i % 2 == 0:
            lv, rv, n = line.split()
            assert int(n) == 3
            assert (float(lv), float(rv)) == (j - 1, j)
            j += 1
    assert j == 10


def _hex_fan(zfn):
    rings = []
    for i in range(6):
        p0 = (0.0, 0.0)
        p1 = (round(math.cos(i * math.pi / 3), 6),
              round(math.sin(i * math.pi / 3), 6))
        p2 = (round(math.cos((i + 1) * math.pi / 3), 6),
              round(math.sin((i + 1) * math.pi / 3), 6))
        rings.append(np.array([p0, p1, p2, p0], float))
    return rings, [zfn(i) for i in range(6)]


def test_wasp_roughness_from_polygon_z(tmp_path):
    # 6 triangle zones z=i -> 6 internal radial boundaries with the
    # adjacent-zone pairs; every boundary keeps its 2 points
    path = str(tmp_path / "tmp.map")
    rings, zs = _hex_fan(float)
    write_wasp_roughness_polys(path, rings, zs)
    body = open(path).read().splitlines()[4:]
    res = set()
    j = 0
    for i, line in enumerate(body):
        if i % 2 == 0:
            lv, rv, n = (float(v) for v in line.split())
            assert int(n) == 2
            res.add((min(lv, rv), max(lv, rv)))
            j += 1
    assert j == 6
    assert res == {(0, 1), (0, 5), (1, 2), (2, 3), (3, 4), (4, 5)}


def test_wasp_merge(tmp_path):
    # alternating z 0/1: 6 boundaries all (0,1); the shared center
    # point (6 incident boundaries) must NOT merge them (n stays 2)
    path = str(tmp_path / "tmp.map")
    rings, zs = _hex_fan(lambda i: float(i % 2))
    write_wasp_roughness_polys(path, rings, zs)
    body = open(path).read().splitlines()[4:]
    res = []
    j = 0
    for i, line in enumerate(body):
        if i % 2 == 0:
            lv, rv, n = (float(v) for v in line.split())
            assert int(n) == 2, "unwanted merge"
            res.append((min(lv, rv), max(lv, rv)))
            j += 1
    assert j == 6
    assert res == [(0, 1)] * 6


def test_wasp_reading(tmp_path):
    path = str(tmp_path / "tmp.map")
    lines = [np.array([[i, 0, i], [i, 0.5, i], [i, 1, i]], float)
             for i in range(10)]
    write_wasp_elevation(path, lines)
    t = read_wasp(path)
    assert t.num_rows == 10
    assert t.column("height").to_pylist() == [float(i) for i in range(10)]

    # roughness read-back keeps left/right
    path2 = str(tmp_path / "r.map")
    rings, zs = _hex_fan(float)
    write_wasp_roughness_polys(path2, rings, zs)
    t2 = read_wasp(path2)
    assert t2.num_rows == 6
    assert "z_left" in t2.column_names and "z_right" in t2.column_names
