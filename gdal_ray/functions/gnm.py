"""Geographic Network Model (GNM) — network analysis over vector layers.

Re-derivation of the reference's GNM subsystem (gnm/gnmgraph.cpp,
gnm/gnmgenericnetwork.cpp) as plain Python over the engine's Arrow
vector tables:

- ``GNMGraph``           — gnm/gnmgraph.cpp:46-635: vertex/edge store,
  Dijkstra shortest-path tree (lazy-deletion multimap semantics,
  gnmgraph.cpp:457), Yen's K-shortest paths (gnmgraph.cpp:247) and
  breadth-first connected components (gnmgraph.cpp:427).
- ``GNMNetwork``         — gnm/gnmgenericnetwork.cpp: sequential GFID
  assignment on layer import (GetNewGlobalFID, :171), rule gate
  (CreateRule "ALLOW CONNECTS ANY", :1157), ConnectPointsByLines
  (:536 — line start/end snapped to the FIRST point feature inside
  the ±tolerance/2 rect, FindNearestPoint :904), and GetPath (:769)
  returning result rows mirroring OGRGNMWrappedResultLayer fill
  order (vertices then edge per path pair).

The graph is driver-sized state (network topology, not pixel data) —
the reference holds it fully in memory too (std::map in GNMGraph).
At scale the layer import and endpoint snapping are the wide steps
and are expressed over Arrow tables; the solve itself is a small
sequential kernel by design.
"""

from __future__ import annotations

import heapq
import math
from itertools import count

import numpy as np
import pyarrow as pa

# gnm/gnmgraph.h:46-48
GNM_EDGE_DIR_BOTH = 0
GNM_EDGE_DIR_SRCTOTGT = 1
GNM_EDGE_DIR_TGTTOSRC = 2


class GNMGraph:
    """In-memory analysis graph (gnm/gnmgraph.cpp)."""

    def __init__(self):
        # gfid -> [out edge gfids] (insertion order = anOutEdgeFIDs)
        self.vertices: dict[int, list[int]] = {}
        self.vertex_blocked: dict[int, bool] = {}
        # gfid -> [src, tgt, bidir, dir_cost, inv_cost, blocked]
        self.edges: dict[int, list] = {}

    def add_vertex(self, gfid: int) -> None:
        if gfid not in self.vertices:
            self.vertices[gfid] = []
            self.vertex_blocked[gfid] = False

    def add_edge(self, con_gfid: int, src: int, tgt: int, bidir: bool,
                 cost: float, inv_cost: float) -> None:
        # gnmgraph.cpp:73 — one record per connector gfid
        if con_gfid in self.edges:
            return
        self.add_vertex(src)
        self.add_vertex(tgt)
        self.edges[con_gfid] = [src, tgt, bidir, cost, inv_cost, False]
        if bidir:
            self.vertices[src].append(con_gfid)
            self.vertices[tgt].append(con_gfid)
        else:
            # directed: only the source lists it as an out-edge
            self.vertices[src].append(con_gfid)

    def opposite_vertex(self, edge_gfid: int, vertex_gfid: int) -> int:
        e = self.edges.get(edge_gfid)
        if e is None:
            return -1
        if vertex_gfid == e[0]:
            return e[1]
        if vertex_gfid == e[1]:
            return e[0]
        return -1

    def change_block_state(self, gfid: int, block: bool) -> None:
        if gfid in self.vertex_blocked:
            self.vertex_blocked[gfid] = block
        if gfid in self.edges:
            self.edges[gfid][5] = block

    # -- Dijkstra -------------------------------------------------------
    def _shortest_tree(self, start: int, edge_cost) -> dict[int, int]:
        """gnmgraph.cpp:457 DijkstraShortestPathTree: returns
        vertex gfid -> incoming edge gfid (start maps to -1)."""
        inf = math.inf
        marks = {v: inf for v in self.vertices}
        if start not in marks:
            return {}
        marks[start] = 0.0
        tree = {start: -1}
        seen: set[int] = set()
        seq = count()
        heap: list = [(0.0, next(seq), start)]
        while heap:
            cur_mark, _, cur = heapq.heappop(heap)
            seen.add(cur)
            for eid in self.vertices.get(cur, ()):
                e = self.edges.get(eid)
                if e is None or e[5]:
                    continue
                cost = edge_cost(eid, e)
                tgt = e[1] if cur == e[0] else e[0]
                new_mark = cur_mark + cost
                if (tgt not in seen and new_mark < marks.get(tgt, inf)
                        and not self.vertex_blocked.get(tgt, False)):
                    marks[tgt] = new_mark
                    tree[tgt] = eid
                    heapq.heappush(heap, (new_mark, next(seq), tgt))
        return tree

    def dijkstra(self, start: int, end: int,
                 cost_override: dict[int, float] | None = None):
        """gnmgraph.cpp:185 — path as [(vertex gfid, edge gfid)], the
        first pair's edge being the one that LED to that vertex, the
        last pair (end vertex, -1)... (reference builds backwards then
        reverses: start carries edge -1)."""
        ov = cost_override or {}

        def ecost(eid, e):
            return ov.get(eid, e[3])  # direct cost only (:506)

        tree = self._shortest_tree(start, ecost)
        path: list[tuple[int, int]] = []
        nxt = end
        while True:
            eid = tree.get(nxt)
            if eid is None:
                return []  # unreachable
            if nxt == start:
                path.append((nxt, -1))
                path.reverse()
                return path
            path.append((nxt, eid))
            nxt = self.opposite_vertex(eid, nxt)

    # -- Yen's K shortest paths ----------------------------------------
    def k_shortest_paths(self, start: int, end: int, k: int):
        """gnmgraph.cpp:247 KShortestPaths (Yen). Mirrors the
        reference's multimap candidate ordering and duplicate pruning."""
        A: list[list[tuple[int, int]]] = []
        if k == 0:
            return A
        first = self.dijkstra(start, end)
        if not first:
            return A
        A.append(first)
        B: list[tuple[float, int, list]] = []  # (cost, seq, path)
        seq = count()
        for _ in range(k - 1):
            ak = A[-1]
            for i in range(len(ak) - 1):
                spur = ak[i][0]
                root = ak[:i + 1]
                removed: dict[int, float] = {}
                # infinity-cost the edge following the spur node of
                # every already-found path sharing this root (:320-339)
                for pa_ in A:
                    if i >= len(pa_):
                        continue
                    if pa_[:i + 1] == root and i < len(pa_) - 1:
                        removed.setdefault(pa_[i + 1][1], 0.0)
                # remove root-path nodes (all their incident out-edges)
                for vtx, _e in root[:-1]:
                    for eid in self.vertices.get(vtx, ()):
                        removed.setdefault(eid, 0.0)
                ov = {eid: math.inf for eid in removed}
                spur_path = self.dijkstra(spur, end, cost_override=ov)
                if spur_path:
                    full = root + spur_path[1:]
                    cost = 0.0
                    for _v, eid in full:
                        e = self.edges.get(eid)
                        cost += e[3] if e is not None else 0.0
                    heapq.heappush(B, (cost, next(seq), full))
            if not B:
                break
            _c, _s, best = heapq.heappop(B)
            A.append(best)
            while B and B[0][2] == best:
                heapq.heappop(B)
        return A

    # -- connected components ------------------------------------------
    def connected_components(self, emitters: list[int]):
        """gnmgraph.cpp:427 — BFS from the emitter set; rows are
        (vertex gfid, out edge gfid) in trace order."""
        out: list[tuple[int, int]] = []
        marked: set[int] = set()
        queue = list(emitters)
        while queue:
            nxt: list[int] = []
            for cur in queue:
                if cur in marked:
                    continue
                marked.add(cur)
                for eid in self.vertices.get(cur, ()):
                    out.append((cur, eid))
                    tgt = self.opposite_vertex(eid, cur)
                    if tgt not in marked and not self.vertex_blocked.get(tgt, False):
                        nxt.append(tgt)
            queue = nxt
        return out


class GNMNetwork:
    """File-network facade: layer import with sequential GFIDs +
    endpoint autoconnect (gnm/gnmgenericnetwork.cpp)."""

    def __init__(self, name: str = "", srs: str = "EPSG:4326"):
        self.name = name
        self.srs = srs
        self.version = 100  # GNM_VERSION autotest gnm_test.py:54
        self._gid = 0  # GetNewGlobalFID (:171)
        self.layers: dict[str, pa.Table] = {}
        # gfid -> (layer_name, local fid)
        self.feature_map: dict[int, tuple[str, int]] = {}
        self.graph = GNMGraph()
        self.rules: list[str] = ["ALLOW CONNECTS ANY"]
        self._connections: set[tuple[int, int, int]] = set()

    def copy_layer(self, table: pa.Table, name: str) -> None:
        """CopyLayer: every imported feature gets the next GFID, in
        feature order (pipes 0..32, wells 33..63 for the autotest)."""
        gfids = []
        for i in range(table.num_rows):
            gfids.append(self._gid)
            self.feature_map[self._gid] = (name, i)
            self._gid += 1
        tb = table.append_column("gnm_gfid", pa.array(gfids, pa.int64()))
        self.layers[name] = tb

    # -- autoconnect ----------------------------------------------------
    def connect_points_by_lines(self, layer_names: list[str],
                                tolerance: float, cost: float,
                                inv_cost: float,
                                direction: int = GNM_EDGE_DIR_BOTH) -> int:
        """gnmgenericnetwork.cpp:536. Returns number of edges made."""
        from gdal_ray.functions.wkb import wkb_to_geom

        line_layers, point_layers = [], []
        for nm in layer_names:
            t = self.layers.get(nm)
            if t is None:
                continue
            g0 = None
            for b in t["geometry"]:
                if b.is_valid:
                    g0 = wkb_to_geom(b.as_py())
                    break
            if g0 is None:
                continue
            if g0.name in ("LineString", "MultiLineString"):
                line_layers.append(nm)
            elif g0.name == "Point":
                point_layers.append(nm)
        if not line_layers or not point_layers:
            raise ValueError("need >=1 line layer and >=1 point layer")

        # point index: (layer order, fid order) -> first match in rect
        pts: list[tuple[float, float, int]] = []
        for nm in point_layers:
            t = self.layers[nm]
            gf = t["gnm_gfid"].to_pylist()
            for i, b in enumerate(t["geometry"]):
                g = wkb_to_geom(b.as_py())
                x, y = float(g.rings[0][0, 0]), float(g.rings[0][0, 1])
                pts.append((x, y, gf[i]))
        half = tolerance / 2.0

        def nearest(x: float, y: float) -> int:
            # FindNearestPoint (:904): FIRST feature whose point falls
            # in the ±tolerance rect, not the metrically nearest
            for px, py, gfid in pts:
                if (x - half <= px <= x + half) and (y - half <= py <= y + half):
                    return gfid
            return -1

        made = 0
        for nm in line_layers:
            t = self.layers[nm]
            gf = t["gnm_gfid"].to_pylist()
            for i, b in enumerate(t["geometry"]):
                g = wkb_to_geom(b.as_py())
                for coords in g.rings:
                    sx, sy = float(coords[0, 0]), float(coords[0, 1])
                    ex, ey = float(coords[-1, 0]), float(coords[-1, 1])
                    src = nearest(sx, sy)
                    tgt = nearest(ex, ey)
                    if src == -1 or tgt == -1:
                        continue
                    key = (src, tgt, gf[i])
                    if key in self._connections or not self.rules:
                        continue  # FindConnection / rule gate (:230-246)
                    self._connections.add(key)
                    self.graph.add_edge(gf[i], src, tgt,
                                        direction == GNM_EDGE_DIR_BOTH,
                                        cost, inv_cost)
                    made += 1
        return made

    # -- GetPath --------------------------------------------------------
    def get_path(self, start: int, end: int, algorithm: str,
                 num_paths: int = 1) -> pa.Table:
        """gnmgenericnetwork.cpp:769. Result rows mirror
        OGRGNMWrappedResultLayer insertion: per path pair the vertex
        feature, then (edge gfid != -1) the edge feature."""
        if algorithm == "dijkstra":
            paths = [self.graph.dijkstra(start, end)]
        elif algorithm == "kshortest":
            paths = self.graph.k_shortest_paths(start, end, num_paths)
        elif algorithm == "connected":
            emitters = [start, end] if start != -1 else []
            paths = [self.graph.connected_components(emitters)]
        else:
            raise ValueError(f"unknown GNM algorithm {algorithm!r}")

        path_num, gfid, kind, layer = [], [], [], []
        for pn, path in enumerate(paths, start=1):
            for vtx, eid in path:
                path_num.append(pn)
                gfid.append(vtx)
                kind.append("vertex")
                layer.append(self.feature_map.get(vtx, ("", -1))[0])
                if eid != -1:
                    path_num.append(pn)
                    gfid.append(eid)
                    kind.append("edge")
                    layer.append(self.feature_map.get(eid, ("", -1))[0])
        return pa.table({
            "path_num": pa.array(path_num, pa.int32()),
            "gfid": pa.array(gfid, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "layer": pa.array(layer, pa.string()),
        })


def build_autotest_network(data_dir: str) -> GNMNetwork:
    """The autotest network (autotest/gnm/gnm_test.py): pipes + wells
    shapefiles, autoconnected at tolerance 1e-6, cost 1/1, BOTH."""
    from gdal_ray.sources.shapefile import read_shapefile

    net = GNMNetwork("test_gnm")
    for name in ("pipes", "wells"):
        t = read_shapefile(f"{data_dir}/{name}.shp")
        net.copy_layer(t.select(["fid", "geometry"]), name)
    net.connect_points_by_lines(["pipes", "wells"], 0.000001, 1.0, 1.0,
                                GNM_EDGE_DIR_BOTH)
    return net
