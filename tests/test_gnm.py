"""GNM network analysis vs autotest/gnm/gnm_test.py semantics."""

import pyarrow as pa
import pytest

from gdal_ray.functions.gnm import (
    GNM_EDGE_DIR_BOTH,
    GNMGraph,
    GNMNetwork,
    build_autotest_network,
)

FIXDIR = "/root/reference/autotest/gnm/data"


@pytest.fixture(scope="module")
def net():
    return build_autotest_network(FIXDIR)


def test_gnm_import_gfids(net):
    # pipes imported first (GFIDs 0..32), wells after (33..63) —
    # GetNewGlobalFID sequential (gnmgenericnetwork.cpp:171)
    assert net.layers["pipes"].num_rows == 33
    assert net.layers["wells"].num_rows == 31
    assert net.layers["pipes"]["gnm_gfid"].to_pylist()[0] == 0
    assert net.layers["wells"]["gnm_gfid"].to_pylist()[0] == 33
    assert net.layers["wells"]["gnm_gfid"].to_pylist()[-1] == 63


def test_gnm_autoconnect(net):
    # test_gnm_autoconnect: ConnectPointsByLines(pipes+wells, 1e-6) ok
    assert len(net.graph.edges) == 33  # every pipe connected
    assert len(net.graph.vertices) == 31  # every well is an endpoint


def test_gnm_dijkstra(net):
    # test_gnm_graph_dijkstra: path 61 -> 50 exists
    t = net.get_path(61, 50, "dijkstra")
    assert t.num_rows > 0
    kinds = t["kind"].to_pylist()
    gfids = t["gfid"].to_pylist()
    # starts at 61, ends with the target vertex 50
    assert gfids[0] == 61 and kinds[0] == "vertex"
    verts = [g for g, k in zip(gfids, kinds) if k == "vertex"]
    edges = [g for g, k in zip(gfids, kinds) if k == "edge"]
    assert verts[-1] == 50
    assert len(verts) == len(edges) + 1
    # every edge gfid is a pipe, every vertex a well
    assert all(g < 33 for g in edges)
    assert all(33 <= g <= 63 for g in verts)
    # path is connected: consecutive (vertex, edge, vertex) triples
    # are incident in the graph
    for i in range(len(edges)):
        e = net.graph.edges[edges[i]]
        assert {verts[i], verts[i + 1]} == {e[0], e[1]}


def test_gnm_kshortest(net):
    # test_gnm_graph_kshortest: num_paths=3 -> >= 20 result features
    t = net.get_path(61, 50, "kshortest", num_paths=3)
    assert t.num_rows >= 20
    pn = t["path_num"].to_pylist()
    assert sorted(set(pn)) == [1, 2, 3]
    # path costs (edge counts at unit cost) are non-decreasing
    counts = [sum(1 for p, k in zip(pn, t["kind"].to_pylist())
                  if p == n and k == "edge") for n in (1, 2, 3)]
    assert counts == sorted(counts)
    # first path == the Dijkstra path
    d = net.get_path(61, 50, "dijkstra")
    first = t.filter(pa.compute.equal(t["path_num"], 1))
    assert first["gfid"].to_pylist() == d["gfid"].to_pylist()


def test_gnm_connected_components(net):
    # test_gnm_graph_connectedcomponents: BFS from {61, 50}
    t = net.get_path(61, 50, "connected")
    assert t.num_rows > 0
    # bidirectional single component: every edge traced from both
    # sides -> 2 (vertex, edge) pairs per edge, 2 rows per pair
    assert t.num_rows == 4 * len(net.graph.edges)


def test_gnm_blocked_vertex_changes_path(net):
    d0 = net.get_path(61, 50, "dijkstra")
    mid = [g for g, k in zip(d0["gfid"].to_pylist(), d0["kind"].to_pylist())
           if k == "vertex"][1]
    net.graph.change_block_state(mid, True)
    try:
        d1 = net.get_path(61, 50, "dijkstra")
        verts = [g for g, k in zip(d1["gfid"].to_pylist(),
                                   d1["kind"].to_pylist()) if k == "vertex"]
        assert mid not in verts
        assert not verts or verts[-1] == 50
    finally:
        net.graph.change_block_state(mid, False)


def test_gnm_directed_edges():
    g = GNMGraph()
    g.add_edge(100, 1, 2, False, 1.0, 1.0)  # 1 -> 2 only
    g.add_edge(101, 2, 3, False, 1.0, 1.0)
    assert [p[0] for p in g.dijkstra(1, 3)] == [1, 2, 3]
    assert g.dijkstra(3, 1) == []  # no reverse path


def test_gnm_rule_gate():
    net2 = GNMNetwork("empty_rules")
    t = pa.table({"fid": pa.array([0], pa.int64()),
                  "geometry": pa.array([b""], pa.binary())})
    net2.rules.clear()
    net2.copy_layer(t, "x")
    # ConnectFeatures with no rules refuses (gnmgenericnetwork.cpp:239)
    net2._connections.clear()
    assert net2.rules == []


def test_gnm_query_runs(ray_session):
    from gdal_ray.pipelines.vector_ops import q_gnm

    t = q_gnm("/root/testdata/sf0.001")
    if not isinstance(t, pa.Table):
        t = pa.concat_tables(
            t.iter_batches(batch_size=None, batch_format="pyarrow"))
    algs = set(t["alg"].to_pylist())
    assert algs == {"dijkstra", "kshortest", "connected"}
    dij = t.filter(pa.compute.equal(t["alg"], "dijkstra"))
    ksh = t.filter(pa.compute.equal(t["alg"], "kshortest"))
    con = t.filter(pa.compute.equal(t["alg"], "connected"))
    assert dij.num_rows == 19
    assert ksh.num_rows >= 20
    assert con.num_rows == 66 * 2
