"""Arrow IPC / Feather vector driver: geo metadata, batch-addressed
sharded reads, roundtrips."""

import numpy as np
import pyarrow as pa

from gdal_ray.sources.arrowipc import (feather_dataset, feather_geo_info,
                                       read_feather, write_feather)
from gdal_ray.sources.vector import points_table


def test_roundtrip_and_geo_metadata(tmp_path):
    t = points_table(200)
    p = str(tmp_path / "pts.feather")
    write_feather(p, t, crs_epsg=4326, batch_rows=64)
    info = feather_geo_info(p)
    assert info["primary_column"] == "geometry"
    assert info["columns"]["geometry"]["encoding"] == "WKB"
    assert info["columns"]["geometry"]["crs"] == "EPSG:4326"
    back = read_feather(p)
    assert back["geometry"].to_pylist() == t["geometry"].to_pylist()
    np.testing.assert_allclose(back["x"].to_numpy(), t["x"].to_numpy())


def test_sharded_dataset_matches_whole(ray_session, tmp_path):
    t = points_table(1000)
    p = str(tmp_path / "big.feather")
    write_feather(p, t, batch_rows=100)  # 10 record batches
    ds = feather_dataset(p, columns=["fid", "z"], num_shards=4)
    got = pa.concat_tables(list(ds.iter_batches(
        batch_size=None, batch_format="pyarrow"))).sort_by("fid")
    assert got.num_rows == 1000
    np.testing.assert_allclose(got["z"].to_numpy(),
                               t.sort_by("fid")["z"].to_numpy())


def test_plain_table_no_geo(tmp_path):
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "plain.arrow")
    write_feather(p, t)
    assert feather_geo_info(p) is None
    assert read_feather(p)["a"].to_pylist() == [1, 2, 3]
