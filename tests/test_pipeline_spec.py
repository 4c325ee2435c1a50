"""Serialized pipeline spec (GDALG analog): build/save/load/replay."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.pipelines.spec import STEP_REGISTRY, build, load, register_step, save


def _collect(ds):
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")


def test_build_filter_select(ray_session, tmp_path):
    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": list(range(100)),
                             "y": [i * 2.5 for i in range(100)],
                             "z": ["a"] * 100}), src)
    spec = {
        "type": "gdal_ray_pipeline",
        "steps": [
            {"op": "read_parquet", "path": str(src)},
            {"op": "where", "expr": "x BETWEEN 10 AND 20 AND x % 2 = 0"},
            {"op": "select", "columns": ["x", "y"]},
            {"op": "rename", "mapping": {"y": "val"}},
        ],
    }
    t = _collect(build(spec))
    assert t.column_names == ["x", "val"]
    assert sorted(t["x"].to_pylist()) == [10, 12, 14, 16, 18, 20]


def test_save_load_roundtrip(ray_session, tmp_path):
    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": list(range(10))}), src)
    spec = {"type": "gdal_ray_pipeline",
            "steps": [{"op": "read_parquet", "path": str(src)},
                      {"op": "where", "expr": "a >= 5"}]}
    path = str(tmp_path / "p.gdalray.json")
    save(spec, path)
    t = _collect(load(path))
    assert sorted(t["a"].to_pylist()) == [5, 6, 7, 8, 9]
    with pytest.raises(ValueError):
        save(spec, str(tmp_path / "p.json"))


def test_warp_compose_steps(ray_session):
    spec = {"type": "gdal_ray_pipeline",
            "steps": [{"op": "read_images", "n": 8},
                      {"op": "warp_tiles", "concurrency": 2},
                      {"op": "compose"}]}
    t = _collect(build(spec))
    assert t.num_rows > 0
    assert "checksum" in t.column_names


def test_custom_step_registration(ray_session, tmp_path):
    @register_step("double_x")
    def _double(ds, p):
        return ds.map_batches(
            lambda t: t.set_column(t.schema.get_field_index("x"), "x",
                                   pa.compute.multiply(t["x"], 2)),
            batch_format="pyarrow")

    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": [1, 2, 3]}), src)
    spec = {"type": "gdal_ray_pipeline",
            "steps": [{"op": "read_parquet", "path": str(src)},
                      {"op": "double_x"}]}
    t = _collect(build(spec))
    assert sorted(t["x"].to_pylist()) == [2, 4, 6]
    assert "double_x" in STEP_REGISTRY


def test_unknown_step_raises():
    with pytest.raises(NotImplementedError):
        build({"type": "gdal_ray_pipeline", "steps": [{"op": "nope"}]})
    with pytest.raises(ValueError):
        build({"type": "other", "steps": []})
