"""PGDump writer tests — statement needles transcribed verbatim from
the reference autotest (ogr_pgdump.py tests 1-3), driven through the
engine's own shapefile reader on the reference's poly.shp fixture so
the EWKB hex golden is end-to-end."""
import os

import pyarrow as pa
import pytest

from gdal_ray.sources.pgdump import launder_name, pg_type, write_pgdump

POLY = "/root/reference/autotest/ogr/data/poly.shp"

# the exact 3-D EWKB hex of poly.shp feature 1 from ogr_pgdump.py test 1
HEX3D_START = ("01030000800100000014000000000000602F491D41000000207F2D5241"
               "0000000000000000")
# the exact SRID-flagged 2-D EWKB hex from ogr_pgdump.py test 2
HEX2D_SRID_START = "0103000020E61000000100000014000000000000602F491D41"


def _poly_table() -> pa.Table:
    from gdal_ray.sources.shapefile import read_shapefile

    t = read_shapefile(POLY)
    cols = {c.lower(): t[c] for c in t.column_names}
    return pa.table({
        "AREA": cols["area"].cast(pa.float64()),
        "EAS_ID": cols["eas_id"].cast(pa.int32()),
        "PRFEDEA": cols["prfedea"].cast(pa.string()),
        "SHORTNAME": pa.array([None] * t.num_rows, pa.string()),
        "geometry": cols["geometry"],
    })


def _check_and_remove(sql: str, needle: str) -> str:
    assert needle in sql, f"missing: {needle!r}"
    return sql[sql.find(needle) + len(needle):]


@pytest.mark.skipif(not os.path.exists(POLY), reason="no reference fixture")
def test_pgdump_insert_mode(tmp_path):
    """ogr_pgdump.py test 1: DIM=3, POSTGIS_VERSION=1.5, INSERT mode."""
    out = str(tmp_path / "tpoly.sql")
    write_pgdump(out, _poly_table(), "tpoly", dim=3,
                 postgis_version="1.5", field_widths={"SHORTNAME": 8})
    sql = open(out).read()
    for needle in [
        'DROP TABLE IF EXISTS "public"."tpoly" CASCADE;',
        "DELETE FROM geometry_columns WHERE f_table_name = 'tpoly' "
        "AND f_table_schema = 'public';",
        "BEGIN;",
        'CREATE TABLE "public"."tpoly"();',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "ogc_fid" SERIAL '
        'CONSTRAINT "tpoly_pk" PRIMARY KEY;',
        "SELECT AddGeometryColumn('public','tpoly','wkb_geometry',-1,"
        "'GEOMETRY',3);",
        'ALTER TABLE "public"."tpoly" ADD COLUMN "area" FLOAT8;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "eas_id" INTEGER;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "prfedea" VARCHAR;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "shortname" VARCHAR(8);',
        'INSERT INTO "public"."tpoly" ("wkb_geometry", "area", "eas_id", '
        "\"prfedea\") VALUES ('" + HEX3D_START,
        "', 215229.266, 168, '35043411');",
        'CREATE INDEX "tpoly_wkb_geometry_geom_idx" ON "public"."tpoly" '
        'USING GIST ("wkb_geometry");',
        "COMMIT;",
    ]:
        sql = _check_and_remove(sql, needle)


@pytest.mark.skipif(not os.path.exists(POLY), reason="no reference fixture")
def test_pgdump_copy_mode(tmp_path):
    """ogr_pgdump.py test 2: quoted schema/layer/geometry names, SRID
    4326, POLYGON, COPY mode, CRLF."""
    out = str(tmp_path / "tpoly.sql")
    write_pgdump(out, _poly_table(), 'xx"yyy', schema='ano"ther_schema',
                 srid=4326, geometry_name='the_"geom', geom_type="POLYGON",
                 use_copy=True, lineformat="CRLF",
                 field_widths={"SHORTNAME": 8})
    sql = open(out, newline="").read()
    for needle in [
        'CREATE SCHEMA "ano""ther_schema";',
        'DROP TABLE IF EXISTS "ano""ther_schema"."xx""yyy" CASCADE;',
        "BEGIN;",
        'CREATE TABLE "ano""ther_schema"."xx""yyy"();',
        'ALTER TABLE "ano""ther_schema"."xx""yyy" ADD COLUMN "ogc_fid" '
        'SERIAL CONSTRAINT "xx""yyy_pk" PRIMARY KEY;',
        "SELECT AddGeometryColumn('ano\"ther_schema','xx\"yyy',"
        "'the_\"geom',4326,'POLYGON',2);",
        'ALTER TABLE "ano""ther_schema"."xx""yyy" ADD COLUMN "area" FLOAT8;',
        'COPY "ano""ther_schema"."xx""yyy" ("the_""geom", "area", "eas_id", '
        '"prfedea", "shortname") FROM STDIN;',
        HEX2D_SRID_START,
        "\t215229.266\t168\t35043411\t\\N",
        "\\.",
        'CREATE INDEX "xx""yyy_the_""geom_geom_idx" ON '
        '"ano""ther_schema"."xx""yyy" USING GIST ("the_""geom");',
        "COMMIT;",
    ]:
        sql = _check_and_remove(sql, needle)
    assert "\r\n" in open(out, newline="").read()


def test_pgdump_no_geometry(tmp_path):
    """ogr_pgdump.py test 3 shape: wkbNone layer -> no AddGeometryColumn,
    no GIST index; empty-string field kept distinct from NULL."""
    out = str(tmp_path / "t.sql")
    t = pa.table({
        "EMPTYCHAR": pa.array(["", None], pa.string()),
        "EAS_ID": pa.array([168, 179], pa.int32()),
    })
    write_pgdump(out, t, "tpoly", schema="another_schema", use_copy=True)
    sql = open(out).read()
    assert "AddGeometryColumn" not in sql
    assert "GIST" not in sql
    lines = sql.splitlines()
    i = lines.index('COPY "another_schema"."tpoly" ("emptychar", "eas_id") '
                    "FROM STDIN;")
    assert lines[i + 1] == "\t168"       # empty string, not \N
    assert lines[i + 2] == "\\N\t179"    # null -> \N


def test_pgdump_launder_and_types():
    assert launder_name("AREA") == "area"
    assert launder_name("my-field#x'y") == "my_field_x_y"
    assert pg_type(pa.int32()) == "INTEGER"
    assert pg_type(pa.int64()) == "INT8"
    assert pg_type(pa.float64()) == "FLOAT8"
    assert pg_type(pa.float32()) == "REAL"
    assert pg_type(pa.string(), 8) == "VARCHAR(8)"
    assert pg_type(pa.bool_()) == "BOOLEAN"
    assert pg_type(pa.binary()) == "bytea"
    assert pg_type(pa.list_(pa.int32())) == "INTEGER[]"
    assert pg_type(pa.timestamp("us")) == "timestamp with time zone"
