"""libkml-driver subset (sources/kml.py: StyleMap resolution,
NetworkLink read/write defaults, Schema typing) vs the reference's
own expectations (autotest/ogr/ogr_libkml.py:1216-1330, 1652-1728,
and the SchemaData typing the driver applies)."""

import pyarrow as pa

from gdal_ray.sources.kml import (apply_kml_schema, read_kml,
                                  read_kml_networklinks,
                                  read_kml_schemas, read_kml_styles,
                                  write_kml_networklinks)

STYLEMAP_KML = b"""<kml xmlns="http://www.opengis.net/kml/2.2">
<Document>
    <Style id="style1">
        <BalloonStyle>
            <bgColor>ff00ffff</bgColor>
            <text><![CDATA[This is $[name]]]></text>
        </BalloonStyle>
    </Style>
    <Style id="style2">
        <LineStyle>
            <color>01234567</color>
            <width>1</width>
        </LineStyle>
        <PolyStyle>
            <color>01234567</color>
        </PolyStyle>
    </Style>
    <StyleMap id="styleMapExample">
        <Pair>
            <key>normal</key>
            <Style id="inline_style">
                <IconStyle>
                    <Icon>
                        <href>http://inline_style</href>
                    </Icon>
                </IconStyle>
            </Style>
        </Pair>
        <Pair>
            <key>highlight</key>
            <styleUrl>#style2</styleUrl>
        </Pair>
    </StyleMap>
</Document>
</kml>"""


def test_stylemap_normal_resolution():
    # ogr_libkml.py resolved_stylemap: the map resolves to the inline
    # normal style under the MAP's id
    st = read_kml_styles(STYLEMAP_KML)
    assert "styleMapExample" in st
    assert st["styleMapExample"]["IconStyle"]["href"] == \
        "http://inline_style"
    # the inline style is not a standalone table entry
    assert "inline_style" not in st
    assert "style2" in st and "style1" in st


def test_stylemap_highlight_resolution():
    # LIBKML_STYLEMAP_KEY=HIGHLIGHT: resolves through #style2
    st = read_kml_styles(STYLEMAP_KML, key="highlight")
    got = st["styleMapExample"]
    assert got["LineStyle"] == {"color": "01234567", "width": "1"}
    assert got["PolyStyle"] == {"color": "01234567"}


def test_networklink_write_defaults_and_read():
    rows = [
        {"name": "a network link",
         "href": "http://developers.google.com/kml/documentation/Point.kml",
         "refreshVisibility": 1, "flyToView": 1, "refreshInterval": 60,
         "httpQuery": "[clientVersion]"},
        {"href": "http://developers.google.com/kml/documentation/Point.kml",
         "viewRefreshTime": 30},
        {"href": "http://developers.google.com/kml/documentation/Point.kml",
         "refreshMode": "onExpire", "viewRefreshMode": "onRegion",
         "viewBoundScale": 0.5,
         "viewFormat": "BBOX=[bboxWest],[bboxSouth],[bboxEast],[bboxNorth]"},
    ]
    data = write_kml_networklinks(rows)
    # the reference's exact element assertions (write_networklink)
    for frag in ("<name>a network link</name>",
                 "<refreshVisibility>1</refreshVisibility>",
                 "<flyToView>1</flyToView>",
                 "<href>http://developers.google.com/kml/documentation/"
                 "Point.kml</href>",
                 "<refreshMode>onInterval</refreshMode>",
                 "<refreshInterval>60</refreshInterval>",
                 "<httpQuery>[clientVersion]</httpQuery>",
                 "<viewRefreshMode>onStop</viewRefreshMode>",
                 "<viewRefreshTime>30</viewRefreshTime>",
                 "<refreshMode>onExpire</refreshMode>",
                 "<viewRefreshMode>onRegion</viewRefreshMode>",
                 "<viewBoundScale>0.5</viewBoundScale>",
                 "<viewFormat>BBOX=[bboxWest],[bboxSouth],[bboxEast],"
                 "[bboxNorth]</viewFormat>"):
        assert frag in data, frag
    back = read_kml_networklinks(data.encode())
    assert len(back) == 3
    assert back[0]["name"] == "a network link"
    assert back[0]["refreshMode"] == "onInterval"
    assert back[1]["viewRefreshMode"] == "onStop"
    assert back[2]["viewBoundScale"] == "0.5"


SCHEMA_KML = b"""<kml xmlns="http://www.opengis.net/kml/2.2">
<Document>
  <Schema name="mytable" id="mytable">
    <SimpleField type="int" name="pop"/>
    <SimpleField type="double" name="area"/>
    <SimpleField type="bool" name="urban"/>
    <SimpleField type="string" name="label"/>
  </Schema>
  <Placemark>
    <name>a</name>
    <ExtendedData><SchemaData schemaUrl="#mytable">
      <SimpleData name="pop">120</SimpleData>
      <SimpleData name="area">3.5</SimpleData>
      <SimpleData name="urban">true</SimpleData>
      <SimpleData name="label">x</SimpleData>
    </SchemaData></ExtendedData>
    <Point><coordinates>2,48,0</coordinates></Point>
  </Placemark>
</Document>
</kml>"""


def test_schema_typed_fields():
    schemas = read_kml_schemas(SCHEMA_KML)
    assert schemas["mytable"] == {"pop": "int", "area": "double",
                                  "urban": "bool", "label": "string"}
    layers = read_kml(SCHEMA_KML)
    tab = next(iter(layers.values()))
    typed = apply_kml_schema(tab, schemas["mytable"])
    assert typed["pop"].type == pa.int32()
    assert typed["area"].type == pa.float64()
    assert typed["urban"].type == pa.bool_()
    assert typed["pop"][0].as_py() == 120
    assert typed["urban"][0].as_py() is True
