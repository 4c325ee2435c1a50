"""GMLAS schema-driven flattening subset conformance (VERDICT r4 #8).

Reference: ogr/ogrsf_frmts/gmlas; every expectation below is the
reference's own assertion in autotest/ogr/ogr_gmlas.py (cited per
test) on its own data/gmlas fixtures.
"""

import os

import pytest

from gdal_ray.sources.gmlas import read_gmlas

D = "/root/reference/autotest/ogr/data/gmlas"

needs_ref = pytest.mark.skipif(not os.path.exists(D),
                               reason="reference absent")


@needs_ref
@pytest.mark.parametrize(
    "filename,attrname,value",
    [
        # ogr_gmlas.py::test_ogr_gmlas_choice_inlined (3503-3506)
        ("choice_str_inlined.xml", "a_b_str_attr", ["val1", "val2"]),
        ("choice_int_inlined.xml", "a_b_int_attr", [1, 2]),
        ("choice_int64_inlined.xml", "a_b_int64_attr",
         [123456789123, 2]),
        ("choice_double_inlined.xml", "a_b_double_attr", [1.5, 2.5]),
    ],
)
def test_choice_inlined_list_fields(filename, attrname, value):
    out = read_gmlas(f"{D}/{filename}")
    lyr = out["main"]
    assert lyr.num_rows == 1
    assert lyr[attrname][0].as_py() == value


@needs_ref
def test_no_namespace():
    # ogr_gmlas.py::test_ogr_gmlas_no_namespace
    out = read_gmlas(f"{D}/gmlas_no_namespace.xml")
    assert out["main_elt"]["foo"][0].as_py() == "bar"


@needs_ref
def test_link_nested_independent_child():
    # ogr_gmlas.py::test_ogr_gmlas_link_nested_independant_child
    out = read_gmlas(f"{D}/gmlas_link_nested_independant_child.xml")
    assert out["first"]["second_my_id"][0].as_py() == "second_id"


@needs_ref
def test_composition_composition_part():
    # ogr_gmlas.py::test_ogr_gmlas_composition_compositionPart:
    # junction rows carry both pkids; the target layer carries the
    # typed fields
    out = read_gmlas(f"{D}/gmlas_composition_compositionPart.xml")
    junction = out["first_composition"]
    assert junction.num_rows == 2
    assert junction["parent_ogr_pkid"].null_count == 0
    assert junction["CompositionPart_pkid"].null_count == 0
    part = out["CompositionPart"]
    assert part.num_rows == 2
    assert part["my_id"].to_pylist() == ["id1", "id2"]
    assert part["a"].to_pylist() == ["a1", "a2"]
    # the junction's pkids resolve into the target layer
    assert set(junction["CompositionPart_pkid"].to_pylist()) == \
        set(part["ogr_pkid"].to_pylist())


@needs_ref
def test_typed_fields():
    out = read_gmlas(f"{D}/choice_int_inlined.xml")
    import pyarrow as pa

    t = out["main"].schema.field("a_b_int_attr").type
    assert t == pa.list_(pa.int32())
    out64 = read_gmlas(f"{D}/choice_int64_inlined.xml")
    assert out64["main"].schema.field("a_b_int64_attr").type == \
        pa.list_(pa.int64())


def test_missing_schema_raises(tmp_path):
    p = tmp_path / "x.xml"
    p.write_text("<root><a>1</a></root>")
    with pytest.raises(ValueError, match="no schemaLocation"):
        read_gmlas(str(p))


def test_anytype_junction_multiplicity_and_extension(tmp_path):
    """Round-5 review findings: repeated untyped (anyType) elements
    become string list fields instead of crashing; a property holding
    SEVERAL targets links each of them in the junction layer; a
    complexContent/extension merges its base type's elements and
    attributes."""
    (tmp_path / "t.xsd").write_text("""<xs:schema
 xmlns:xs="http://www.w3.org/2001/XMLSchema">
<xs:element name="root"><xs:complexType><xs:sequence>
  <xs:element name="item" maxOccurs="unbounded"/>
  <xs:element name="composition" maxOccurs="unbounded">
    <xs:complexType><xs:sequence>
      <xs:element ref="Part" maxOccurs="unbounded"/>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:sequence></xs:complexType></xs:element>
<xs:element name="Part"><xs:complexType><xs:sequence>
  <xs:element name="a" type="xs:string"/>
</xs:sequence><xs:attribute name="my_id" type="xs:ID"/>
</xs:complexType></xs:element>
</xs:schema>""")
    (tmp_path / "t.xml").write_text("""<root
 xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
 xsi:noNamespaceSchemaLocation="t.xsd">
<item>one</item><item>two</item>
<composition><Part my_id="p1"><a>a1</a></Part>
<Part my_id="p2"><a>a2</a></Part></composition>
</root>""")
    out = read_gmlas(str(tmp_path / "t.xml"))
    assert out["root"]["item"][0].as_py() == ["one", "two"]
    assert out["root_composition"].num_rows == 2
    assert out["Part"].num_rows == 2

    (tmp_path / "e.xsd").write_text("""<xs:schema
 xmlns:xs="http://www.w3.org/2001/XMLSchema">
<xs:complexType name="BaseT"><xs:sequence>
  <xs:element name="base_int" type="xs:int"/>
</xs:sequence><xs:attribute name="bid" type="xs:string"/>
</xs:complexType>
<xs:element name="main"><xs:complexType><xs:complexContent>
<xs:extension base="BaseT">
  <xs:sequence><xs:element name="extra" type="xs:string"/></xs:sequence>
  <xs:attribute name="x" type="xs:int"/>
</xs:extension></xs:complexContent></xs:complexType></xs:element>
</xs:schema>""")
    (tmp_path / "e.xml").write_text("""<main
 xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
 xsi:noNamespaceSchemaLocation="e.xsd" bid="B" x="7">
<base_int>5</base_int><extra>E</extra></main>""")
    r = read_gmlas(str(tmp_path / "e.xml"))["main"].to_pylist()[0]
    assert (r["base_int"], r["extra"], r["x"], r["bid"]) == \
        (5, "E", 7, "B")
