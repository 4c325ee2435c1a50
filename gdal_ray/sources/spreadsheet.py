"""XLSX + ODS spreadsheet vector drivers (reference
ogr/ogrsf_frmts/xlsx/ogrxlsxdatasource.cpp and
ogr/ogrsf_frmts/ods/ogrodsdatasource.cpp).

Both formats are a zip of XML parts; each sheet becomes one layer
(Arrow table).  The row->layer machine reproduces the reference's
semantics exactly:

- header detection (``DetectHeaderLine``, ogrxlsxdatasource.cpp:698):
  headers iff every first-row cell is a string, the first row is at
  least as wide as the second, the second row is not all-text, and the
  second row has at least one non-empty non-text cell; overridable
  with FORCE/DISABLE;
- per-column type autodetection with the reference's merge lattice
  (ogrxlsxdatasource.cpp:1121-1195): Integer -> Integer64 -> Real,
  Date/Time -> DateTime, anything else -> String; unknown-type
  columns (empty header-row follower) adopt the first value's type;
- columns appearing mid-sheet get ``FieldN`` names
  (ogrxlsxdatasource.cpp:1100-1118); single-row sheets emit that row
  as data with FieldN names (ogrxlsxdatasource.cpp:876);
- trailing empty sheets are dropped from the workbook
  (ogrxlsxdatasource.cpp:371-380);
- FIDs are 1-based sheet row numbers (so the first feature of a
  headered layer has fid 2 — autotest ogr_xlsx.py test_ogr_xlsx_7).

Cell typing:

- XLSX (ogrxlsxdatasource.cpp:940-985): style ``s`` indexes cellXfs;
  numFmtId 14-17 date / 18-21 time / 22 datetime, custom formats
  (>=164) sniffed for DD/YY (date) and HH (time), SS.000 meaning
  millisecond datetimes; cell ``t``: s=shared string, inlineStr,
  b=bool, str/default=value-sniffed number.  Date cells hold serial
  days since 1899-12-30 (SetField, ogrxlsxdatasource.cpp:637-695).
- ODS (ogrodsdatasource.cpp:1000-1065): office:value-type
  float/percentage/currency/date/time/boolean/string with
  office:value / office:date-value / office:time-value attributes
  (dates ISO 8601, times PTnnHnnMnnS); string cell text is the
  concatenation of text:p children joined by newlines;
  table:number-columns-repeated / number-rows-repeated expansion with
  trailing-blank trimming.

Date/Time/DateTime columns are emitted as the reference's
GetFieldAsString text ("YYYY/MM/DD", "HH:MM:SS",
"YYYY/MM/DD HH:MM:SS") with the OGR type recorded in field metadata,
so goldens pin the exact reference rendering.

Writers emit a minimal conformant zip (inline strings, builtin
date/time/datetime numFmtIds 14/20/22 for XLSX, office:*-value
attributes for ODS) that both this reader and the reference's driver
accept.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa

_SECS_PER_DAY = 86400
_DAYS_1900_1970 = 25569  # NUMBER_OF_DAYS_BETWEEN_1900_AND_1970


# ---------------------------------------------------------------------------
# shared value helpers


def _value_kind(s: str) -> str:
    """CPLGetValueType equivalent: INTEGER / REAL / STRING."""
    t = s.strip()
    if not t:
        return "STRING"
    if re.fullmatch(r"[+-]?\d+", t):
        return "INTEGER"
    if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eEdD][+-]?\d+)?", t):
        return "REAL"
    return "STRING"


def _civil_from_unix(unix: int):
    """Proleptic-Gregorian civil date from a unix timestamp (no
    datetime range limits — the reference allows +/-10000 years)."""
    days, rem = divmod(int(unix), _SECS_PER_DAY)
    h, rem = divmod(rem, 3600)
    mi, se = divmod(rem, 60)
    # Howard Hinnant's civil_from_days
    z = days + 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    if m <= 2:
        y += 1
    return y, m, d, h, mi, se


def _serial_to_text(val: str, celltype: str, ogr_type: str) -> str | None:
    """XLSX serial number -> reference GetFieldAsString text
    (SetField, ogrxlsxdatasource.cpp:637-695)."""
    try:
        days = float(val)
    except ValueError:
        return None
    if not abs(days) < 365.0 * 10000:
        return None
    secs = days * _SECS_PER_DAY
    if abs(secs - round(secs)) < 1e-3:
        secs = round(secs)
    unix = int(secs) - _DAYS_1900_1970 * _SECS_PER_DAY
    y, m, d, h, mi, se = _civil_from_unix(unix)
    frac = secs - int(secs)
    if ogr_type == "Date":
        return "%04d/%02d/%02d" % (y, m, d)
    if ogr_type == "Time":
        return "%02d:%02d:%02d" % (h, mi, se)
    out = "%04d/%02d/%02d %02d:%02d:%02d" % (y, m, d, h, mi, se)
    if celltype == "datetime_ms" and frac:
        out += ("%.3f" % frac)[1:]
    return out


def _iso_to_text(val: str, celltype: str, ogr_type: str) -> str | None:
    """ODS ISO / PT value -> reference GetFieldAsString text
    (SetField, ogrodsdatasource.cpp)."""
    v = val.strip()
    if ogr_type == "Time":
        m = re.match(r"PT(\d{2})H(\d{2})M(\d{2})S", v)
        if not m:  # kspread PThhhhmmMssS quirk
            m2 = re.match(r"PT(\d{2})(\d{2})(\d{2})M(\d{2})S", v)
            if m2 and m2.group(1) == m2.group(2):
                return "%s:%s:%s" % (m2.group(1), m2.group(3), m2.group(4))
            return None
        return "%s:%s:%s" % m.groups()
    m = re.match(r"(\d{4})-(\d{2})-(\d{2})(?:T(\d{2}):(\d{2}):(\d{2}(?:\.\d+)?))?", v)
    if not m:
        return None
    y, mo, d = m.group(1), m.group(2), m.group(3)
    if ogr_type == "Date":
        return "%s/%s/%s" % (y, mo, d)
    h, mi, s = m.group(4) or "00", m.group(5) or "00", m.group(6) or "00"
    if "." in s:
        sf = float(s)
        s = "%02d" % int(sf) if sf == int(sf) else "%06.3f" % sf
    return "%s/%s/%s %s:%s:%s" % (y, mo, d, h, mi, s)


def _cell_ogr_type(value: str, celltype: str, autodetect: bool) -> str:
    """GetOGRFieldType (ogrxlsxdatasource.cpp:586-631 /
    ogrodsdatasource.cpp)."""
    if not autodetect:
        return "String"
    if celltype == "string":
        return "String"
    if celltype in ("float", "currency"):
        k = _value_kind(value)
        if k == "STRING":
            return "String"
        if k == "INTEGER":
            n = int(value)
            return "Integer" if -(2**31) <= n < 2**31 else "Integer64"
        return "Real"
    if celltype == "percentage":
        return "Real"
    if celltype in ("datetime", "datetime_ms"):
        return "DateTime"
    if celltype == "date":
        return "Date"
    if celltype == "time":
        return "Time"
    if celltype == "bool":
        return "Integer"  # subtype Boolean
    return "String"


def _merge_type(cur: str, new: str) -> str:
    """The reference's field-type update lattice
    (ogrxlsxdatasource.cpp:1147-1186)."""
    if cur == new:
        return cur
    if cur == "DateTime" and new in ("Date", "Time"):
        return cur
    if cur == "Real" and new in ("Integer", "Integer64"):
        return cur
    if cur == "Integer64" and new == "Integer":
        return cur
    if cur == "String":
        return cur
    if cur in ("Date", "Time") and new == "DateTime":
        return "DateTime"
    if cur in ("Integer", "Integer64") and new == "Real":
        return "Real"
    if cur == "Integer" and new == "Integer64":
        return "Integer64"
    return "String"


_ARROW = {
    "String": pa.string(),
    "Integer": pa.int32(),
    "Integer64": pa.int64(),
    "Real": pa.float64(),
    "Date": pa.string(),
    "Time": pa.string(),
    "DateTime": pa.string(),
}


def _build_layer(rows, convert, headers="AUTO", autodetect=True) -> pa.Table:
    """Replay the reference's row machine over [(value, celltype)]
    rows and materialize an Arrow table.  ``convert(value, celltype,
    ogr_type)`` renders date-family raw values to text."""
    field_names: list[str] = []
    field_types: list[str] = []
    unknown: set[int] = set()
    feats: list[tuple[int, list]] = []  # (fid, cells)

    def new_field(value, celltype, name=None):
        field_names.append(name or "Field%d" % (len(field_names) + 1))
        field_types.append(_cell_ogr_type(value, celltype, autodetect))

    n = len(rows)
    if n == 0 or (n == 1 and not rows[0]):
        first_is_headers = False
    elif n == 1:
        for v, t in rows[0]:
            new_field(v, t)
        feats.append((1, rows[0]))
        first_is_headers = False
    else:
        first, second = rows[0], rows[1]
        cand = all(t == "string" for _, t in first)
        n_text = sum(1 for _, t in second if t == "string")
        n_other = sum(1 for _, t in second if t not in ("", "string"))
        if headers == "FORCE":
            first_is_headers = True
        elif headers == "DISABLE":
            first_is_headers = False
        else:
            first_is_headers = (cand and len(first) > 0
                                and len(first) >= len(second)
                                and n_text != len(first) and n_other != 0)
        if first_is_headers:
            for i, (v, _t) in enumerate(first):
                name = v or "Field%d" % (i + 1)
                if i < len(second) and second[i][0] != "":
                    new_field(second[i][0], second[i][1], name)
                else:
                    field_names.append(name)
                    field_types.append("String")
                    unknown.add(len(field_names) - 1)
        else:
            for v, t in first:
                new_field(v, t)
            feats.append((1, first))

        for ridx in range(1, n):
            row = rows[ridx]
            while len(row) > len(field_names):
                v, t = row[len(field_names)]
                new_field(v, t)
            if autodetect:
                for i, (v, t) in enumerate(row):
                    if v == "":
                        continue
                    vt = _cell_ogr_type(v, t, autodetect)
                    if i in unknown:
                        unknown.discard(i)
                        field_types[i] = vt
                    else:
                        field_types[i] = _merge_type(field_types[i], vt)
            feats.append((ridx + 1, row))

    cols: list[list] = [[] for _ in field_names]
    fids: list[int] = []
    for fid, row in feats:
        fids.append(fid)
        for i in range(len(field_names)):
            v, t = row[i] if i < len(row) else ("", "")
            ogr = field_types[i]
            if v == "":
                cols[i].append(None)
                continue
            if ogr in ("Date", "Time", "DateTime") or t in (
                    "date", "time", "datetime", "datetime_ms"):
                cols[i].append(convert(v, t, ogr) if t in (
                    "date", "time", "datetime", "datetime_ms") else v)
            elif ogr == "Integer":
                try:
                    cols[i].append(int(float(v)))
                except ValueError:
                    cols[i].append(None)
            elif ogr == "Integer64":
                try:
                    cols[i].append(int(float(v)))
                except ValueError:
                    cols[i].append(None)
            elif ogr == "Real":
                try:
                    cols[i].append(float(v.replace("D", "E").replace("d", "e")))
                except ValueError:
                    cols[i].append(None)
            else:
                cols[i].append(str(v))

    arrays = [pa.array(fids, pa.int64())]
    fields = [pa.field("fid", pa.int64())]
    seen: dict[str, int] = {}
    for i, name in enumerate(field_names):
        # OGR uniquifies duplicate column names
        if name in seen:
            seen[name] += 1
            name = "%s%d" % (name, seen[name])
        else:
            seen[name] = 0
        arrays.append(pa.array(cols[i], _ARROW[field_types[i]]))
        fields.append(pa.field(name, _ARROW[field_types[i]],
                               metadata={"ogr_type": field_types[i]}))
    return pa.table(arrays, schema=pa.schema(fields))


# ---------------------------------------------------------------------------
# XLSX reader

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NSR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NSPR = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_of_ref(ref: str) -> int:
    col = -1
    for ch in ref:
        if "A" <= ch <= "Z":
            col = (col + 1) * 26 + (ord(ch) - 65)
        else:
            break
    return col


def _xlsx_styles(data: bytes) -> list[str]:
    """cellXfs index -> celltype (ogrxlsxdatasource.cpp:1740-1805)."""
    root = ET.fromstring(data)
    custom: dict[int, str] = {}
    numfmts = root.find(_NS + "numFmts")
    if numfmts is not None:
        for nf in numfmts.findall(_NS + "numFmt"):
            fid = int(nf.get("numFmtId", "-1"))
            code = nf.get("formatCode", "")
            if fid >= 164:
                has_date = any(s in code for s in ("DD", "dd", "YY", "yy"))
                has_time = "HH" in code or "hh" in code
                if has_date and has_time:
                    custom[fid] = ("datetime_ms" if "SS.000" in code
                                   or "ss.000" in code else "datetime")
                elif has_date:
                    custom[fid] = "date"
                elif has_time:
                    custom[fid] = "time"
                else:
                    custom[fid] = "float"
    styles: list[str] = []
    xfs = root.find(_NS + "cellXfs")
    if xfs is not None:
        for xf in xfs.findall(_NS + "xf"):
            fid = int(xf.get("numFmtId", "-1"))
            t = "float"
            if 0 <= fid < 164:
                if 14 <= fid <= 17:
                    t = "date"
                elif 18 <= fid <= 21:
                    t = "time"
                elif fid == 22:
                    t = "datetime"
            elif fid >= 164:
                t = custom.get(fid, "float")
            styles.append(t)
    return styles


def _xlsx_shared_strings(data: bytes) -> list[str]:
    root = ET.fromstring(data)
    out = []
    for si in root.findall(_NS + "si"):
        out.append("".join(t.text or "" for t in si.iter(_NS + "t")))
    return out


def _xlsx_sheet_rows(data: bytes, shared: list[str], styles: list[str]):
    root = ET.fromstring(data)
    sheetdata = root.find(_NS + "sheetData")
    rows = []
    if sheetdata is None:
        return rows
    for rowel in sheetdata.findall(_NS + "row"):
        # missing row numbers become empty features
        # (ogrxlsxdatasource.cpp:811-858, gap capped at 10000)
        r = rowel.get("r")
        if r is not None:
            gap = int(r) - 1 - len(rows)
            if 0 < gap <= 10000:
                rows.extend([] for _ in range(gap))
        cells: list[tuple[str, str]] = []
        for c in rowel.findall(_NS + "c"):
            ref = c.get("r", "")
            col = _col_of_ref(ref) if ref else len(cells)
            if col > 2000:
                col = 2000
            while len(cells) < col:
                cells.append(("", ""))
            s = int(c.get("s", "-1"))
            celltype = "float"
            if 0 <= s < len(styles):
                st = styles[s]
                if st in ("date", "time", "datetime", "datetime_ms"):
                    celltype = st
            t = c.get("t", "")
            v = c.find(_NS + "v")
            value = v.text or "" if v is not None else ""
            if t == "s":
                idx = int(value) if value else -1
                value = shared[idx] if 0 <= idx < len(shared) else ""
                celltype = "string"
            elif t == "inlineStr":
                is_el = c.find(_NS + "is")
                value = ("".join(x.text or "" for x in is_el.iter(_NS + "t"))
                         if is_el is not None else "")
                celltype = "string"
            elif t == "str":
                pass  # formula result: value-sniffed
            elif t == "b":
                celltype = "bool"
            cells.append((value, celltype))
        rows.append(cells)
    return rows


def read_xlsx(path_or_bytes, headers: str = "AUTO",
              field_types: str = "AUTO") -> dict[str, pa.Table]:
    """Read an .xlsx workbook into {sheet_name: Arrow table}."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        zf = zipfile.ZipFile(io.BytesIO(bytes(path_or_bytes)))
    else:
        zf = zipfile.ZipFile(path_or_bytes)
    names = set(zf.namelist())

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        shared = _xlsx_shared_strings(zf.read("xl/sharedStrings.xml"))
    styles: list[str] = []
    if "xl/styles.xml" in names:
        styles = _xlsx_styles(zf.read("xl/styles.xml"))

    rels: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot.findall(_NSPR + "Relationship"):
            rels[rel.get("Id", "")] = rel.get("Target", "")

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.find(_NS + "sheets")
    autodetect = field_types.upper() != "STRING"
    layers: list[tuple[str, pa.Table]] = []
    for sh in (sheets.findall(_NS + "sheet") if sheets is not None else []):
        name = sh.get("name", "")
        rid = sh.get(_NSR + "id", "")
        target = rels.get(rid, "")
        if not target:
            continue
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target[1:]
        if target not in names:
            continue
        rows = _xlsx_sheet_rows(zf.read(target), shared, styles)
        layers.append((name, _build_layer(rows, _serial_to_text,
                                          headers.upper(), autodetect)))
    # drop trailing empty sheets (ogrxlsxdatasource.cpp:371-380)
    while layers and layers[-1][1].num_rows == 0:
        layers.pop()
    return dict(layers)


# ---------------------------------------------------------------------------
# ODS reader

_NSO = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_NST = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_NSTX = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_MAX_CELLS = 1_000_000


def _ods_cell(cell) -> tuple[str, str]:
    vt = cell.get(_NSO + "value-type", "")
    value = cell.get(_NSO + "value")
    if value is None:
        value = cell.get(_NSO + "date-value")
    if value is None:
        value = cell.get(_NSO + "time-value", "")
    formula = cell.get(_NST + "formula")
    if formula and formula.startswith("of:="):
        if formula == "of:=TRUE()":
            return "1", "bool"
        if formula == "of:=FALSE()":
            return "0", "bool"
        if not vt:
            vt = "formula"
    if vt == "boolean":
        vt = "bool"
        bv = cell.get(_NSO + "boolean-value", "")
        value = "1" if bv == "true" else "0"
    if not value:
        ps = cell.findall(_NSTX + "p")
        if ps:
            value = "\n".join("".join(p.itertext()) for p in ps)
            if not vt:
                vt = "string"
    if vt in ("date", "time") and not value:
        vt = "string"
    if vt == "date" and "T" in value:
        vt = "datetime"
    if vt == "formula":
        vt = "string"
    return value or "", vt


def read_ods(path_or_bytes, headers: str = "AUTO",
             field_types: str = "AUTO") -> dict[str, pa.Table]:
    """Read an .ods spreadsheet into {sheet_name: Arrow table}."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        zf = zipfile.ZipFile(io.BytesIO(bytes(path_or_bytes)))
    else:
        zf = zipfile.ZipFile(path_or_bytes)
    root = ET.fromstring(zf.read("content.xml"))
    body = root.find(_NSO + "body")
    ss = body.find(_NSO + "spreadsheet") if body is not None else None
    autodetect = field_types.upper() != "STRING"
    layers: list[tuple[str, pa.Table]] = []
    for table in (ss.findall(_NST + "table") if ss is not None else []):
        name = table.get(_NST + "name", "")
        rows: list[list[tuple[str, str]]] = []
        ncells = 0
        for rowel in table.findall(_NST + "table-row"):
            nrep = int(rowel.get(_NST + "number-rows-repeated", "1"))
            cells: list[tuple[str, str]] = []
            for cell in rowel:
                tag = cell.tag
                if tag == _NST + "covered-table-cell":
                    cells.append(("", ""))
                    continue
                if tag != _NST + "table-cell":
                    continue
                crep = int(cell.get(_NST + "number-columns-repeated", "1"))
                v, t = _ods_cell(cell)
                if v == "" and t == "":
                    # repeated blanks fill; trimmed at row end
                    crep = min(crep, 2001)
                for _ in range(min(crep, 2001)):
                    cells.append((v, t))
            while cells and cells[-1][0] == "" and cells[-1][1] == "":
                cells.pop()
            for _ in range(nrep):
                rows.append(list(cells))
                ncells += len(cells)
                if ncells > _MAX_CELLS:
                    break
            if ncells > _MAX_CELLS:
                break
        while rows and not rows[-1]:
            rows.pop()
        layers.append((name, _build_layer(rows, _iso_to_text,
                                          headers.upper(), autodetect)))
    while layers and layers[-1][1].num_rows == 0:
        layers.pop()
    return dict(layers)


# ---------------------------------------------------------------------------
# writers


def _col_name(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


_XLSX_STYLE_FOR = {"Date": 1, "Time": 2, "DateTime": 3}


def _text_to_serial(txt: str, ogr: str) -> float | None:
    if ogr == "Time":
        m = re.match(r"(\d{2}):(\d{2}):(\d{2})", txt)
        if not m:
            return None
        h, mi, s = map(int, m.groups())
        return (h * 3600 + mi * 60 + s) / _SECS_PER_DAY
    m = re.match(r"(\d{4})[/-](\d{2})[/-](\d{2})(?:[ T](\d{2}):(\d{2}):(\d{2}))?",
                 txt)
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    h = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    s = int(m.group(6) or 0)
    # days_from_civil
    y2 = y - (1 if mo <= 2 else 0)
    era = (y2 if y2 >= 0 else y2 - 399) // 400
    yoe = y2 - era * 400
    mp = mo - 3 if mo > 2 else mo + 9
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe - 719468
    return days + _DAYS_1900_1970 + (h * 3600 + mi * 60 + s) / _SECS_PER_DAY


def write_xlsx(layers: dict[str, pa.Table]) -> bytes:
    """Serialize {name: table} to .xlsx bytes (headers always written,
    like the reference's writer)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        n = len(layers)
        sheets_xml = []
        rels_xml = ['<Relationship Id="rIdS" Type="http://schemas.openxml'
                    'formats.org/officeDocument/2006/relationships/styles" '
                    'Target="styles.xml"/>']
        cts = []
        for i, name in enumerate(layers):
            sheets_xml.append(
                '<sheet name="%s" sheetId="%d" state="visible" r:id="rId%d"/>'
                % (name, i + 1, i + 1))
            rels_xml.append(
                '<Relationship Id="rId%d" Type="http://schemas.openxmlformats'
                '.org/officeDocument/2006/relationships/worksheet" '
                'Target="worksheets/sheet%d.xml"/>' % (i + 1, i + 1))
            cts.append('<Override PartName="/xl/worksheets/sheet%d.xml" '
                       'ContentType="application/vnd.openxmlformats-'
                       'officedocument.spreadsheetml.worksheet+xml"/>' % (i + 1))
        zf.writestr("[Content_Types].xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<Types xmlns="http://schemas.openxmlformats.org/package/'
                    '2006/content-types">'
                    '<Default Extension="rels" ContentType="application/vnd.'
                    'openxmlformats-package.relationships+xml"/>'
                    '<Default Extension="xml" ContentType="application/xml"/>'
                    '<Override PartName="/xl/workbook.xml" ContentType='
                    '"application/vnd.openxmlformats-officedocument.'
                    'spreadsheetml.sheet.main+xml"/>'
                    '<Override PartName="/xl/styles.xml" ContentType='
                    '"application/vnd.openxmlformats-officedocument.'
                    'spreadsheetml.styles+xml"/>' + "".join(cts) + '</Types>')
        zf.writestr("_rels/.rels",
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<Relationships xmlns="http://schemas.openxmlformats.org/'
                    'package/2006/relationships">'
                    '<Relationship Id="rId1" Type="http://schemas.openxml'
                    'formats.org/officeDocument/2006/relationships/office'
                    'Document" Target="xl/workbook.xml"/></Relationships>')
        zf.writestr("xl/workbook.xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<workbook xmlns="http://schemas.openxmlformats.org/'
                    'spreadsheetml/2006/main" xmlns:r="http://schemas.openxml'
                    'formats.org/officeDocument/2006/relationships"><sheets>'
                    + "".join(sheets_xml) + "</sheets></workbook>")
        zf.writestr("xl/_rels/workbook.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<Relationships xmlns="http://schemas.openxmlformats.org/'
                    'package/2006/relationships">' + "".join(rels_xml)
                    + "</Relationships>")
        zf.writestr("xl/styles.xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<styleSheet xmlns="http://schemas.openxmlformats.org/'
                    'spreadsheetml/2006/main">'
                    '<cellXfs count="4">'
                    '<xf numFmtId="0"/><xf numFmtId="14"/>'
                    '<xf numFmtId="20"/><xf numFmtId="22"/>'
                    '</cellXfs></styleSheet>')
        for i, (name, tab) in enumerate(layers.items()):
            cols = [c for c in tab.column_names if c != "fid"]
            ogr_types = {}
            for f in tab.schema:
                if f.metadata and b"ogr_type" in f.metadata:
                    ogr_types[f.name] = f.metadata[b"ogr_type"].decode()
            rows_xml = []
            hdr = "".join(
                '<c r="%s1" t="inlineStr"><is><t>%s</t></is></c>'
                % (_col_name(j), _xml_escape(c)) for j, c in enumerate(cols))
            rows_xml.append('<row r="1">%s</row>' % hdr)
            data = tab.to_pydict()
            for r in range(tab.num_rows):
                cells = []
                for j, c in enumerate(cols):
                    v = data[c][r]
                    if v is None:
                        continue
                    ref = "%s%d" % (_col_name(j), r + 2)
                    ogr = ogr_types.get(c, "")
                    if ogr in ("Date", "Time", "DateTime"):
                        ser = _text_to_serial(str(v), ogr)
                        if ser is not None:
                            cells.append('<c r="%s" s="%d"><v>%.17g</v></c>'
                                         % (ref, _XLSX_STYLE_FOR[ogr], ser))
                            continue
                    if isinstance(v, bool):
                        cells.append('<c r="%s" t="b"><v>%d</v></c>'
                                     % (ref, int(v)))
                    elif isinstance(v, (int, float)):
                        cells.append('<c r="%s"><v>%.17g</v></c>' % (ref, v))
                    else:
                        cells.append('<c r="%s" t="inlineStr"><is><t>%s</t>'
                                     '</is></c>' % (ref, _xml_escape(str(v))))
                rows_xml.append('<row r="%d">%s</row>' % (r + 2, "".join(cells)))
            zf.writestr("xl/worksheets/sheet%d.xml" % (i + 1),
                        '<?xml version="1.0" encoding="UTF-8" standalone='
                        '"yes"?><worksheet xmlns="http://schemas.openxml'
                        'formats.org/spreadsheetml/2006/main"><sheetData>'
                        + "".join(rows_xml) + "</sheetData></worksheet>")
    return buf.getvalue()


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def write_ods(layers: dict[str, pa.Table]) -> bytes:
    """Serialize {name: table} to .ods bytes."""
    tables_xml = []
    for name, tab in layers.items():
        cols = [c for c in tab.column_names if c != "fid"]
        ogr_types = {}
        for f in tab.schema:
            if f.metadata and b"ogr_type" in f.metadata:
                ogr_types[f.name] = f.metadata[b"ogr_type"].decode()
        rows = ['<table:table-row>' + "".join(
            '<table:table-cell office:value-type="string"><text:p>%s'
            '</text:p></table:table-cell>' % _xml_escape(c) for c in cols)
            + '</table:table-row>']
        data = tab.to_pydict()
        for r in range(tab.num_rows):
            cells = []
            for c in cols:
                v = data[c][r]
                if v is None:
                    cells.append('<table:table-cell/>')
                    continue
                ogr = ogr_types.get(c, "")
                if ogr == "Date":
                    m = re.match(r"(\d{4})/(\d{2})/(\d{2})", str(v))
                    cells.append('<table:table-cell office:value-type="date" '
                                 'office:date-value="%s-%s-%s"/>' % m.groups())
                elif ogr == "DateTime":
                    m = re.match(
                        r"(\d{4})/(\d{2})/(\d{2}) (\d{2}):(\d{2}):(\d{2})",
                        str(v))
                    if m:
                        g = m.groups()
                        cells.append(
                            '<table:table-cell office:value-type="date" '
                            'office:date-value="%s-%s-%sT%s:%s:%s"/>' % g)
                    else:
                        cells.append('<table:table-cell office:value-type='
                                     '"string"><text:p>%s</text:p>'
                                     '</table:table-cell>' % _xml_escape(str(v)))
                elif ogr == "Time":
                    m = re.match(r"(\d{2}):(\d{2}):(\d{2})", str(v))
                    cells.append('<table:table-cell office:value-type="time" '
                                 'office:time-value="PT%sH%sM%sS"/>'
                                 % m.groups())
                elif isinstance(v, bool):
                    cells.append('<table:table-cell office:value-type='
                                 '"boolean" office:boolean-value="%s"/>'
                                 % ("true" if v else "false"))
                elif isinstance(v, (int, float)):
                    cells.append('<table:table-cell office:value-type="float" '
                                 'office:value="%.17g"/>' % v)
                else:
                    cells.append('<table:table-cell office:value-type='
                                 '"string"><text:p>%s</text:p>'
                                 '</table:table-cell>' % _xml_escape(str(v)))
            rows.append('<table:table-row>%s</table:table-row>' % "".join(cells))
        tables_xml.append('<table:table table:name="%s">%s</table:table>'
                          % (_xml_escape(name), "".join(rows)))
    content = ('<?xml version="1.0" encoding="UTF-8"?>'
               '<office:document-content '
               'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
               'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
               'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
               'office:version="1.2"><office:body><office:spreadsheet>'
               + "".join(tables_xml)
               + '</office:spreadsheet></office:body></office:document-content>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype",
                    "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("META-INF/manifest.xml",
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
                    'opendocument:xmlns:manifest:1.0">'
                    '<manifest:file-entry manifest:media-type="application/'
                    'vnd.oasis.opendocument.spreadsheet" '
                    'manifest:full-path="/"/>'
                    '<manifest:file-entry manifest:media-type="text/xml" '
                    'manifest:full-path="content.xml"/></manifest:manifest>')
        zf.writestr("content.xml", content)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Ray Dataset bridge


def spreadsheet_dataset(path: str, sheet: str, fmt: str | None = None,
                        shards: int = 4):
    """Ray Dataset over ONE sheet (sheets are separate layers with
    separate schemas), sharded by row range; the zip parse runs
    task-side per shard.  Spreadsheets are driver-sized by nature —
    the sharding exists so downstream map_batches stages parallelize."""
    import ray.data

    if fmt is None:
        fmt = "ods" if path.lower().endswith(".ods") else "xlsx"
    reader = read_ods if fmt == "ods" else read_xlsx
    nrows = reader(path)[sheet].num_rows
    step = max(1, -(-nrows // max(1, shards)))
    ranges = [(i, min(i + step, nrows)) for i in range(0, nrows, step)]

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for rec in batch.to_pylist():
            tab = reader(path)[sheet]
            out.append(tab.slice(rec["lo"], rec["hi"] - rec["lo"]))
        return pa.concat_tables(out) if out else reader(path)[sheet].slice(0, 0)

    ds = ray.data.from_items([{"lo": lo, "hi": hi} for lo, hi in ranges])
    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)
