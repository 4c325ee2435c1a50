"""Legacy Excel .xls (BIFF8 in an OLE2 compound document) vector
driver (the reference wraps freexl in ogr/ogrsf_frmts/xls; this is a
from-scratch reader of the published formats).

OLE2/CFB: 512-byte header (magic D0CF11E0A1B11AE1), FAT built from
the 109 header DIFAT entries (+ DIFAT chains), a directory stream of
128-byte entries, and a mini-stream (64-byte sectors, own mini FAT)
for streams under 4096 bytes.  The ``Workbook`` / ``Book`` stream
holds BIFF8 records (u16 type + u16 length): BOUNDSHEET sheet
offsets, SST shared strings (unicode grbit, rich/ext skips,
CONTINUE-spanning), XF records whose format indexes mark
date/time/datetime cells (builtin ids 14-22 like XLSX + FORMAT
record scans), and cell records LABELSST / NUMBER / RK / MULRK /
LABEL / BOOLERR / FORMULA.  RK values: bit0 = /100, bit1 = integer
<< 2, else the high 30 bits of an IEEE double.

Sheets feed the engine's shared spreadsheet row machine
(sources/spreadsheet._build_layer), so header detection, type
merging and serial-date rendering match the XLSX driver and the
reference's autotest (ogr_xls.py)."""

from __future__ import annotations

import struct

import numpy as np

from .spreadsheet import _build_layer, _serial_to_text


def _ole2_streams(data: bytes) -> dict[str, bytes]:
    if data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise ValueError("not an OLE2 compound document")
    sect_size = 1 << struct.unpack_from("<H", data, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(n):
        off = 512 + n * sect_size
        return data[off:off + sect_size]

    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    for _ in range(n_difat):
        if s < 0:
            break
        sec = sector(s)
        vals = struct.unpack_from("<%di" % (sect_size // 4), sec)
        difat.extend(vals[:-1])
        s = vals[-1]
    fat = []
    for fs in difat[:n_fat]:
        if fs < 0:
            continue
        fat.extend(struct.unpack_from("<%di" % (sect_size // 4),
                                      sector(fs)))

    def chain(start):
        out = bytearray()
        s2 = start
        seen = 0
        while s2 >= 0 and seen < len(fat) + 2:
            out += sector(s2)
            s2 = fat[s2] if s2 < len(fat) else -2
            seen += 1
        return bytes(out)

    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        name_len = struct.unpack_from("<H", dirdata, off + 64)[0]
        if name_len < 2:
            continue
        name = dirdata[off:off + name_len - 2].decode("utf-16-le",
                                                      "replace")
        etype = dirdata[off + 66]
        start = struct.unpack_from("<i", dirdata, off + 116)[0]
        size = struct.unpack_from("<I", dirdata, off + 120)[0]
        entries.append((name, etype, start, size))

    # root entry holds the mini stream
    root = next((e for e in entries if e[1] == 5), None)
    ministream = chain(root[2]) if root else b""
    minifat = []
    if minifat_start >= 0:
        mf = chain(minifat_start)
        minifat = list(struct.unpack_from("<%di" % (len(mf) // 4), mf))

    def minichain(start, size):
        out = bytearray()
        s2 = start
        while s2 >= 0 and len(out) < size + mini_size:
            out += ministream[s2 * mini_size:(s2 + 1) * mini_size]
            s2 = minifat[s2] if s2 < len(minifat) else -2
        return bytes(out[:size])

    streams = {}
    for name, etype, start, size in entries:
        if etype != 2:
            continue
        if size < mini_cutoff:
            streams[name] = minichain(start, size)
        else:
            streams[name] = chain(start)[:size]
    return streams


def _rk_value(rk: int) -> float:
    cents = rk & 1
    is_int = rk & 2
    if is_int:
        v = float(rk >> 2 if rk < 0x80000000 else (rk >> 2) - (1 << 30))
        # proper signed shift
        sv = rk >> 2
        if rk & 0x80000000:
            sv -= 1 << 30
        v = float(sv)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00"
                          + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if cents else v


def _read_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """SST with CONTINUE records: each continued fragment restarts
    with its own grbit byte."""
    strings = []
    bufs = [payload] + continues
    bi = 0
    pos = 8  # total + unique counts
    n_unique = struct.unpack_from("<I", payload, 4)[0]

    def ensure(nbytes):
        nonlocal bi, pos
        if pos >= len(bufs[bi]):
            bi += 1
            pos = 0

    for _ in range(n_unique):
        ensure(1)
        clen = struct.unpack_from("<H", bufs[bi], pos)[0]
        pos += 2
        ensure(1)
        grbit = bufs[bi][pos]
        pos += 1
        rich = grbit & 8
        ext = grbit & 4
        nruns = 0
        extlen = 0
        if rich:
            ensure(1)
            nruns = struct.unpack_from("<H", bufs[bi], pos)[0]
            pos += 2
        if ext:
            ensure(1)
            extlen = struct.unpack_from("<I", bufs[bi], pos)[0]
            pos += 4
        chars = []
        remaining = clen
        wide = grbit & 1
        while remaining:
            if pos >= len(bufs[bi]):
                bi += 1
                pos = 0
                wide = bufs[bi][pos] & 1
                pos += 1
            avail_bytes = len(bufs[bi]) - pos
            if wide:
                take = min(remaining, avail_bytes // 2)
                chars.append(bufs[bi][pos:pos + take * 2]
                             .decode("utf-16-le", "replace"))
                pos += take * 2
            else:
                take = min(remaining, avail_bytes)
                chars.append(bufs[bi][pos:pos + take]
                             .decode("latin-1"))
                pos += take
            remaining -= take
        skip = nruns * 4 + extlen
        while skip:
            if pos >= len(bufs[bi]):
                bi += 1
                pos = 0
            step = min(skip, len(bufs[bi]) - pos)
            pos += step
            skip -= step
        strings.append("".join(chars))
    return strings


def read_xls(path: str, headers: str = "AUTO") -> dict[str, "object"]:
    """-> {sheet name: Arrow table} (same output model as
    read_xlsx)."""
    with open(path, "rb") as f:
        data = f.read()
    streams = _ole2_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("no Workbook stream")

    # pass 1: global records (BOUNDSHEET, SST, XF, FORMAT)
    pos = 0
    sheets = []  # (name, offset)
    sst: list[str] = []
    xf_types: list[str] = []
    custom_fmt: dict[int, str] = {}
    records = []
    while pos + 4 <= len(wb):
        rtype, rlen = struct.unpack_from("<HH", wb, pos)
        payload = wb[pos + 4:pos + 4 + rlen]
        records.append((pos, rtype, payload))
        pos += 4 + rlen

    for idx, (rpos, rtype, payload) in enumerate(records):
        if rtype == 0x0085:  # BOUNDSHEET
            off = struct.unpack_from("<I", payload, 0)[0]
            nlen = payload[6]
            grbit = payload[7]
            if grbit & 1:
                name = payload[8:8 + nlen * 2].decode("utf-16-le",
                                                      "replace")
            else:
                name = payload[8:8 + nlen].decode("latin-1")
            sheets.append((name, off))
        elif rtype == 0x00FC:  # SST
            cont = []
            j = idx + 1
            while j < len(records) and records[j][1] == 0x003C:
                cont.append(records[j][2])
                j += 1
            sst = _read_sst(payload, cont)
        elif rtype == 0x041E:  # FORMAT
            fmt_id = struct.unpack_from("<H", payload, 0)[0]
            clen = struct.unpack_from("<H", payload, 2)[0]
            grbit = payload[4]
            if grbit & 1:
                txt = payload[5:5 + clen * 2].decode("utf-16-le", "replace")
            else:
                txt = payload[5:5 + clen].decode("latin-1")
            custom_fmt[fmt_id] = txt
        elif rtype == 0x00E0:  # XF
            fmt_id = struct.unpack_from("<H", payload, 2)[0]
            t = "float"
            if 14 <= fmt_id <= 17:
                t = "date"
            elif 18 <= fmt_id <= 21:
                t = "time"
            elif fmt_id == 22:
                t = "datetime"
            elif fmt_id in custom_fmt:
                code = custom_fmt[fmt_id]
                has_date = any(s in code for s in ("DD", "dd", "YY", "yy",
                                                   "MM/"))
                has_time = "HH" in code or "hh" in code or "h:" in code
                if has_date and has_time:
                    t = "datetime"
                elif has_date:
                    t = "date"
                elif has_time:
                    t = "time"
            xf_types.append(t)

    def celltype_of(xf):
        if 0 <= xf < len(xf_types):
            return xf_types[xf]
        return "float"

    out = {}
    for name, off in sheets:
        rows: dict[int, dict[int, tuple[str, str]]] = {}
        pos2 = off
        depth = 0
        while pos2 + 4 <= len(wb):
            rtype, rlen = struct.unpack_from("<HH", wb, pos2)
            payload = wb[pos2 + 4:pos2 + 4 + rlen]
            pos2 += 4 + rlen
            if rtype == 0x0809:  # BOF
                depth += 1
                if depth > 1:
                    break
                continue
            if rtype == 0x000A:  # EOF
                break
            if rtype == 0x00FD:  # LABELSST
                r, c, xf, isst = struct.unpack_from("<HHHI", payload, 0)
                rows.setdefault(r, {})[c] = (
                    sst[isst] if isst < len(sst) else "", "string")
            elif rtype == 0x0203:  # NUMBER
                r, c, xf = struct.unpack_from("<HHH", payload, 0)
                v = struct.unpack_from("<d", payload, 6)[0]
                rows.setdefault(r, {})[c] = ("%.17g" % v, celltype_of(xf))
            elif rtype == 0x027E:  # RK
                r, c, xf = struct.unpack_from("<HHH", payload, 0)
                rk = struct.unpack_from("<I", payload, 6)[0]
                rows.setdefault(r, {})[c] = ("%.17g" % _rk_value(rk),
                                             celltype_of(xf))
            elif rtype == 0x00BD:  # MULRK
                r, c0 = struct.unpack_from("<HH", payload, 0)
                n = (len(payload) - 6) // 6
                for k in range(n):
                    xf, rk = struct.unpack_from("<HI", payload, 4 + k * 6)
                    rows.setdefault(r, {})[c0 + k] = (
                        "%.17g" % _rk_value(rk), celltype_of(xf))
            elif rtype == 0x0204:  # LABEL (BIFF8 unicode)
                r, c, xf = struct.unpack_from("<HHH", payload, 0)
                clen = struct.unpack_from("<H", payload, 6)[0]
                grbit = payload[8]
                if grbit & 1:
                    txt = payload[9:9 + clen * 2].decode("utf-16-le",
                                                         "replace")
                else:
                    txt = payload[9:9 + clen].decode("latin-1")
                rows.setdefault(r, {})[c] = (txt, "string")
            elif rtype == 0x0205:  # BOOLERR
                r, c, xf = struct.unpack_from("<HHH", payload, 0)
                if payload[7] == 0:  # boolean
                    rows.setdefault(r, {})[c] = (str(payload[6]), "bool")
            elif rtype == 0x0006:  # FORMULA: numeric result inline
                r, c, xf = struct.unpack_from("<HHH", payload, 0)
                res = payload[6:14]
                if res[6:8] != b"\xff\xff":
                    v = struct.unpack("<d", res)[0]
                    rows.setdefault(r, {})[c] = ("%.17g" % v,
                                                 celltype_of(xf))

        if not rows:
            out[name] = _build_layer([], _serial_to_text,
                                     headers.upper(), True)
            continue
        max_row = max(rows)
        grid = []
        for r in range(max_row + 1):
            cols = rows.get(r, {})
            width = max(cols) + 1 if cols else 0
            grid.append([cols.get(c, ("", "")) for c in range(width)])
        out[name] = _build_layer(grid, _serial_to_text, headers.upper(),
                                 True)
    # drop trailing empty sheets like the XLSX driver
    names = list(out)
    while names and out[names[-1]].num_rows == 0:
        out.pop(names.pop())
    return out
