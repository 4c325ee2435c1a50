"""MSGN — EUMETSAT Meteosat Second Generation Native (.nat) reader.

Re-derivation of frmts/msgn (msg_basic_types.h packed structs +
msg_reader_core.cpp + msgndataset.cpp):

- identification: the file starts with the ASCII PH_DATA
  "FormatName                  : NATIVE";
- MAIN_PROD_HEADER (6 PH_DATA + 5 PH_DATA_ID + 1364 slack + 19
  PH_DATA, 80/62-byte text entries) then SECONDARY_PROD_HEADER (14
  PH_DATA) carrying selectedBandIds ('X' per active channel) and the
  selected-rectangle line/column bounds that give the raster size
  (lines = north - (south-1), columns = west - (east-1),
  msg_reader_core.cpp:196-216);
- 15Header/15Data/15Trailer offsets from the dataSetIdentification
  PH_DATA_ID entries;
- the level-1.5 header block holds the IMAGE_DESCRIPTION_RECORD at
  RADIOMETRICPROCESSING_RECORD_OFFSET(=387. . .) - 101 +
  header_offset + 22 + 16 + 1 (big-endian ints/floats: SSP longitude,
  VISIR/HRV reference grids, planned coverage) and the
  RADIOMETRIC_PROCESSING_RECORD (12 x (slope, offset) big-endian
  doubles) right after it;
- data block: per line and active channel one packet GP_PK_HEADER(22,
  u32be packetLength) + GP_PK_SH1(16) + SUB_VISIRLINE(27, u32be
  lineNumberInVisirGrid, channelId byte, lineValidity) + 10-bit
  MSB-first big-endian packed samples, written mirrored (sample c
  lands at column width-1-c); packet size on disk = packetLength +
  22 + 1; HRV (channel 12) has 3 consecutive lines per image line;
- VISIR bands = channels 1..11 as UInt16; RAD: mode applies the
  per-channel slope/offset calibration to Float64 (only channels
  1..3 and those with a Blackbody LUT); line validity != 1 fills the
  613 nodata (0 for raw, -1000 for radiance); the HRV band and the
  RSS/SPLIT_HRV shear re-assembly are a documented subset (whole-disk
  and RSS VISIR shapes implemented);
- geotransform per msgndataset.cpp:668-683 (3712-line nominal grid,
  km steps x1000) and ch%02u_cal / Date/Time / Origin metadata.
"""
from __future__ import annotations

import struct

import numpy as np

MAIN_HEADER_SIZE = 6 * 80 + 5 * 62 + 1364 + 19 * 80       # 3674
SEC_HEADER_SIZE = 14 * 80
RADIOMETRIC_OFFSET = 60134 + 700 + 326058 + 101            # 386993
GP_PK_HEADER_SIZE = 22
GP_PK_SH1_SIZE = 16
SUB_VISIRLINE_SIZE = 27
NLINES = 3712.0
NUM_CHANNELS = 12

# Blackbody_LUT B coefficients (channel 1..12); nonzero => thermal
_BLACKBODY_B = [0, 0, 0, 0.9959, 0.9963, 0.9991, 0.9996, 0.9999,
                0.9983, 0.9988, 0.9981, 0]


def _ph(data: bytes, off: int) -> tuple[str, str]:
    name = data[off:off + 30].decode("latin-1")
    value = data[off + 30:off + 80].decode("latin-1")
    return name.rstrip().rstrip(":").rstrip(), value.strip()


def _ph_id(data: bytes, off: int) -> tuple[str, str, str]:
    name = data[off:off + 30].decode("latin-1").rstrip().rstrip(":").rstrip()
    size = data[off + 30:off + 46].decode("latin-1").strip()
    addr = data[off + 46:off + 62].decode("latin-1").strip()
    return name, size, addr


def _unpack10(raw: bytes, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(raw, np.uint8))
    usable = (len(bits) // 10) * 10
    vals = bits[:usable].reshape(-1, 10)
    out = np.zeros(len(vals), np.uint16)
    for b in range(10):
        out = (out << 1) | vals[:, b]
    return out[:n]


def _pack10(vals: np.ndarray) -> bytes:
    bits = np.zeros((len(vals), 10), np.uint8)
    v = np.asarray(vals, np.uint16)
    for b in range(10):
        bits[:, b] = (v >> (9 - b)) & 1
    return np.packbits(bits.reshape(-1)).tobytes()


def read_msgn(data: bytes, mode: str = "VISIR") -> dict:
    if not data.startswith(b"FormatName                  : NATIVE"):
        raise ValueError("MSGN: not a NATIVE format image")
    if mode not in ("VISIR", "RAD", "HRV"):
        raise ValueError(f"MSGN: unknown mode {mode}")
    if mode == "HRV":
        raise NotImplementedError(
            "MSGN: the HRV channel (3-line packets + split/RSS shear "
            "re-assembly, msgndataset.cpp:485-560) is a documented "
            "subset; VISIR/RAD implemented")

    # ------------------------------------------------ text headers
    f_header_offset = f_data_offset = 0
    for i in range(5):
        name, size, addr = _ph_id(data, 6 * 80 + i * 62)
        if name.startswith("15Header"):
            f_header_offset = int(addr)
        elif name.startswith("15Data"):
            f_data_offset = int(addr)
    sec = data[MAIN_HEADER_SIZE:MAIN_HEADER_SIZE + SEC_HEADER_SIZE]
    skv = {}
    for i in range(14):
        k, v = _ph(sec, i * 80)
        skv[k] = v
    band_ids = skv.get("SelectedBandIDs", skv.get("selectedBandIds", ""))
    south = int(skv.get("SouthLineSelectedRectangle", "0") or 0)
    north = int(skv.get("NorthLineSelectedRectangle", "0") or 0)
    east = int(skv.get("EastColumnSelectedRectangle", "0") or 0)
    west = int(skv.get("WestColumnSelectedRectangle", "0") or 0)
    lines = north
    line_start = south
    if south > 0 and lines >= south - 1:
        lines -= south - 1
    columns = west
    col_start = east
    if east > 0 and columns >= east - 1:
        columns -= east - 1
    bands_active = [1 if i < len(band_ids) and band_ids[i] == "X" else 0
                    for i in range(NUM_CHANNELS)]

    # SNIT timestamp (main header text block after the slack)
    snit = ""
    base = 6 * 80 + 5 * 62 + 1364
    for i in range(19):
        k, v = _ph(data, base + i * 80)
        if k.upper().startswith("SNIT") or k == "snit":
            snit = v
            break

    # ------------------------------------------- binary L1.5 header
    idr_off = (RADIOMETRIC_OFFSET - 101 + f_header_offset +
               GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1)
    idr = data[idr_off:idr_off + 87]
    if len(idr) < 87:
        raise ValueError("MSGN: truncated image description record")
    ssp_lon = struct.unpack(">f", idr[1:5])[0]
    rg_visir = struct.unpack(">iiffB", idr[5:22])
    pc_visir = struct.unpack(">4i", idr[39:55])
    line_step, col_step = rg_visir[2], rg_visir[3]

    rad_off = (RADIOMETRIC_OFFSET + f_header_offset +
               GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1)
    cal_raw = data[rad_off + 72:rad_off + 72 + 192]
    calib = [(struct.unpack(">d", cal_raw[i * 16:i * 16 + 8])[0],
              struct.unpack(">d", cal_raw[i * 16 + 8:i * 16 + 16])[0])
             for i in range(12)]

    # ------------------------------------- scan first-line packets
    pos = f_data_offset
    visir_bpl = visir_packet = 0
    interline = 0
    remaining = [b for b in bands_active]
    count = sum(remaining)
    while count > 0:
        hdr = data[pos:pos + GP_PK_HEADER_SIZE]
        if len(hdr) < GP_PK_HEADER_SIZE:
            raise ValueError("MSGN: truncated data block")
        packet_length = struct.unpack(">I", hdr[14:18])[0]
        sub = data[pos + GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE:
                   pos + GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE +
                   SUB_VISIRLINE_SIZE]
        # SUB_VISIRLINE: ver(0) sat(1:3) repeatCycleStart(3:13)
        #   lineNumber(13:17 i32be) channelId(17) acqTime(18:24)
        #   validity(24) radiometricQ(25) geometricQ(26)
        chan = sub[17]
        if chan == 0 or chan > NUM_CHANNELS:
            raise ValueError("MSGN: bad channel id in data block")
        pkt_size = packet_length + GP_PK_HEADER_SIZE + 1
        if remaining[chan - 1]:
            remaining[chan - 1] = 0
            count -= 1
            bpl = packet_length - (GP_PK_SH1_SIZE + SUB_VISIRLINE_SIZE - 1)
            if chan != 12:
                visir_bpl = bpl
                visir_packet = pkt_size
                interline += pkt_size
            else:
                interline += 3 * pkt_size
                pos += 2 * pkt_size
        pos += pkt_size

    n_raw_cols = (visir_bpl * 8) // 10
    # shape gate (whole disk / RSS) per msgndataset.cpp:560-605
    if (pc_visir[0] == 1 and pc_visir[1] == lines and pc_visir[2] >= 1
            and pc_visir[3] == pc_visir[2] + n_raw_cols - 1
            and pc_visir[3] <= columns):
        shape = "WHOLE_DISK"
    elif (pc_visir[1] == rg_visir[0]
          and pc_visir[3] == pc_visir[2] + n_raw_cols - 1
          and pc_visir[0] > 1 and pc_visir[2] >= 1
          and pc_visir[3] <= columns
          and pc_visir[1] == pc_visir[0] + lines - 1):
        shape = "RSS"
    else:
        raise ValueError(
            "MSGN: Neither Whole Disk nor RSS - don't know how to handle")

    # ----------------------------------------------------- decode
    out_channels = []
    nodata = 0 if mode == "VISIR" else -1000.0
    band_in_file = 0
    n_samples = (visir_bpl * 8) // 10
    for ch in range(NUM_CHANNELS):
        if not bands_active[ch]:
            continue
        band_in_file += 1
        if ch >= NUM_CHANNELS - 1:
            continue    # HRV not part of VISIR/RAD band set
        # _BLACKBODY_B is 0-based for channels 1..12 (reference's
        # Blackbody_LUT is 1-based with a dummy slot 0, indexed [i+1]
        # at msgndataset.cpp:632 — same channel, different base).
        if mode == "RAD" and not (ch <= 2 or _BLACKBODY_B[ch] != 0):
            continue
        dt = np.uint16 if mode == "VISIR" else np.float64
        arr = np.full((lines, columns), nodata, dt)
        data_length = visir_bpl + SUB_VISIRLINE_SIZE
        for y in range(lines):
            off = (f_data_offset + interline * y +
                   (band_in_file - 1) * visir_packet +
                   (visir_packet - data_length))
            rec = data[off:off + data_length]
            if len(rec) < data_length:
                raise ValueError("MSGN Scanline corrupt.")
            line_no = struct.unpack(">i", rec[13:17])[0]
            validity = rec[24]
            if line_no - line_start != y:
                raise ValueError("MSGN Scanline corrupt.")
            vals = _unpack10(rec[SUB_VISIRLINE_SIZE:], n_samples)
            row = np.full(columns, nodata, dt)
            if mode == "VISIR":
                samp = vals
            else:
                slope, offset = calib[ch]
                samp = vals.astype(np.float64) * slope + offset
            if validity == 1:
                # mirrored: sample c -> column width-1-c
                n = min(n_samples, columns)
                row[columns - 1 - np.arange(n)] = samp[:n]
            arr[y] = row
        out_channels.append((ch + 1, arr))

    pixel_gsd_x = 1000.0 * col_step
    pixel_gsd_y = 1000.0 * line_step
    origin_x = -pixel_gsd_x * (-(NLINES / 2.0) + col_start - 1)
    origin_y = -pixel_gsd_y * ((NLINES / 2.0) - line_start + 1.5)
    gt = (origin_x, -pixel_gsd_x, 0.0, origin_y, 0.0, pixel_gsd_y)

    md = {"Radiometric parameters format": "offset slope",
          "Origin": f"{line_start} {col_start}",
          "SSP_LONGITUDE": ssp_lon, "SHAPE": shape}
    for ch, _ in out_channels:
        slope, offset = calib[ch - 1]
        md[f"ch{ch:02d}_cal"] = f"{offset:.12e} {slope:.12e}"
    if len(snit) >= 12:
        md["Date/Time"] = (f"{snit[0:4]}{snit[4:6]}{snit[6:8]}/"
                           f"{snit[8:10]}:{snit[10:12]}")

    chans = [c for c, _ in out_channels]
    arrs = [a for _, a in out_channels]
    px = arrs[0] if len(arrs) == 1 else np.stack(arrs, axis=2)
    return {"pixels": px, "gt": gt, "epsg": None, "driver": "MSGN",
            "channels": chans, "metadata": md, "mode": mode}


# ------------------------------------------------------------------ writer
def write_msgn(channels: dict[int, np.ndarray],
               calibration: dict[int, tuple[float, float]] | None = None,
               line_start: int = 1, col_start: int = 1) -> bytes:
    """Synthesize a whole-disk VISIR MSG native product (tests)."""
    chans = sorted(channels)
    lines, columns = channels[chans[0]].shape
    band_ids = "".join("X" if (i + 1) in chans else "-"
                       for i in range(NUM_CHANNELS))
    bpl = -(-columns * 10 // 8)
    packet_length = bpl + GP_PK_SH1_SIZE + SUB_VISIRLINE_SIZE - 1
    pkt_size = packet_length + GP_PK_HEADER_SIZE + 1

    def ph(name, value):
        return (f"{name:<28s}: ".encode("latin-1")[:30].ljust(30) +
                f"{value}".encode("latin-1")[:50].ljust(50))

    def phid(name, size, addr):
        return (f"{name:<28s}: ".encode("latin-1")[:30].ljust(30) +
                f"{size:>15d} ".encode()[:16].ljust(16) +
                f"{addr:>15d} ".encode()[:16].ljust(16))

    header_block_size = (RADIOMETRIC_OFFSET +
                         GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1 + 264)
    f_header_offset = MAIN_HEADER_SIZE + SEC_HEADER_SIZE
    f_data_offset = f_header_offset + header_block_size
    data_size = pkt_size * len(chans) * lines

    main = b"".join([
        ph("FormatName", "NATIVE"),
        ph("FormatDocumentName", "MSG native format"),
        ph("FormatDocumentMajorVersion", "1"),
        ph("FormatDocumentMinorVersion", "5"),
        ph("CreationDateTime", "20260101000000"),
        ph("CreatingCentre", "SYN"),
        phid("15Header", header_block_size, f_header_offset),
        phid("15Data", data_size, f_data_offset),
        phid("15Trailer", 0, f_data_offset + data_size),
        phid("GTS", 0, 0),
        phid("SpacecraftSitu", 0, 0),
        b" " * 1364,
        ph("TotalFileSize", str(f_data_offset + data_size)),
        ph("GORT", "x"), ph("ASTI", "x"), ph("LLOS", "x"),
        ph("SNIT", "202601011230.000"),
        ph("AIID", "x"), ph("SSBT", "x"), ph("SSST", "x"),
        ph("RRCC", "x"), ph("RRBT", "x"), ph("RRST", "x"),
        ph("PPRC", "x"), ph("PPDT", "x"), ph("GPLV", "x"),
        ph("APNM", "x"), ph("AARF", "x"), ph("UUDT", "x"),
        ph("QQOV", "x"), ph("UDSP", "x"),
    ])
    assert len(main) == MAIN_HEADER_SIZE
    sec = b"".join([
        ph("ABID", "x"), ph("SMOD", "x"), ph("APXS", "x"), ph("AVPA", "x"),
        ph("LSCD", "x"), ph("LMAP", "x"), ph("QDLC", "x"), ph("QDLP", "x"),
        ph("QQAI", "x"),
        ph("SelectedBandIDs", band_ids),
        ph("SouthLineSelectedRectangle", str(line_start)),
        ph("NorthLineSelectedRectangle", str(line_start + lines - 1)),
        ph("EastColumnSelectedRectangle", str(col_start)),
        ph("WestColumnSelectedRectangle", str(col_start + columns - 1)),
    ])
    assert len(sec) == SEC_HEADER_SIZE

    hdr_block = bytearray(header_block_size)
    idr_off = (RADIOMETRIC_OFFSET - 101 +
               GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1)
    n_raw_cols = (bpl * 8) // 10
    idr = bytearray(87)
    idr[0] = 1
    struct.pack_into(">f", idr, 1, 0.0)
    struct.pack_into(">iiffB", idr, 5, 3712, 3712, 3.0, 3.0, 2)
    struct.pack_into(">iiffB", idr, 22, 11136, 11136, 1.0, 1.0, 2)
    struct.pack_into(">4i", idr, 39, 1, lines, 1, n_raw_cols)
    hdr_block[idr_off:idr_off + 87] = idr
    rad_off = (RADIOMETRIC_OFFSET +
               GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1)
    calibration = calibration or {}
    for ch in range(1, 13):
        slope, offset = calibration.get(ch, (0.02, -1.0))
        struct.pack_into(">dd", hdr_block,
                         rad_off + 72 + (ch - 1) * 16, slope, offset)

    body = bytearray()
    for y in range(lines):
        for ch in chans:
            pk = bytearray(pkt_size)
            struct.pack_into(">I", pk, 14, packet_length)
            sub_off = GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE
            struct.pack_into(">i", pk, sub_off + 13, line_start + y)
            pk[sub_off + 17] = ch       # channelId
            pk[sub_off + 24] = 1        # lineValidity
            samp = channels[ch][y]
            # mirrored storage
            vals = samp[::-1].astype(np.uint16)
            packed = _pack10(vals)
            pk[sub_off + SUB_VISIRLINE_SIZE:
               sub_off + SUB_VISIRLINE_SIZE + len(packed)] = packed
            body += pk
    return main + sec + bytes(hdr_block) + bytes(body)
