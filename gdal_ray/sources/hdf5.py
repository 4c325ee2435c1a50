"""Pure-Python HDF5 reader (the reference's frmts/hdf5 driver surface).

Implements the subset of the public HDF5 file format spec the
reference's HDF5/HDF5Image drivers exercise on their own autotest
fixtures (frmts/hdf5/hdf5dataset.cpp, hdf5imagedataset.cpp):

- superblock v0/v1 and v2/v3, with the signature search at offsets
  0, 512, 1024, ... (gdal_pam-style userblock handling);
- v1 object headers (8-byte aligned messages + continuations) and v2
  "OHDR" headers with "OCHK" continuation blocks;
- old-style groups (symbol-table message -> v1 B-tree over SNOD
  nodes + local heap) and new-style compact groups (link messages);
  soft/hard links with cycle protection like the driver's visited set
  (autotest hdf5.py::test_hdf5_recursive_groups);
- datatypes: fixed-point (LE/BE, signed/unsigned), IEEE float
  16/32/64, fixed and variable-length strings (global heap), compound
  (incl. the complex {r,i} pairs of autotest complex.h5), array,
  enum, reference (opaque);
- dataspace v1/v2, fill value v1/v2/v3, data layouts: compact,
  contiguous, chunked v3 (v1 B-tree index) and chunked v4
  (single-chunk / implicit / fixed-array indexes);
- filters: deflate, shuffle, fletcher32.

Arrays come back as numpy arrays; group/dataset attributes follow the
reference's GetMetadata() flattening (path components joined with
"_", spaces mapped to "_" -- hdf5dataset.cpp CreateMetadata).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF

HDF5_SIGNATURE = b"\x89HDF\r\n\x1a\n"


def _find_superblock(buf: bytes) -> int:
    off = 0
    while off + 8 <= len(buf):
        if buf[off:off + 8] == HDF5_SIGNATURE:
            return off
        off = 512 if off == 0 else off * 2
    raise ValueError("not an HDF5 file")


class _Type:
    """Parsed datatype message."""

    def __init__(self, cls, size, dtype=None, members=None, base=None,
                 is_vlen_str=False, dims=None):
        self.cls = cls          # HDF5 class number
        self.size = size        # on-disk element size
        self.dtype = dtype      # numpy dtype for simple types
        self.members = members  # [(name, offset, _Type)] for compound
        self.base = base        # base type for vlen/array/enum
        self.is_vlen_str = is_vlen_str
        self.dims = dims        # for array class


class H5Dataset:
    def __init__(self, f, name, path, shape, htype, layout, filters,
                 fillvalue, attrs, maxshape=None):
        self._f = f
        self.name = name
        self.path = path
        self.shape = shape
        self.htype = htype
        self._layout = layout
        self._filters = filters
        self.fillvalue = fillvalue
        self.attrs = attrs

    @property
    def dtype(self):
        return self.htype.dtype

    def read(self) -> np.ndarray:
        return self._f._read_data(self)


class H5Group:
    def __init__(self, name, path):
        self.name = name
        self.path = path
        self.attrs: dict = {}
        self.children: dict[str, object] = {}

    def walk_datasets(self):
        """DFS in insertion (alphabetical-by-btree) order."""
        for child in self.children.values():
            if isinstance(child, H5Dataset):
                yield child
            else:
                yield from child.walk_datasets()

    def __getitem__(self, path: str):
        """Resolve a path; underscores match spaces like the
        reference's subdataset names (autotest uses Data_Fields for
        the 'Data Fields' HDF-EOS group)."""
        node = self
        for part in path.strip("/").split("/"):
            if not part:
                continue
            if part in node.children:
                node = node.children[part]
                continue
            for cname, child in node.children.items():
                if cname.replace(" ", "_") == part.replace(" ", "_"):
                    node = child
                    break
            else:
                raise KeyError(part)
        return node


class HDF5File:
    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, bytes):
            self.buf = path_or_bytes
        else:
            with open(path_or_bytes, "rb") as fh:
                self.buf = fh.read()
            # hdf5dataset.cpp:405: a name ending in 0.h5/0.hdf5 may be
            # the first member of a 'family' split file -- concatenate
            # the numbered siblings.
            import os
            base = str(path_or_bytes)
            for suffix in ("0.h5", "0.hdf5"):
                if base.endswith(suffix):
                    parts = [self.buf]
                    i = 1
                    while True:
                        member = base[:-len(suffix)] + str(i) + suffix[1:]
                        if not os.path.exists(member):
                            break
                        with open(member, "rb") as fh:
                            parts.append(fh.read())
                        i += 1
                    if len(parts) > 1:
                        self.buf = b"".join(parts)
                    break
        self.base = _find_superblock(self.buf)
        self._parse_superblock()
        self._visited: set[int] = set()
        self.root = H5Group("", "/")
        self._read_object_header(self.root_addr, self.root)

    # -------------------------------------------------- low-level utils
    def _u(self, off, n):
        return int.from_bytes(self.buf[off:off + n], "little")

    def _offset(self, off):
        return self._u(off, self.sz_off)

    def _length(self, off):
        return self._u(off, self.sz_len)

    def _at(self, addr):
        """File address -> absolute buffer offset."""
        return self.base + addr

    # -------------------------------------------------- superblock
    def _parse_superblock(self):
        p = self.base + 8
        ver = self.buf[p]
        if ver in (0, 1):
            self.sz_off = self.buf[p + 5]
            self.sz_len = self.buf[p + 6]
            q = p + 8
            q += 4  # group leaf k, internal k
            q += 4  # consistency flags
            if ver == 1:
                q += 4  # indexed storage k + reserved
            q += self.sz_off * 4  # base, free-space, eof, driver info
            # root group symbol table entry
            ste = self._read_ste(q)
            self.root_addr = ste[1]
        elif ver in (2, 3):
            self.sz_off = self.buf[p + 1]
            self.sz_len = self.buf[p + 2]
            q = p + 4
            q += self.sz_off * 3  # base, ext, eof
            self.root_addr = self._offset(q)
        else:
            raise ValueError(f"unsupported superblock v{ver}")

    def _read_ste(self, q):
        """Symbol table entry -> (name_off, objhdr_addr, cache_type,
        scratch_offset)."""
        name_off = self._length(q)
        q += self.sz_off
        hdr = self._offset(q)
        q += self.sz_off
        cache = self._u(q, 4)
        q += 8
        scratch = q
        return (name_off, hdr, cache, scratch)

    # -------------------------------------------------- object headers
    def _read_object_header(self, addr, node):
        if addr in self._visited:
            return
        self._visited.add(addr)
        msgs = []
        p = self._at(addr)
        if self.buf[p:p + 4] == b"OHDR":
            self._read_ohdr_v2(p, msgs)
        else:
            self._read_ohdr_v1(p, msgs)
        self._apply_messages(msgs, node)
        self._visited.discard(addr)

    def _read_ohdr_v1(self, p, msgs):
        nmsg = self._u(p + 2, 2)
        hsize = self._u(p + 8, 4)
        blocks = [(p + 16, hsize)]
        got = 0
        while blocks and got < nmsg:
            q, size = blocks.pop(0)
            end = q + size
            while q + 8 <= end and got < nmsg:
                mtype = self._u(q, 2)
                msize = self._u(q + 2, 2)
                body = q + 8
                got += 1
                if mtype == 0x10:  # continuation
                    cont = self._offset(body)
                    clen = self._length(body + self.sz_off)
                    blocks.append((self._at(cont), clen))
                elif mtype:
                    msgs.append((mtype, body, msize))
                q = body + msize
                q += (-q) % 8 if False else 0  # v1 sizes include padding

    def _read_ohdr_v2(self, p, msgs):
        flags = self.buf[p + 5]
        q = p + 6
        if flags & 0x20:
            q += 16  # times
        if flags & 0x10:
            q += 4  # max compact / min dense
        csize_len = 1 << (flags & 0x3)
        chunk0 = self._u(q, csize_len)
        q += csize_len
        track_order = bool(flags & 0x4)
        blocks = [(q, chunk0)]
        while blocks:
            q, size = blocks.pop(0)
            end = q + size
            while q + 4 <= end:
                mtype = self.buf[q]
                msize = self._u(q + 1, 2)
                mflags = self.buf[q + 3]
                q += 4
                if track_order:
                    q += 2
                body = q
                if mtype == 0x10:
                    cont = self._offset(body)
                    clen = self._length(body + self.sz_off)
                    # OCHK block: signature + payload + checksum
                    blocks.append((self._at(cont) + 4, clen - 8))
                elif mtype:
                    msgs.append((mtype, body, msize))
                q = body + msize

    # -------------------------------------------------- messages
    def _apply_messages(self, msgs, node):
        dataspace = htype = layout = None
        filters = []
        fillvalue = None
        attrs = {}
        stab = None
        links = []
        for mtype, body, msize in msgs:
            if mtype == 0x0001:
                dataspace = self._parse_dataspace(body)
            elif mtype == 0x0003:
                htype = self._parse_datatype(body)[0]
            elif mtype == 0x0005:
                fillvalue = self._parse_fillvalue(body)
            elif mtype == 0x0008:
                layout = self._parse_layout(body)
            elif mtype == 0x000B:
                filters = self._parse_filters(body)
            elif mtype == 0x000C:
                name, val = self._parse_attribute(body)
                attrs[name] = val
            elif mtype == 0x0011:
                stab = (self._offset(body),
                        self._offset(body + self.sz_off))
            elif mtype == 0x0006:
                lk = self._parse_link(body)
                if lk:
                    links.append(lk)

        if isinstance(node, H5Group):
            node.attrs.update(attrs)
            if stab is not None:
                self._walk_symbol_table(node, *stab)
            for lname, laddr in links:
                self._add_child(node, lname, laddr)
        else:
            # H5Dataset placeholder dict filled by caller
            node["dataspace"] = dataspace
            node["htype"] = htype
            node["layout"] = layout
            node["filters"] = filters
            node["fillvalue"] = fillvalue
            node["attrs"] = attrs

    def _probe_is_group(self, addr) -> bool:
        msgs = []
        p = self._at(addr)
        if self.buf[p:p + 4] == b"OHDR":
            self._read_ohdr_v2(p, msgs)
        else:
            self._read_ohdr_v1(p, msgs)
        types = {m[0] for m in msgs}
        return 0x0011 in types or 0x0006 in types or 0x0002 in types \
            or not (0x0008 in types or 0x0003 in types)

    def _add_child(self, group, name, addr):
        if addr in self._visited:
            return
        path = group.path.rstrip("/") + "/" + name
        if self._probe_is_group(addr):
            child = H5Group(name, path)
            group.children[name] = child
            self._read_object_header(addr, child)
        else:
            slot: dict = {}
            self._visited.add(addr)
            msgs = []
            p = self._at(addr)
            if self.buf[p:p + 4] == b"OHDR":
                self._read_ohdr_v2(p, msgs)
            else:
                self._read_ohdr_v1(p, msgs)
            self._apply_messages(msgs, slot)
            self._visited.discard(addr)
            if slot.get("dataspace") is None or slot.get("htype") is None:
                return
            ds = H5Dataset(self, name, path, slot["dataspace"][0],
                           slot["htype"], slot["layout"], slot["filters"],
                           slot["fillvalue"], slot["attrs"])
            group.children[name] = ds

    # -------------------------------------------------- old-style groups
    def _walk_symbol_table(self, group, btree_addr, heap_addr):
        heap_data = self._local_heap(heap_addr)
        entries = []
        self._walk_group_btree(btree_addr, heap_data, entries)
        for name, hdr, cache, scratch in entries:
            if cache == 2:  # soft link; target path in heap
                continue
            if hdr == UNDEF:
                continue
            self._add_child(group, name, hdr)

    def _local_heap(self, addr):
        p = self._at(addr)
        if self.buf[p:p + 4] != b"HEAP":
            raise ValueError("bad local heap")
        data_addr = self._offset(p + 8 + 2 * self.sz_len)
        return self._at(data_addr)

    def _heap_name(self, heap_data, off) -> str:
        end = self.buf.index(b"\x00", heap_data + off)
        return self.buf[heap_data + off:end].decode("utf-8", "replace")

    def _walk_group_btree(self, addr, heap_data, out):
        p = self._at(addr)
        sig = self.buf[p:p + 4]
        if sig == b"SNOD":
            count = self._u(p + 6, 2)
            q = p + 8
            for _ in range(count):
                name_off, hdr, cache, scratch = self._read_ste(q)
                q += 2 * self.sz_off + 8 + 16
                out.append((self._heap_name(heap_data, name_off), hdr,
                            cache, scratch))
            return
        if sig != b"TREE":
            raise ValueError("bad group b-tree")
        entries = self._u(p + 6, 2)
        q = p + 8 + 2 * self.sz_off  # skip siblings
        q += self.sz_len  # key 0
        for _ in range(entries):
            child = self._offset(q)
            q += self.sz_off + self.sz_len
            self._walk_group_btree(child, heap_data, out)

    # -------------------------------------------------- links (v2 groups)
    def _parse_link(self, body):
        ver = self.buf[body]
        flags = self.buf[body + 1]
        q = body + 2
        ltype = 0
        if flags & 0x8:
            ltype = self.buf[q]
            q += 1
        if flags & 0x4:
            q += 8  # creation order
        if flags & 0x10:
            q += 1  # charset
        nlen_sz = 1 << (flags & 0x3)
        nlen = self._u(q, nlen_sz)
        q += nlen_sz
        name = self.buf[q:q + nlen].decode("utf-8", "replace")
        q += nlen
        if ltype == 0:  # hard
            return (name, self._offset(q))
        return None  # soft/external links ignored (cycle-safe)

    # -------------------------------------------------- dataspace
    def _parse_dataspace(self, body):
        ver = self.buf[body]
        rank = self.buf[body + 1]
        flags = self.buf[body + 2]
        if ver == 1:
            q = body + 8
        else:
            q = body + 4
        dims = tuple(self._length(q + i * self.sz_len)
                     for i in range(rank))
        return (dims, flags)

    # -------------------------------------------------- datatype
    def _parse_datatype(self, body):
        b0 = self.buf[body]
        cls = b0 & 0x0F
        bits = self._u(body + 1, 3)
        size = self._u(body + 4, 4)
        q = body + 8
        if cls == 0:  # fixed-point
            order = ">" if bits & 1 else "<"
            signed = bool(bits & 0x8)
            code = {1: "b", 2: "h", 4: "i", 8: "q"}.get(size)
            if code is None:
                return _Type(cls, size, np.dtype("V%d" % size)), q + 4
            if not signed:
                code = code.upper()
            return _Type(cls, size, np.dtype(order + code)), q + 4
        if cls == 1:  # float
            order = ">" if bits & 1 else "<"
            code = {2: "f2", 4: "f4", 8: "f8"}.get(size, "f8")
            return _Type(cls, size, np.dtype(order + code)), q + 12
        if cls == 2:  # time
            return _Type(cls, size, np.dtype("<u%d" % size)), q + 2
        if cls == 3:  # string (fixed length)
            return _Type(cls, size, np.dtype("S%d" % size)), q
        if cls == 4:  # bitfield
            return _Type(cls, size, np.dtype("<u%d" % size)), q + 4
        if cls == 5:  # opaque
            tag_len = bits & 0xFFFF
            return _Type(cls, size, np.dtype("V%d" % size)), q + tag_len
        if cls == 6:  # compound
            ver = (b0 >> 4) & 0x0F
            nmembers = bits & 0xFFFF
            members = []
            for _ in range(nmembers):
                if ver == 1:
                    end = self.buf.index(b"\x00", q)
                    name = self.buf[q:end].decode()
                    q += ((end - q) // 8 + 1) * 8
                    off = self._u(q, 4)
                    q += 4 + 1 + 3 + 4 + 4 + 16
                    mt, q = self._parse_datatype(q)
                elif ver == 2:
                    end = self.buf.index(b"\x00", q)
                    name = self.buf[q:end].decode()
                    q += ((end - q) // 8 + 1) * 8
                    off = self._u(q, 4)
                    q += 4
                    mt, q = self._parse_datatype(q)
                else:
                    end = self.buf.index(b"\x00", q)
                    name = self.buf[q:end].decode()
                    q = end + 1
                    nb = max(1, (max(size - 1, 1).bit_length() + 7) // 8)
                    off = self._u(q, nb)
                    q += nb
                    mt, q = self._parse_datatype(q)
                members.append((name, off, mt))
            fields = {}
            for name, off, mt in members:
                fields[name] = (mt.dtype, off)
            try:
                dt = np.dtype({"names": [m[0] for m in members],
                               "formats": [m[2].dtype for m in members],
                               "offsets": [m[1] for m in members],
                               "itemsize": size})
            except Exception:
                dt = np.dtype("V%d" % size)
            return _Type(cls, size, dt, members=members), q
        if cls == 7:  # reference
            return _Type(cls, size, np.dtype("V%d" % size)), q
        if cls == 8:  # enum
            base, q2 = self._parse_datatype(q)
            return _Type(cls, size, base.dtype, base=base), q2
        if cls == 9:  # vlen
            vtype = bits & 0x0F
            base, q2 = self._parse_datatype(q)
            return _Type(cls, size, np.dtype(object), base=base,
                         is_vlen_str=(vtype == 1)), q2
        if cls == 10:  # array
            ver = (b0 >> 4) & 0x0F
            rank = self.buf[q]
            q += 1
            if ver < 3:
                q += 3
            dims = tuple(self._u(q + 4 * i, 4) for i in range(rank))
            q += 4 * rank
            if ver < 3:
                q += 4 * rank  # permutation
            base, q2 = self._parse_datatype(q)
            return _Type(cls, size, base.dtype, base=base, dims=dims), q2
        return _Type(cls, size, np.dtype("V%d" % max(size, 1))), q

    # -------------------------------------------------- fill value
    def _parse_fillvalue(self, body):
        ver = self.buf[body]
        if ver in (1, 2):
            defined = self.buf[body + 3]
            if ver == 1 or defined:
                sz = self._u(body + 4, 4)
                return self.buf[body + 8:body + 8 + sz]
            return None
        flags = self.buf[body + 1]
        if flags & 0x20:
            sz = self._u(body + 2, 4)
            return self.buf[body + 6:body + 6 + sz]
        return None

    # -------------------------------------------------- layout
    def _parse_layout(self, body):
        ver = self.buf[body]
        if ver == 3:
            cls = self.buf[body + 1]
            q = body + 2
            if cls == 0:  # compact
                sz = self._u(q, 2)
                return ("compact", q + 2, sz)
            if cls == 1:  # contiguous
                addr = self._offset(q)
                size = self._length(q + self.sz_off)
                return ("contiguous", addr, size)
            ndim = self.buf[q]
            q += 1
            addr = self._offset(q)
            q += self.sz_off
            dims = tuple(self._u(q + 4 * i, 4) for i in range(ndim))
            return ("chunked1", addr, dims[:-1], dims[-1])
        if ver == 4:
            cls = self.buf[body + 1]
            q = body + 2
            if cls == 0:
                sz = self._u(q, 2)
                return ("compact", q + 2, sz)
            if cls == 1:
                addr = self._offset(q)
                size = self._length(q + self.sz_off)
                return ("contiguous", addr, size)
            if cls == 2:
                flags = self.buf[q]
                q += 1
                ndim = self.buf[q]
                q += 1
                enc = self.buf[q]
                q += 1
                dims = tuple(self._u(q + enc * i, enc)
                             for i in range(ndim))
                q += enc * ndim
                itype = self.buf[q]
                q += 1
                if itype == 1:  # single chunk
                    if flags & 0x2:
                        fsize = self._length(q)
                        q += self.sz_len + 4
                    addr = self._offset(q)
                    if flags & 0x2:
                        return ("single_chunk", addr, dims[:-1], dims[-1],
                                fsize)
                    return ("single_chunk", addr, dims[:-1], dims[-1],
                            None)
                if itype == 2:  # implicit
                    addr = self._offset(q)
                    return ("implicit", addr, dims[:-1], dims[-1])
                if itype == 3:  # fixed array
                    q += 1  # page bits
                    addr = self._offset(q)
                    return ("fixed_array", addr, dims[:-1], dims[-1])
                raise ValueError(f"chunk index type {itype} unsupported")
        # v1/v2
        rank = self.buf[body + 1]
        cls = self.buf[body + 2]
        q = body + 8
        if cls in (1, 2):
            addr = self._offset(q)
            q += self.sz_off
        dims = tuple(self._u(q + 4 * i, 4) for i in range(rank))
        q += 4 * rank
        if cls == 2:
            esize = self._u(q, 4)
            return ("chunked1", addr, dims[:-1], dims[-1])
        if cls == 1:
            return ("contiguous", addr, None)
        sz = self._u(q, 4)
        return ("compact", q + 4, sz)

    # -------------------------------------------------- filters
    def _parse_filters(self, body):
        ver = self.buf[body]
        nf = self.buf[body + 1]
        q = body + 8 if ver == 1 else body + 2
        out = []
        for _ in range(nf):
            fid = self._u(q, 2)
            q += 2
            if ver == 1 or fid >= 256:
                nlen = self._u(q, 2)
                q += 2
            else:
                nlen = 0
            q += 2  # flags
            ncd = self._u(q, 2)
            q += 2
            if nlen:
                if ver == 1:
                    nlen = ((nlen + 7) // 8) * 8
                q += nlen
            cd = [self._u(q + 4 * i, 4) for i in range(ncd)]
            q += 4 * ncd
            if ver == 1 and ncd % 2:
                q += 4
            out.append((fid, cd))
        return out

    # -------------------------------------------------- attributes
    def _parse_attribute(self, body):
        ver = self.buf[body]
        if ver == 1:
            nsize = self._u(body + 2, 2)
            dtsize = self._u(body + 4, 2)
            dssize = self._u(body + 6, 2)
            q = body + 8
            name = self.buf[q:q + nsize].split(b"\x00")[0].decode(
                "utf-8", "replace")
            q += ((nsize + 7) // 8) * 8
            htype, _ = self._parse_datatype(q)
            q += ((dtsize + 7) // 8) * 8
            dims, _ = self._parse_dataspace(q)
            q += ((dssize + 7) // 8) * 8
        else:
            nsize = self._u(body + 2, 2)
            dtsize = self._u(body + 4, 2)
            dssize = self._u(body + 6, 2)
            q = body + 8
            if ver == 3:
                q += 1  # name charset
            name = self.buf[q:q + nsize].split(b"\x00")[0].decode(
                "utf-8", "replace")
            q += nsize
            htype, _ = self._parse_datatype(q)
            q += dtsize
            dims, _ = self._parse_dataspace(q)
            q += dssize
        val = self._decode_values(q, dims, htype)
        return name, val

    def _decode_values(self, q, dims, htype):
        n = int(np.prod(dims)) if dims else 1
        if htype.cls == 9:  # vlen
            vals = []
            step = 4 + self.sz_off + 4
            for i in range(n):
                p = q + i * step
                ln = self._u(p, 4)
                gaddr = self._offset(p + 4)
                gidx = self._u(p + 4 + self.sz_off, 4)
                if gaddr in (0, UNDEF) or gidx == 0:
                    vals.append("" if htype.is_vlen_str else
                                np.empty(0, htype.base.dtype
                                         if htype.base else np.uint8))
                    continue
                try:
                    data = self._global_heap_object(gaddr, gidx)
                except (ValueError, KeyError):
                    vals.append("" if htype.is_vlen_str else
                                np.empty(0, htype.base.dtype
                                         if htype.base else np.uint8))
                    continue
                if htype.is_vlen_str:
                    vals.append(data.split(b"\x00")[0].decode(
                        "utf-8", "replace"))
                else:
                    base = htype.base
                    vals.append(np.frombuffer(
                        data, dtype=base.dtype,
                        count=len(data) // base.size))
            return vals[0] if not dims or n == 1 else vals
        if htype.cls == 3:
            raw = self.buf[q:q + htype.size * n]
            arr = [raw[i * htype.size:(i + 1) * htype.size]
                   .split(b"\x00")[0].decode("utf-8", "replace")
                   for i in range(n)]
            return arr[0] if not dims or n == 1 else arr
        arr = np.frombuffer(self.buf, dtype=htype.dtype, count=n,
                            offset=q)
        if htype.cls == 1 and htype.size == 2:
            arr = arr.astype(np.float32)
        if not dims or n == 1:
            return arr[0]
        return arr.copy()

    def _global_heap_object(self, collection_addr, index):
        p = self._at(collection_addr)
        if self.buf[p:p + 4] != b"GCOL":
            raise ValueError("bad global heap")
        size = self._length(p + 8)
        end = p + size
        q = p + 8 + self.sz_len
        while q + 8 + self.sz_len <= end:
            idx = self._u(q, 2)
            osize = self._length(q + 8)
            data_start = q + 8 + self.sz_len
            if idx == 0:
                break
            if idx == index:
                return self.buf[data_start:data_start + osize]
            step = 8 + self.sz_len + ((osize + 7) // 8) * 8
            q += step
        raise KeyError(f"global heap object {index}")

    # -------------------------------------------------- data reading
    def _apply_filters(self, raw, filters, elem_size):
        for fid, cd in reversed(filters):
            if fid == 1:
                raw = zlib.decompress(raw)
            elif fid == 2:
                esz = cd[0] if cd else elem_size
                n = len(raw) // esz
                arr = np.frombuffer(raw, np.uint8)
                arr = arr[:n * esz].reshape(esz, n).T
                raw = arr.tobytes()
            elif fid == 3:
                raw = raw[:-4]
            else:
                raise ValueError(f"filter {fid} unsupported")
        return raw

    def _read_data(self, ds: H5Dataset) -> np.ndarray:
        shape = ds.shape
        htype = ds.htype
        n = int(np.prod(shape)) if shape else 1
        kind = ds._layout[0] if ds._layout else "contiguous"
        if kind == "compact":
            _, off, sz = ds._layout
            raw = self.buf[off:off + sz]
            return self._finish(raw, shape, htype)
        if kind == "contiguous":
            _, addr, _sz = ds._layout
            if addr == UNDEF:
                return self._fill_array(ds, shape, htype)
            off = self._at(addr)
            raw = self.buf[off:off + n * htype.size]
            return self._finish(raw, shape, htype)
        # chunked
        if kind == "chunked1":
            _, btree, chunk_dims, esize = ds._layout
            chunks = []
            if btree != UNDEF:
                # keys carry rank+1 64-bit offsets (the trailing
                # element-size dimension is always 0)
                self._walk_chunk_btree(btree, len(chunk_dims) + 1,
                                       chunks)
        elif kind == "single_chunk":
            _, addr, chunk_dims, esize, fsize = ds._layout
            chunks = [] if addr == UNDEF else [
                ((0,) * len(chunk_dims), addr,
                 fsize if fsize is not None else
                 int(np.prod(chunk_dims)) * esize)]
        elif kind == "implicit":
            _, addr, chunk_dims, esize = ds._layout
            chunks = []
            if addr != UNDEF:
                csize = int(np.prod(chunk_dims)) * esize
                grid = [int(-(-shape[i] // chunk_dims[i]))
                        for i in range(len(shape))]
                idx = 0
                for coord in np.ndindex(*grid):
                    off_coord = tuple(coord[i] * chunk_dims[i]
                                      for i in range(len(coord)))
                    chunks.append((off_coord, addr + idx * csize, csize))
                    idx += 1
        elif kind == "fixed_array":
            _, addr, chunk_dims, esize = ds._layout
            chunks = self._fixed_array_chunks(addr, shape, chunk_dims,
                                              esize, ds._filters)
        else:
            raise ValueError(kind)
        out = self._fill_array(ds, shape, htype)
        rank = len(shape)
        for coord, addr, nbytes in chunks:
            off = self._at(addr)
            raw = self.buf[off:off + nbytes]
            raw = self._apply_filters(raw, ds._filters, htype.size)
            carr = np.frombuffer(raw, dtype=htype.dtype,
                                 count=int(np.prod(chunk_dims)))
            carr = carr.reshape(chunk_dims)
            sel_dst = []
            sel_src = []
            for i in range(rank):
                start = coord[i]
                stop = min(start + chunk_dims[i], shape[i])
                sel_dst.append(slice(start, stop))
                sel_src.append(slice(0, stop - start))
            out[tuple(sel_dst)] = carr[tuple(sel_src)]
        if htype.cls == 1 and htype.size == 2:
            out = out.astype(np.float32)
        return out

    def _fill_array(self, ds, shape, htype):
        out = np.zeros(shape, dtype=htype.dtype)
        if ds.fillvalue:
            try:
                fv = np.frombuffer(ds.fillvalue, dtype=htype.dtype,
                                   count=1)[0]
                out[...] = fv
            except Exception:
                pass
        return out

    def _finish(self, raw, shape, htype):
        n = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(raw, dtype=htype.dtype, count=n)
        arr = arr.reshape(shape).copy()
        if htype.cls == 1 and htype.size == 2:
            arr = arr.astype(np.float32)
        return arr

    def _walk_chunk_btree(self, addr, nkey_dims, out):
        p = self._at(addr)
        if self.buf[p:p + 4] != b"TREE":
            raise ValueError("bad chunk b-tree")
        level = self.buf[p + 5]
        entries = self._u(p + 6, 2)
        q = p + 8 + 2 * self.sz_off
        key_size = 8 + 8 * nkey_dims
        for _ in range(entries):
            nbytes = self._u(q, 4)
            coord = tuple(self._u(q + 8 + 8 * i, 8)
                          for i in range(nkey_dims - 1))
            q += key_size
            child = self._offset(q)
            q += self.sz_off
            if level == 0:
                out.append((coord, child, nbytes))
            else:
                self._walk_chunk_btree(child, nkey_dims, out)

    def _fixed_array_chunks(self, addr, shape, chunk_dims, esize,
                            filters):
        p = self._at(addr)
        if self.buf[p:p + 4] != b"FAHD":
            raise ValueError("bad fixed array header")
        entry_size = self.buf[p + 6]
        nelem = self._length(p + 8)
        dblk = self._offset(p + 8 + self.sz_len)
        chunks = []
        if dblk == UNDEF:
            return chunks
        d = self._at(dblk)
        if self.buf[d:d + 4] != b"FADB":
            raise ValueError("bad fixed array data block")
        q = d + 6 + self.sz_off
        npages = (nelem + 0) and 0
        # elements follow directly (no paging for small arrays)
        grid = [int(-(-shape[i] // chunk_dims[i]))
                for i in range(len(shape))]
        coords = list(np.ndindex(*grid))
        filtered = bool(filters)
        for i in range(int(nelem)):
            caddr = self._offset(q)
            q += self.sz_off
            if filtered:
                rest = entry_size - self.sz_off - 4
                csz = self._u(q, rest)
                q += rest + 4
            else:
                csz = int(np.prod(chunk_dims)) * esize
            if caddr != UNDEF and i < len(coords):
                off_coord = tuple(coords[i][j] * chunk_dims[j]
                                  for j in range(len(chunk_dims)))
                chunks.append((off_coord, caddr, csz))
        return chunks


# ------------------------------------------------------------------ API
def open_hdf5(path_or_bytes) -> H5Group:
    return HDF5File(path_or_bytes).root


def hdf5_subdatasets(path: str) -> list[str]:
    """GDAL-style subdataset names: HDF5:"path"://group/dset for every
    >=2D dataset (hdf5dataset.cpp CreateDSList semantics)."""
    root = open_hdf5(path)
    out = []
    for ds in root.walk_datasets():
        if len(ds.shape) >= 2 or (len(ds.shape) == 1 and ds.shape[0] > 1):
            out.append('HDF5:"%s":/%s' % (path, ds.path))
    return out


def read_hdf5_array(path: str, dataset_path: str) -> np.ndarray:
    f = HDF5File(path)
    node = f.root[dataset_path]
    if not isinstance(node, H5Dataset):
        raise ValueError(f"{dataset_path} is not a dataset")
    return node.read()


def _fmt_attr(v) -> str:
    """hdf5dataset.cpp renders int attrs with %d, float16/32 with
    %.8g, float64 with %.15g (lines 1056-1228)."""
    if isinstance(v, str):
        return v
    if isinstance(v, (list, np.ndarray)):
        return " ".join(_fmt_attr(x) for x in v)
    if isinstance(v, (int, np.integer)):
        return "%d" % int(v)
    if isinstance(v, (np.float16, np.float32)):
        return "%.8g" % float(v)
    if isinstance(v, (float, np.floating)):
        return "%.15g" % float(v)
    if isinstance(v, np.void):  # compound
        if v.dtype.names:
            return " ".join(_fmt_attr(v[name]) for name in v.dtype.names)
        return v.tobytes().hex()
    return str(v)


def csk_georef(path: str, subdataset: str) -> dict:
    """COSMO-SkyMed georeferencing (hdf5imagedataset.cpp
    CaptureCSKGeoTransform / CaptureCSKGCPs): L1C/L1D (GEC_/GTC_)
    products expose an affine geotransform from 'Top Left East-North'
    + spacings; L0/L1A/L1B (RAW_/SCS_/DGM_) expose the four corner
    GCPs with X=lon(coord[1]), Y=lat(coord[0]), Z=coord[2]."""
    f = HDF5File(path)
    ptype = str(f.root.attrs.get("Product Type", ""))
    node = f.root[subdataset]
    attrs = node.attrs if not isinstance(node, H5Group) else node.attrs
    parent = f.root
    for part in subdataset.strip("/").split("/")[:-1]:
        parent = parent.children[part]
    out: dict = {"product_type": ptype}
    if ptype.startswith(("GEC_", "GTC_")):
        ul = np.asarray(attrs["Top Left East-North"], np.float64)
        line_sp = float(attrs["Line Spacing"])
        col_sp = float(attrs["Column Spacing"])
        out["geotransform"] = (float(ul[0]), line_sp, 0.0,
                               float(ul[1]), 0.0, -col_sp)
    elif ptype.startswith(("RAW_", "SCS_", "DGM_")):
        shape = node.shape
        h, w = shape[0], shape[1]
        gcps = []
        for cname, px, ln in (
                ("Top Left Geodetic Coordinates", 0, 0),
                ("Top Right Geodetic Coordinates", w, 0),
                ("Bottom Left Geodetic Coordinates", 0, h),
                ("Bottom Right Geodetic Coordinates", w, h)):
            c = np.asarray(attrs[cname], np.float64)
            gcps.append({"pixel": float(px), "line": float(ln),
                         "x": float(c[1]), "y": float(c[0]),
                         "z": float(c[2])})
        out["gcps"] = gcps
    return out


def hdf5_band_metadata(ds: H5Dataset) -> dict:
    """netCDF-convention per-band info the reference reports via
    GetNoDataValue/GetOffset/GetScale (hdf5imagedataset.cpp)."""
    out = {}
    for key, name in (("_FillValue", "nodata"), ("add_offset", "offset"),
                      ("scale_factor", "scale")):
        if key in ds.attrs:
            try:
                out[name] = float(np.asarray(ds.attrs[key]).ravel()[0])
            except (TypeError, ValueError):
                pass
    return out


def parse_hdf5_path(spec: str) -> tuple[str, str | None]:
    """HDF5:"file"://dataset or HDF5:file://dataset -> (file, dataset)."""
    if not spec.startswith("HDF5:"):
        return spec, None
    rest = spec[5:]
    if rest.startswith('"'):
        end = rest.index('"', 1)
        fname = rest[1:end]
        rest = rest[end + 1:]
    else:
        cut = rest.find("://")
        fname, rest = rest[:cut], rest[cut:]
    ds = rest[3:] if rest.startswith("://") else rest.lstrip(":")
    return fname, ("/" + ds.lstrip("/")) if ds else None


def open_hdf5_raster(path: str, data: bytes | None = None) -> dict:
    """open_raster() branch for HDF5 payloads. A plain multi-dataset
    file raises with the subdataset list (like GDAL returning only
    SUBDATASETS metadata); HDF5:"f"://dset opens one array."""
    fname, dspath = parse_hdf5_path(path)
    # /vsimem/-style payloads come in as bytes; real paths go through
    # HDF5File so family-member concatenation works.
    if data is not None and fname.startswith("/vsi"):
        f = HDF5File(data)
    else:
        f = HDF5File(fname)
    if dspath is None:
        cands = [d for d in f.root.walk_datasets()
                 if len(d.shape) >= 2
                 or (len(d.shape) == 1 and d.shape[0] > 1)]
        if len(cands) != 1:
            names = ['HDF5:"%s":/%s' % (fname, d.path) for d in cands]
            raise ValueError(
                f"{fname}: {len(cands)} subdatasets; open one of "
                f"{names}")
        node = cands[0]
    else:
        node = f.root[dspath]
        if not isinstance(node, H5Dataset):
            raise ValueError(f"{dspath} is not a dataset")
    px = node.read()
    if px.dtype.names:  # compound {r,i} -> complex
        names = px.dtype.names
        if set(names) == {"r", "i"}:
            px = px["r"].astype(np.complex128) + 1j * \
                px["i"].astype(np.complex128)
    if px.ndim == 1:
        px = px.reshape(1, -1)
    elif px.ndim == 3:
        px = np.transpose(px, (1, 2, 0))  # [band][y][x] -> (y,x,b)
    out = {"pixels": px, "gt": None, "epsg": None, "driver": "HDF5",
           **hdf5_band_metadata(node)}
    if node.path.startswith("/BAG_root/"):
        out["pixels"] = np.flipud(px)  # BAG rows are south-up
        out["driver"] = "BAG"
        out.setdefault("nodata", 1000000.0)
    ptype = str(f.root.attrs.get("Product Type", ""))
    if ptype and node.path.count("/") >= 2:
        sub = node.path
        try:
            geo = csk_georef(fname, sub)
            if "geotransform" in geo:
                out["gt"] = geo["geotransform"]
            if "gcps" in geo:
                out["gcps"] = geo["gcps"]
                out["gcp_epsg"] = 4326
        except KeyError:
            pass
    return out


def hdf5_flat_metadata(path: str) -> dict[str, str]:
    """GetMetadata() flattening: path components + attribute name
    joined with '_', spaces replaced by '_'."""
    root = open_hdf5(path)
    out: dict[str, str] = {}

    def emit(prefix_parts, attrs):
        for aname, v in attrs.items():
            name = "_".join(prefix_parts + [aname]).replace(" ", "_")
            out[name] = _fmt_attr(v)

    def walk(node, parts):
        emit(parts, node.attrs)
        if isinstance(node, H5Group):
            for cname, child in node.children.items():
                walk(child, parts + [cname])

    walk(root, [])
    return out
