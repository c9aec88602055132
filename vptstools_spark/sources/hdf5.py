"""Minimal pure-Python HDF5 reader for ODIM VP files.

The container has no h5py (PyPI unreachable), but the reference's #1 user
path is real ``.h5`` bytes → VPTS CSV (reference: src/vptstools/odimh5.py
ODIMReader via h5py; e2e tests/test_vph5_to_vpts.py:20-68). This module
implements just enough of the public HDF5 File Format Specification
(https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html) to read ODIM VP files
and anything structurally similar:

- superblock versions 0/1 (the HLHDF/vol2bird layout) and 2/3, with 4- or
  8-byte offsets/lengths;
- version-1 object headers (+ continuation blocks) and version-2 headers;
- symbol-table groups (v1 B-tree + local heap + SNOD) — the classic group
  format — and v2 "link message" compact groups;
- messages: dataspace (v1/v2), datatype (fixed-point, float, string,
  variable-length string), fill value, data layout (v1/v2/v3: compact,
  contiguous, chunked), filter pipeline (deflate, shuffle), attribute
  (v1/v2/v3), link, symbol table, object-header continuation;
- chunked datasets via the v1 B-tree chunk index with zlib/shuffle filters;
- variable-length strings via global heap collections.

API mirrors the h5py subset the ODIM decode layer uses: ``H5File(data)``,
``file[path]`` → ``H5Group``/``H5Dataset``, ``group.attrs``,
``group.keys()``, ``dataset[()]`` → numpy array, ``dataset.dtype``.

Everything here runs executor-side on small in-memory byte strings (VP
files are ~25 KB); Spark parallelism comes from the binaryFile scan in
``sources.odim.read_vp_files``, one file per row.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"

_UNDEF4 = 0xFFFFFFFF
_UNDEF8 = 0xFFFFFFFFFFFFFFFF


class H5FormatError(Exception):
    """Input bytes are not a readable HDF5 file (or use an unsupported
    feature of the format)."""


def _pad8(n: int) -> int:
    return (n + 7) & ~7


class _File:
    """Parsed superblock + byte-cursor helpers."""

    def __init__(self, data: bytes):
        self.data = data
        sb = data.find(SIGNATURE)
        if sb != 0:
            # the spec allows superblocks at 0, 512, 1024, ...; reject -1
            if sb < 0:
                raise H5FormatError("no HDF5 signature")
        self.base = sb
        version = data[sb + 8]
        if version in (0, 1):
            self.off_size = data[sb + 13]
            self.len_size = data[sb + 14]
            pos = sb + 24
            if version == 1:
                pos += 4  # indexed-storage K + reserved
            pos += 4 * self.off_size  # base, free-space, EOF, driver-info
            # root group symbol table entry: link name offset, header addr
            pos += self.off_size
            self.root_addr = self.read_offset(pos)
        elif version in (2, 3):
            self.off_size = data[sb + 9]
            self.len_size = data[sb + 10]
            pos = sb + 12 + 3 * self.off_size
            self.root_addr = self.read_offset(pos)
        else:
            raise H5FormatError(f"unsupported superblock version {version}")
        if self.off_size not in (2, 4, 8) or self.len_size not in (2, 4, 8):
            raise H5FormatError("unsupported offset/length size")

    def read_uint(self, pos: int, size: int) -> int:
        return int.from_bytes(self.data[pos : pos + size], "little")

    def read_offset(self, pos: int) -> int | None:
        v = self.read_uint(pos, self.off_size)
        undef = (1 << (8 * self.off_size)) - 1
        return None if v == undef else v + self.base

    def read_length(self, pos: int) -> int:
        return self.read_uint(pos, self.len_size)


# ---------------------------------------------------------------- messages

_MSG_DATASPACE = 0x0001
_MSG_LINK_INFO = 0x0002
_MSG_DATATYPE = 0x0003
_MSG_FILL_OLD = 0x0004
_MSG_FILL = 0x0005
_MSG_LINK = 0x0006
_MSG_LAYOUT = 0x0008
_MSG_GROUP_INFO = 0x000A
_MSG_FILTERS = 0x000B
_MSG_ATTRIBUTE = 0x000C
_MSG_CONTINUATION = 0x0010
_MSG_SYMBOL_TABLE = 0x0011


def _read_messages(f: _File, addr: int) -> list[tuple[int, int]]:
    """Read an object header (v1 or v2) → [(msg_type, body_offset_abs)].

    Message bodies are returned as absolute positions into ``f.data``; sizes
    are implicit (parsers read what they need).
    """
    if f.data[addr : addr + 4] == b"OHDR":
        return _read_messages_v2(f, addr)
    version = f.data[addr]
    if version != 1:
        raise H5FormatError(f"unsupported object header version {version}")
    nmsgs = f.read_uint(addr + 2, 2)
    header_size = f.read_uint(addr + 8, 4)
    out: list[tuple[int, int]] = []
    blocks = [(addr + 16, header_size)]  # v1 prefix is 12 B padded to 16
    remaining = nmsgs
    bi = 0
    while bi < len(blocks) and remaining > 0:
        pos, size = blocks[bi]
        end = pos + size
        while pos + 8 <= end and remaining > 0:
            mtype = f.read_uint(pos, 2)
            msize = f.read_uint(pos + 2, 2)
            body = pos + 8
            remaining -= 1
            if mtype == _MSG_CONTINUATION:
                cont_addr = f.read_offset(body)
                cont_len = f.read_length(body + f.off_size)
                if cont_addr is not None:
                    blocks.append((cont_addr, cont_len))
            else:
                out.append((mtype, body))
            pos = body + msize
        bi += 1
    return out


def _read_messages_v2(f: _File, addr: int) -> list[tuple[int, int]]:
    flags = f.data[addr + 5]
    pos = addr + 6
    if flags & 0x20:
        pos += 8  # access/mod/change/birth times
    if flags & 0x10:
        pos += 4  # max compact / min dense attributes
    chunk0_len = f.read_uint(pos, 1 << (flags & 0x3))
    pos += 1 << (flags & 0x3)
    tracked = bool(flags & 0x4)
    out: list[tuple[int, int]] = []
    blocks = [(pos, chunk0_len)]
    bi = 0
    while bi < len(blocks):
        p, size = blocks[bi]
        end = p + size - 4  # trailing checksum
        while p + 4 <= end:
            mtype = f.read_uint(p, 1)
            msize = f.read_uint(p + 1, 2)
            p += 4
            if tracked:
                p += 2  # creation order
            if mtype == _MSG_CONTINUATION:
                cont_addr = f.read_offset(p)
                cont_len = f.read_length(p + f.off_size)
                if cont_addr is not None:
                    # OCHK signature (4) leads each continuation block
                    blocks.append((cont_addr + 4, cont_len - 4))
            else:
                out.append((mtype, p))
            p += msize
        bi += 1
    return out


# ---------------------------------------------------------------- datatype


class _Datatype:
    """Decoded datatype message: enough to build a numpy dtype / decode
    attribute values."""

    def __init__(self, f: _File, pos: int):
        b0 = f.data[pos]
        self.cls = b0 & 0x0F
        self.version = b0 >> 4
        self.bits = f.read_uint(pos + 1, 3)
        self.size = f.read_uint(pos + 4, 4)
        self.f = f
        self.pos = pos
        self.little = not (self.bits & 0x1)
        if self.cls == 9:  # variable-length
            base = _Datatype(f, pos + 8)
            self.vlen_is_string = (self.bits & 0x0F) == 1
            self.vlen_base = base

    def numpy_dtype(self) -> np.dtype:
        order = "<" if self.little else ">"
        if self.cls == 0:  # fixed-point
            signed = "i" if self.bits & 0x08 else "u"
            return np.dtype(f"{order}{signed}{self.size}")
        if self.cls == 1:  # floating-point
            return np.dtype(f"{order}f{self.size}")
        if self.cls == 3:  # string
            return np.dtype(f"S{self.size}")
        raise H5FormatError(f"unsupported datatype class {self.cls}")

    def decode_scalar(self, raw: bytes) -> Any:
        if self.cls == 3:  # fixed string: strip NUL padding
            return raw.split(b"\x00", 1)[0]
        if self.cls == 9:  # variable-length via global heap
            if not self.vlen_is_string:
                raise H5FormatError("unsupported non-string vlen attribute")
            nbytes = int.from_bytes(raw[0:4], "little")
            gh_addr_raw = int.from_bytes(raw[4 : 4 + self.f.off_size], "little")
            obj_index = int.from_bytes(
                raw[4 + self.f.off_size : 8 + self.f.off_size], "little"
            )
            return _global_heap_object(self.f, gh_addr_raw + self.f.base, obj_index)[
                :nbytes
            ]
        return np.frombuffer(raw, dtype=self.numpy_dtype(), count=1)[0]


def _global_heap_object(f: _File, addr: int, index: int) -> bytes:
    if f.data[addr : addr + 4] != b"GCOL":
        raise H5FormatError("bad global heap signature")
    size = f.read_length(addr + 8)
    pos = addr + 8 + f.len_size
    end = addr + size
    while pos + 8 + f.len_size <= end:
        obj_index = f.read_uint(pos, 2)
        obj_size = f.read_length(pos + 8)
        data_pos = pos + 8 + f.len_size
        if obj_index == index:
            return f.data[data_pos : data_pos + obj_size]
        if obj_index == 0:
            break
        pos = data_pos + _pad8(obj_size)
    raise H5FormatError(f"global heap object {index} not found")


# ---------------------------------------------------------------- dataspace


def _read_dataspace(f: _File, pos: int) -> tuple[int, ...]:
    version = f.data[pos]
    if version == 1:
        ndims = f.data[pos + 1]
        p = pos + 8
    elif version == 2:
        ndims = f.data[pos + 1]
        p = pos + 4
    else:
        raise H5FormatError(f"unsupported dataspace version {version}")
    return tuple(f.read_length(p + i * f.len_size) for i in range(ndims))


# ---------------------------------------------------------------- attributes


def _read_attribute(f: _File, pos: int) -> tuple[str, Any]:
    version = f.data[pos]
    if version == 1:
        name_size = f.read_uint(pos + 2, 2)
        dt_size = f.read_uint(pos + 4, 2)
        ds_size = f.read_uint(pos + 6, 2)
        p = pos + 8
        name = f.data[p : p + name_size].split(b"\x00", 1)[0].decode("utf-8")
        p += _pad8(name_size)
        dt = _Datatype(f, p)
        p += _pad8(dt_size)
        shape = _read_dataspace(f, p)
        p += _pad8(ds_size)
    elif version in (2, 3):
        name_size = f.read_uint(pos + 2, 2)
        dt_size = f.read_uint(pos + 4, 2)
        ds_size = f.read_uint(pos + 6, 2)
        p = pos + 8 + (1 if version == 3 else 0)
        name = f.data[p : p + name_size].split(b"\x00", 1)[0].decode("utf-8")
        p += name_size
        dt = _Datatype(f, p)
        p += dt_size
        shape = _read_dataspace(f, p)
        p += ds_size
    else:
        raise H5FormatError(f"unsupported attribute version {version}")
    n = int(np.prod(shape)) if shape else 1
    if n == 1:
        value = dt.decode_scalar(f.data[p : p + max(dt.size, 1)])
    else:
        if dt.cls in (3, 9):
            value = [
                dt.decode_scalar(f.data[p + i * dt.size : p + (i + 1) * dt.size])
                for i in range(n)
            ]
        else:
            value = np.frombuffer(
                f.data, dtype=dt.numpy_dtype(), count=n, offset=p
            ).reshape(shape)
    return name, value


# ---------------------------------------------------------------- groups


def _symbol_table_entries(f: _File, btree_addr: int, heap_addr: int) -> dict[str, int]:
    """Walk a v1 group B-tree → {link name: object header addr}."""
    if f.data[heap_addr : heap_addr + 4] != b"HEAP":
        raise H5FormatError("bad local heap signature")
    heap_data = f.read_offset(heap_addr + 8 + 2 * f.len_size)
    if heap_data is None:
        raise H5FormatError("undefined local heap data address")

    out: dict[str, int] = {}

    def heap_name(offset: int) -> str:
        start = heap_data + offset
        end = f.data.index(b"\x00", start)
        return f.data[start:end].decode("utf-8")

    def walk_btree(addr: int) -> None:
        if f.data[addr : addr + 4] != b"TREE":
            raise H5FormatError("bad B-tree signature")
        level = f.data[addr + 5]
        nentries = f.read_uint(addr + 6, 2)
        pos = addr + 8 + 2 * f.off_size  # skip left/right siblings
        pos += f.len_size  # key 0
        for _ in range(nentries):
            child = f.read_offset(pos)
            pos += f.off_size + f.len_size  # child + next key
            if child is None:
                continue
            if level > 0:
                walk_btree(child)
            else:
                read_snod(child)

    def read_snod(addr: int) -> None:
        if f.data[addr : addr + 4] != b"SNOD":
            raise H5FormatError("bad symbol node signature")
        nsyms = f.read_uint(addr + 6, 2)
        entry_size = 2 * f.off_size + 8 + 16
        pos = addr + 8
        for _ in range(nsyms):
            name_off = f.read_length(pos)  # link name offset (heap)
            header = f.read_offset(pos + f.off_size)
            if header is not None:
                out[heap_name(name_off)] = header
            pos += entry_size

    walk_btree(btree_addr)
    return out


def _read_link(f: _File, pos: int) -> tuple[str, int] | None:
    """Link message (v2 groups) → (name, object header addr) for hard
    links; None for soft/external links."""
    version = f.data[pos]
    if version != 1:
        raise H5FormatError(f"unsupported link message version {version}")
    flags = f.data[pos + 1]
    p = pos + 2
    ltype = 0
    if flags & 0x08:
        ltype = f.data[p]
        p += 1
    if flags & 0x04:
        p += 8  # creation order
    if flags & 0x10:
        p += 1  # charset
    name_len = f.read_uint(p, 1 << (flags & 0x3))
    p += 1 << (flags & 0x3)
    name = f.data[p : p + name_len].decode("utf-8")
    p += name_len
    if ltype != 0:
        return None
    addr = f.read_offset(p)
    return None if addr is None else (name, addr)


# ---------------------------------------------------------------- datasets


class H5Dataset:
    """A resolved dataset: numpy-materialized on first ``[()]``."""

    def __init__(self, f: _File, msgs: list[tuple[int, int]], name: str):
        self._f = f
        self._name = name
        self._shape: tuple[int, ...] = ()
        self._dt: _Datatype | None = None
        self._layout: tuple[int, int] | None = None  # (version-agnostic)
        self._filters: list[tuple[int, tuple[int, ...]]] = []
        self.attrs: dict[str, Any] = {}
        layout_pos = None
        for mtype, pos in msgs:
            if mtype == _MSG_DATASPACE:
                self._shape = _read_dataspace(f, pos)
            elif mtype == _MSG_DATATYPE:
                self._dt = _Datatype(f, pos)
            elif mtype == _MSG_LAYOUT:
                layout_pos = pos
            elif mtype == _MSG_FILTERS:
                self._filters = _read_filters(f, pos)
            elif mtype == _MSG_ATTRIBUTE:
                k, v = _read_attribute(f, pos)
                self.attrs[k] = v
        if self._dt is None or layout_pos is None:
            raise H5FormatError(f"dataset {name}: missing datatype/layout")
        self._layout_pos = layout_pos

    @property
    def dtype(self) -> np.dtype:
        assert self._dt is not None
        return self._dt.numpy_dtype()

    @property
    def shape(self) -> tuple[int, ...]:
        return self._shape

    def __getitem__(self, key) -> np.ndarray:
        if key != () and key is not Ellipsis:
            raise H5FormatError("only full reads ([()] or [...]) supported")
        return self._read()

    def _read(self) -> np.ndarray:
        f, dt = self._f, self._dt
        assert dt is not None
        pos = self._layout_pos
        version = f.data[pos]
        n = int(np.prod(self._shape)) if self._shape else 1
        nbytes = n * dt.size
        if version == 3:
            cls = f.data[pos + 1]
            body = pos + 2
            if cls == 0:  # compact
                size = f.read_uint(body, 2)
                raw = f.data[body + 2 : body + 2 + size]
                return self._finish(raw[:nbytes])
            if cls == 1:  # contiguous
                addr = f.read_offset(body)
                if addr is None:
                    raise H5FormatError("contiguous data address undefined")
                return self._finish(f.data[addr : addr + nbytes])
            if cls == 2:  # chunked
                ndims = f.data[body]  # dataspace dims + 1
                btree = f.read_offset(body + 1)
                chunk_dims = tuple(
                    f.read_uint(body + 1 + f.off_size + 4 * i, 4)
                    for i in range(ndims - 1)
                )
                if btree is None:
                    raise H5FormatError("chunk B-tree address undefined")
                return self._read_chunked(btree, chunk_dims)
            raise H5FormatError(f"unsupported layout class {cls}")
        if version in (1, 2):
            ndims = f.data[pos + 1]
            cls = f.data[pos + 2]
            body = pos + 8
            if cls == 1:  # contiguous
                addr = f.read_offset(body)
                if addr is None:
                    raise H5FormatError("contiguous data address undefined")
                return self._finish(f.data[addr : addr + nbytes])
            if cls == 2:  # chunked
                btree = f.read_offset(body)
                chunk_dims = tuple(
                    f.read_uint(body + f.off_size + 4 * i, 4)
                    for i in range(ndims - 1)  # last dim is element size
                )
                if btree is None:
                    raise H5FormatError("chunk B-tree address undefined")
                return self._read_chunked(btree, chunk_dims)
            if cls == 0:  # compact
                size = f.read_uint(body + 4 * ndims, 4)
                raw_pos = body + 4 * ndims + 4
                return self._finish(f.data[raw_pos : raw_pos + size][:nbytes])
            raise H5FormatError(f"unsupported layout class {cls}")
        raise H5FormatError(f"unsupported layout version {version}")

    def _read_chunked(self, btree_addr: int, chunk_dims: tuple[int, ...]) -> np.ndarray:
        f, dt = self._f, self._dt
        assert dt is not None
        rank = len(self._shape)
        out = np.zeros(self._shape, dtype=self.dtype)

        def walk(addr: int) -> None:
            if f.data[addr : addr + 4] != b"TREE":
                raise H5FormatError("bad chunk B-tree signature")
            if f.data[addr + 4] != 1:
                raise H5FormatError("not a raw-data chunk B-tree")
            level = f.data[addr + 5]
            nentries = f.read_uint(addr + 6, 2)
            key_size = 8 + 8 * (rank + 1)
            pos = addr + 8 + 2 * f.off_size
            for _ in range(nentries):
                chunk_size = f.read_uint(pos, 4)
                filter_mask = f.read_uint(pos + 4, 4)
                offsets = tuple(
                    f.read_uint(pos + 8 + 8 * i, 8) for i in range(rank)
                )
                child = f.read_offset(pos + key_size)
                pos += key_size + f.off_size
                if child is None:
                    continue
                if level > 0:
                    walk(child)
                    continue
                raw = f.data[child : child + chunk_size]
                raw = _apply_filters(raw, self._filters, filter_mask, dt.size)
                chunk = np.frombuffer(raw, dtype=self.dtype)[
                    : int(np.prod(chunk_dims))
                ].reshape(chunk_dims)
                slices_out = []
                slices_in = []
                for d in range(rank):
                    lo = offsets[d]
                    hi = min(lo + chunk_dims[d], self._shape[d])
                    slices_out.append(slice(lo, hi))
                    slices_in.append(slice(0, hi - lo))
                out[tuple(slices_out)] = chunk[tuple(slices_in)]

        walk(btree_addr)
        return out

    def _finish(self, raw: bytes) -> np.ndarray:
        return np.frombuffer(raw, dtype=self.dtype).reshape(self._shape)


def _read_filters(f: _File, pos: int) -> list[tuple[int, tuple[int, ...]]]:
    version = f.data[pos]
    nfilters = f.data[pos + 1]
    out: list[tuple[int, tuple[int, ...]]] = []
    if version == 1:
        p = pos + 8
    elif version == 2:
        p = pos + 2
    else:
        raise H5FormatError(f"unsupported filter pipeline version {version}")
    for _ in range(nfilters):
        fid = f.read_uint(p, 2)
        name_len = f.read_uint(p + 2, 2)
        ncdv = f.read_uint(p + 6, 2)
        p += 8
        if version == 1:
            p += _pad8(name_len)
        else:
            p += name_len if fid >= 256 else 0
        cdata = tuple(f.read_uint(p + 4 * i, 4) for i in range(ncdv))
        p += 4 * ncdv
        if version == 1 and ncdv % 2 == 1:
            p += 4
        out.append((fid, cdata))
    return out


def _apply_filters(
    raw: bytes,
    filters: list[tuple[int, tuple[int, ...]]],
    mask: int,
    elem_size: int,
) -> bytes:
    # filters apply in reverse order on read; bit i of mask = filter i skipped
    for i in range(len(filters) - 1, -1, -1):
        if mask & (1 << i):
            continue
        fid, _cdata = filters[i]
        if fid == 1:  # deflate
            raw = zlib.decompress(raw)
        elif fid == 2:  # shuffle
            arr = np.frombuffer(raw, dtype=np.uint8)
            raw = (
                arr.reshape(elem_size, len(arr) // elem_size).T.tobytes()
            )
        elif fid == 3:  # fletcher32: strip the 4-byte checksum
            raw = raw[:-4]
        else:
            raise H5FormatError(f"unsupported filter id {fid}")
    return raw


# ---------------------------------------------------------------- groups/API


class H5Group:
    def __init__(self, f: _File, addr: int, name: str):
        self._f = f
        self._name = name
        msgs = _read_messages(f, addr)
        self.attrs: dict[str, Any] = {}
        self._links: dict[str, int] = {}
        self._is_dataset = False
        self._msgs = msgs
        for mtype, pos in msgs:
            if mtype == _MSG_ATTRIBUTE:
                k, v = _read_attribute(f, pos)
                self.attrs[k] = v
            elif mtype == _MSG_SYMBOL_TABLE:
                btree = f.read_offset(pos)
                heap = f.read_offset(pos + f.off_size)
                if btree is not None and heap is not None:
                    self._links.update(_symbol_table_entries(f, btree, heap))
            elif mtype == _MSG_LINK:
                link = _read_link(f, pos)
                if link is not None:
                    self._links[link[0]] = link[1]
            elif mtype in (_MSG_DATASPACE, _MSG_LAYOUT):
                self._is_dataset = True

    def keys(self) -> list[str]:
        return sorted(self._links)

    def __iter__(self):
        return iter(self.keys())

    def __contains__(self, name: str) -> bool:
        try:
            self[name]
            return True
        except KeyError:
            return False

    def __getitem__(self, path: str) -> "H5Group | H5Dataset":
        node: H5Group | H5Dataset = self
        for part in path.strip("/").split("/"):
            if not part:
                continue
            if not isinstance(node, H5Group) or part not in node._links:
                raise KeyError(f"{path!r} not found under {self._name!r}")
            addr = node._links[part]
            child_name = f"{node._name.rstrip('/')}/{part}"
            msgs = _read_messages(node._f, addr)
            if any(m == _MSG_LAYOUT for m, _ in msgs):
                node = H5Dataset(node._f, msgs, child_name)
            else:
                node = H5Group(node._f, addr, child_name)
        return node


class H5File(H5Group):
    """Read-only HDF5 file over in-memory bytes.

    ``H5File(data)[\"dataset1/data1/what\"].attrs[\"quantity\"]`` etc. —
    the h5py subset used by ``sources.odim.parse_odim_bytes``.
    """

    def __init__(self, data: bytes):
        f = _File(data)
        if f.root_addr is None:
            raise H5FormatError("undefined root group address")
        super().__init__(f, f.root_addr, "/")
