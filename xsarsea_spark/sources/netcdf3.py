"""Dependency-free NetCDF-3 classic (CDF-1/CDF-2) reader and writer.

Implements the public classic-netCDF binary format specification
(magic ``CDF\\x01``/``CDF\\x02``, big-endian headers and data,
4-byte-aligned names/values, fixed-size variables at absolute
offsets, record variables interleaved per record with the
single-record-variable padding exception). This closes the ingest
gap the netCDF4 import gate left: the OWI scene converter
(sources/owi.py, parity xsarsea detrend.py:71-93) and the NetCDF LUT
converter (sources/luts.py, parity models.py:361-410) both run on
classic files with no third-party reader.

NetCDF-4/HDF5 files (groups, compression) are a different container
entirely; those still raise with a clear message — convert them to
classic with ``nccopy -k classic`` where netCDF tooling exists.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["NC3Var", "NC3Dataset", "read_netcdf3", "write_netcdf3"]

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

# nc_type -> (numpy big-endian dtype, external size in bytes)
_TYPES = {
    1: (">i1", 1),   # NC_BYTE
    2: ("S1", 1),    # NC_CHAR
    3: (">i2", 2),   # NC_SHORT
    4: (">i4", 4),   # NC_INT
    5: (">f4", 4),   # NC_FLOAT
    6: (">f8", 8),   # NC_DOUBLE
}
_REV_TYPES = {
    np.dtype(np.int8): 1, np.dtype("S1"): 2, np.dtype(np.int16): 3,
    np.dtype(np.int32): 4, np.dtype(np.float32): 5,
    np.dtype(np.float64): 6,
}


@dataclass
class NC3Var:
    name: str
    dims: tuple[str, ...]
    attrs: dict
    data: np.ndarray


@dataclass
class NC3Dataset:
    dims: dict            # name -> size (record dim resolved)
    attrs: dict
    variables: dict = field(default_factory=dict)
    record_dim: str | None = None


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF-3 file")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.take(n).decode("utf-8")
        self.take((4 - n % 4) % 4)            # pad to 4-byte boundary
        return s

    def values(self, nc_type: int, nelems: int):
        dt, size = _TYPES[nc_type]
        raw = self.take(nelems * size)
        self.take((4 - (nelems * size) % 4) % 4)
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        return arr.tolist() if nelems > 1 else arr[0].item()

    def att_list(self) -> dict:
        tag, n = self.i4(), self.i4()
        if tag == 0 and n == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag {tag:#x}")
        return {self.name(): self.values(self.i4(), self.i4())
                for _ in range(n)}


def read_netcdf3(src: bytes | str) -> NC3Dataset:
    """Parse classic NetCDF bytes (or a file path) into arrays."""
    buf = src if isinstance(src, bytes) else open(src, "rb").read()
    if buf[:3] != b"CDF":
        raise NotImplementedError(
            "not a classic NetCDF file (NetCDF-4/HDF5 containers need "
            "netCDF tooling; convert with 'nccopy -k classic')")
    version = buf[3]
    if version not in (1, 2):
        raise NotImplementedError(f"unsupported CDF version {version}")
    r = _Reader(buf)
    r.take(4)
    numrecs = r.i4()

    dim_names, dim_sizes = [], []
    tag, n = r.i4(), r.i4()
    if not (tag == 0 and n == 0):
        if tag != _NC_DIMENSION:
            raise ValueError(f"bad dimension-list tag {tag:#x}")
        for _ in range(n):
            dim_names.append(r.name())
            dim_sizes.append(r.i4())

    gattrs = r.att_list()

    record_dim = None
    dims = {}
    for nm, sz in zip(dim_names, dim_sizes):
        if sz == 0:
            record_dim = nm
            dims[nm] = numrecs
        else:
            dims[nm] = sz

    ds = NC3Dataset(dims=dims, attrs=gattrs, record_dim=record_dim)

    tag, nvars = r.i4(), r.i4()
    headers = []
    if not (tag == 0 and nvars == 0):
        if tag != _NC_VARIABLE:
            raise ValueError(f"bad variable-list tag {tag:#x}")
        for _ in range(nvars):
            nm = r.name()
            ndims = r.i4()
            vdims = tuple(dim_names[r.i4()] for _ in range(ndims))
            vattrs = r.att_list()
            nc_type = r.i4()
            vsize = r.i4()
            begin = r.i8() if version == 2 else r.i4()
            headers.append((nm, vdims, vattrs, nc_type, vsize, begin))

    def _per_rec(h):
        dt_, size_ = _TYPES[h[3]]
        inner = tuple(dims[d] for d in h[1] if d != record_dim)
        return int(np.prod(inner, dtype=np.int64)) * size_

    rec_vars = [h for h in headers if record_dim and record_dim in h[1]]
    # the record STRIDE spans one record of EVERY record variable,
    # each block padded to 4 bytes — except the single-record-var
    # special case, where the lone block is unpadded
    if len(rec_vars) == 1:
        rec_step = _per_rec(rec_vars[0])
    else:
        rec_step = sum((_per_rec(h) + 3) // 4 * 4 for h in rec_vars)
    for nm, vdims, vattrs, nc_type, vsize, begin in headers:
        dt, size = _TYPES[nc_type]
        shape = tuple(dims[d] for d in vdims)
        if record_dim and record_dim in vdims:
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) * size
            chunks = [
                buf[begin + rec * rec_step:
                    begin + rec * rec_step + per_rec]
                for rec in range(numrecs)
            ]
            raw = b"".join(chunks)
        else:
            count = int(np.prod(shape, dtype=np.int64))
            raw = buf[begin:begin + count * size]
        arr = np.frombuffer(raw, dtype=dt).reshape(shape)
        if nc_type != 2:
            arr = arr.astype(dt[1:])          # native byte order
        ds.variables[nm] = NC3Var(nm, vdims, vattrs, arr)
    return ds


def _w_name(out: list, s: str) -> None:
    b = s.encode("utf-8")
    out.append(struct.pack(">i", len(b)) + b
               + b"\x00" * ((4 - len(b) % 4) % 4))


def _w_values(out: list, nc_type: int, values) -> None:
    if nc_type == 2:
        raw = values.encode("utf-8")
        nelems = len(raw)
    else:
        dt, _ = _TYPES[nc_type]
        arr = np.atleast_1d(np.asarray(values)).astype(dt)
        raw = arr.tobytes()
        nelems = arr.size
    out.append(struct.pack(">ii", nc_type, nelems) + raw
               + b"\x00" * ((4 - len(raw) % 4) % 4))


def _coerce(a: np.ndarray) -> np.ndarray:
    """Map platform-default dtypes onto classic-netCDF externals
    (there is no 64-bit integer in the classic format)."""
    if a.dtype.kind == "i" and a.dtype.itemsize == 8:
        if np.any(a > np.iinfo(np.int32).max) or np.any(
                a < np.iinfo(np.int32).min):
            raise ValueError("classic NetCDF has no 64-bit integers")
        return a.astype(np.int32)
    if a.dtype.kind == "u":
        return _coerce(a.astype(np.int64))
    return a


def _w_atts(out: list, attrs: dict) -> None:
    if not attrs:
        out.append(struct.pack(">ii", 0, 0))
        return
    out.append(struct.pack(">ii", _NC_ATTRIBUTE, len(attrs)))
    for k, v in attrs.items():
        _w_name(out, k)
        if isinstance(v, str):
            _w_values(out, 2, v)
        else:
            a = _coerce(np.atleast_1d(np.asarray(v)))
            _w_values(out, _REV_TYPES[a.dtype.newbyteorder("=")], a)


def write_netcdf3(dims: dict, variables: dict, attrs: dict | None = None,
                  version: int = 1) -> bytes:
    """Encode a classic NetCDF file (fixed-size variables only — the
    shape every LUT/OWI fixture needs; the reader additionally
    understands record variables).

    ``variables``: name -> (dim_names tuple, attrs dict, ndarray).
    """
    dim_names = list(dims)
    out: list[bytes] = [b"CDF" + bytes([version]),
                        struct.pack(">i", 0)]           # numrecs
    if dims:
        out.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
        for nm in dim_names:
            _w_name(out, nm)
            out.append(struct.pack(">i", dims[nm]))
    else:
        out.append(struct.pack(">ii", 0, 0))            # ABSENT
    _w_atts(out, attrs or {})

    heads, payloads = [], []
    out.append(struct.pack(">ii", _NC_VARIABLE, len(variables)))
    for nm, (vdims, vattrs, data) in variables.items():
        arr = _coerce(np.asarray(data))
        nc_type = _REV_TYPES[arr.dtype.newbyteorder("=")]
        dt, size = _TYPES[nc_type]
        raw = arr.astype(dt).tobytes()
        raw += b"\x00" * ((4 - len(raw) % 4) % 4)
        head: list[bytes] = []
        _w_name(head, nm)
        head.append(struct.pack(">i", len(vdims)))
        for d in vdims:
            head.append(struct.pack(">i", dim_names.index(d)))
        _w_atts(head, vattrs)
        head.append(struct.pack(">ii", nc_type, len(raw)))
        heads.append(b"".join(head))
        payloads.append(raw)

    offset_size = 8 if version == 2 else 4
    header_len = (sum(len(b) for b in out)
                  + sum(len(h) + offset_size for h in heads))
    begin = header_len
    for h, p in zip(heads, payloads):
        out.append(h)
        out.append(struct.pack(">q" if version == 2 else ">i", begin))
        begin += len(p)
    out.extend(payloads)
    return b"".join(out)
