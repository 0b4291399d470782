"""Gorilla-style XOR float compression + delta-of-delta timestamp packing.

Pure-NumPy vectorized encode/decode — designed to run inside Arrow-batched
pandas UDFs (no per-row Python, per the input_hint contract). This replaces
the reference's HDF5 chunk compression (gzip/lzf per
defaults/smallbaselineApp.cfg:32, stack.py:352-355) with time-series-aware
codecs in the engine itself (north_rule).

Design notes
------------
* **Float path (Gorilla XOR, byte-aligned split-stream variant).** Classic
  Gorilla (Pelkonen et al., VLDB 2015) XORs each value with its predecessor
  and writes leading-zero/length fields at bit granularity — inherently
  sequential. For vectorized NumPy we keep the XOR-predecessor transform
  (which creates the long zero runs) but encode at *byte* granularity with
  a columnar split-stream layout:

      [magic 4B][count 4B][ctrl bytes: n][payload: significant bytes]

  Each control byte holds (first-significant-byte-offset << 4 | #significant
  bytes) of its XOR word; the payload stream concatenates only significant
  bytes. Identical consecutive values cost 1 ctrl byte. Because ctrl bytes
  are contiguous, BOTH encode and decode are pure cumsum/scatter/gather —
  no data-dependent scan — at a small ratio cost vs bit-packing.
  Round-trips bit-exactly (NaN payloads included).
* **Timestamp path (delta-of-delta, split-stream).** Second differences of
  int64 microseconds, zig-zag mapped, bucketed into 0/1/2/4/8-byte payload
  classes (class stream + payload stream). A perfectly regular grid costs
  1 byte/point; crawl-style jittery series ~3-5 bytes/point.
"""

from __future__ import annotations

import numpy as np

_MAGIC_F32 = b"GXf4"
_MAGIC_F64 = b"GXf8"
_MAGIC_TS = b"DDt8"


def _pack_header(magic: bytes, n: int) -> bytes:
    return magic + np.uint32(n).tobytes()


def _read_count(blob: bytes) -> int:
    return int(np.frombuffer(blob[4:8], dtype=np.uint32)[0])


def _run_positions(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(row index, position-within-run) pairs for variable-length runs."""
    total = int(lengths.sum())
    rows = np.repeat(np.arange(lengths.size), lengths)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    runpos = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    return rows, runpos


def encode_floats(values: np.ndarray) -> bytes:
    """XOR-predecessor + byte-aligned significant-byte packing (see module
    docstring). Accepts float32 or float64; NaNs round-trip bit-exactly."""
    values = np.asarray(values)
    if values.dtype == np.float32:
        uint, width, magic = np.uint32, 4, _MAGIC_F32
    elif values.dtype == np.float64:
        uint, width, magic = np.uint64, 8, _MAGIC_F64
    else:
        raise TypeError(f"expected float32/float64, got {values.dtype}")
    n = values.size
    if n == 0:
        return _pack_header(magic, 0)
    bits = values.view(uint)
    xored = bits.copy()
    xored[1:] = bits[1:] ^ bits[:-1]
    bytes2d = xored.view(np.uint8).reshape(n, width)  # little-endian words
    nonzero = bytes2d != 0
    any_nz = nonzero.any(axis=1)
    first_nz = np.where(any_nz, nonzero.argmax(axis=1), 0).astype(np.int64)
    last_nz = np.where(any_nz, width - 1 - nonzero[:, ::-1].argmax(axis=1), -1)
    sig_len = np.where(any_nz, last_nz - first_nz + 1, 0).astype(np.int64)
    ctrl = ((first_nz << 4) | sig_len).astype(np.uint8)
    rows, runpos = _run_positions(sig_len)
    payload = bytes2d[rows, first_nz[rows] + runpos]
    return _pack_header(magic, n) + ctrl.tobytes() + payload.tobytes()


def decode_floats(blob: bytes) -> np.ndarray:
    """Inverse of encode_floats; returns the original dtype. Fully
    vectorized: ctrl stream -> cumsum offsets -> flat gather -> XOR scan."""
    if blob[:4] == _MAGIC_F32:
        uint, ftype, width = np.uint32, np.float32, 4
    elif blob[:4] == _MAGIC_F64:
        uint, ftype, width = np.uint64, np.float64, 8
    else:
        raise ValueError(f"bad magic {blob[:4]!r}")
    n = _read_count(blob)
    if n == 0:
        return np.empty(0, dtype=ftype)
    ctrl = np.frombuffer(blob, dtype=np.uint8, offset=8, count=n)
    payload = np.frombuffer(blob, dtype=np.uint8, offset=8 + n)
    first_nz = (ctrl >> 4).astype(np.int64)
    sig_len = (ctrl & 0x0F).astype(np.int64)
    bytes2d = np.zeros((n, width), dtype=np.uint8)
    rows, runpos = _run_positions(sig_len)
    bytes2d[rows, first_nz[rows] + runpos] = payload[: rows.size]
    xored = bytes2d.reshape(-1).view(uint)
    return _xor_scan(xored).view(ftype)


def _xor_scan(x: np.ndarray) -> np.ndarray:
    """Inclusive XOR prefix scan — numpy's ufunc accumulate is a single C
    pass (the hand-rolled log2(n)-doubling loop it replaces did a full
    array copy + XOR per pass on the cold-tier decode hot path)."""
    return np.bitwise_xor.accumulate(x)


_TS_CLASS_BYTES = np.array([0, 1, 2, 4, 8], dtype=np.int64)


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta packing of int64 microsecond timestamps.

    Layout: [magic 4B][count 4B][first,second int64][class stream: n-2]
    [payload stream]. Class c stores the zig-zagged second difference in
    {0,1,2,4,8} little-endian payload bytes (class 0 = perfectly regular)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = ts.size
    head = _pack_header(_MAGIC_TS, n)
    if n <= 2:
        return head + ts.tobytes()
    d2 = np.diff(np.diff(ts))
    zz = ((d2 << 1) ^ (d2 >> 63)).astype(np.uint64)
    cls = np.select(
        [zz == 0, zz < (1 << 8), zz < (1 << 16), zz < (1 << 32)],
        [0, 1, 2, 3],
        default=4,
    ).astype(np.uint8)
    nbytes = _TS_CLASS_BYTES[cls]
    rows, runpos = _run_positions(nbytes)
    shifts = (runpos * 8).astype(np.uint64)
    payload = ((zz[rows] >> shifts) & np.uint64(0xFF)).astype(np.uint8)
    return head + ts[:2].tobytes() + cls.tobytes() + payload.tobytes()


def decode_timestamps(blob: bytes) -> np.ndarray:
    if blob[:4] != _MAGIC_TS:
        raise ValueError(f"bad magic {blob[:4]!r}")
    n = _read_count(blob)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = np.frombuffer(blob, dtype=np.int64, offset=8, count=min(n, 2))
    if n <= 2:
        return first.copy()
    cls = np.frombuffer(blob, dtype=np.uint8, offset=24, count=n - 2)
    payload = np.frombuffer(blob, dtype=np.uint8, offset=24 + (n - 2))
    nbytes = _TS_CLASS_BYTES[cls]
    rows, runpos = _run_positions(nbytes)
    zz = np.zeros(n - 2, dtype=np.uint64)
    shifts = (runpos * 8).astype(np.uint64)
    np.add.at(zz, rows, payload[: rows.size].astype(np.uint64) << shifts)
    d2 = (zz >> np.uint64(1)).astype(np.int64) ^ -(zz & np.uint64(1)).astype(np.int64)
    d1 = np.empty(n - 1, dtype=np.int64)
    d1[0] = first[1] - first[0]
    d1[1:] = d2
    np.cumsum(d1, out=d1)  # first differences from second differences
    np.cumsum(d1, out=d1)  # absolute offsets from first differences
    out = np.empty(n, dtype=np.int64)
    out[0] = first[0]
    out[1:] = first[0] + d1
    return out
