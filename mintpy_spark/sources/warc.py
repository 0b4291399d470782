"""WARC source: read Common-Crawl-style WARC files into (url, warc_ts,
html) rows — the engine's native ingest container (north_star: "Iceberg
table of Common-Crawl-style web pages"; the upstream of that table IS
the crawl's WARC output).

Format (public spec ISO 28500 / WARC 1.0, as Common Crawl emits it):

* A WARC file is a sequence of records; each record is a header block
  (CRLF-terminated "Name: value" lines, ended by an empty line) followed
  by exactly Content-Length payload bytes, then CRLF CRLF.
* ``response`` records carry WARC-Target-URI + WARC-Date headers and an
  HTTP/1.1 response (status line + headers + CRLF CRLF + body) as the
  payload; the page bytes are the HTTP body.
* Common Crawl's ``.warc.gz`` files gzip EACH RECORD as its own gzip
  member and concatenate the members — so a reader can split on member
  boundaries without decompressing the whole file, and a whole-file
  decompress of the concatenation also yields the plain stream (what
  ``_split_members`` exploits here).

Spark integration: ``spark.read.format("binaryFile")`` lists one row per
file (Common Crawl ships ~1 GB files, ~100k per crawl — file-per-task is
the natural parallelism unit and matches how every public CC processing
stack shards), then ``mapInPandas`` parses records with the pure-stdlib
parser below. No per-row Python: each Arrow batch holds whole files and
the parser walks bytes with ``bytes.find``/slicing.

Reference analog: the prep_*/readfile.py family — sniffing a container
format and extracting (key, time, payload) triples from opaque processor
output (utils/readfile.py:559-2110).
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib

from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"

WARC_SCHEMA = (
    "src_file string, url string, warc_ts timestamp, record_type string,"
    " http_status int, html binary"
)


def encode_warc(
    records: list[tuple[str, dt.datetime, bytes]],
    gzip_members: bool = False,
    status: int = 200,
) -> bytes:
    """Fixture encoder: (url, ts, body) triples -> WARC bytes. With
    ``gzip_members`` each record becomes its own gzip member (the
    Common-Crawl .warc.gz layout; mtime pinned for determinism)."""
    out = bytearray()
    for url, ts, body in records:
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            "Content-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        rec = header + http + b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


def _maybe_decompress(blob: bytes) -> bytes:
    """A .warc.gz file is concatenated gzip members; zlib handles member
    concatenation by re-priming on leftover input. Plain WARC passes
    through untouched."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = bytearray()
    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    data = blob
    while data:
        out += d.decompress(data)
        data = d.unused_data
        if data:
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        elif not d.eof:
            break
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers


def parse_warc(blob: bytes, src_file: str = "") -> list[dict]:
    """WARC bytes (plain or member-gzipped) -> one dict per record:
    {src_file, url, warc_ts, record_type, http_status, html}. Non-HTTP
    records (warcinfo, request, metadata) surface with html=None so
    callers can filter on record_type; a response record's html is the
    HTTP body BYTE-EXACT (the input_hint invariant starts here)."""
    data = _maybe_decompress(blob)
    rows: list[dict] = []
    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            break
        headers = _parse_headers(data[start:head_end])
        length = int(headers.get("content-length", "0"))
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        ts_raw = headers.get("warc-date")
        ts = (
            dt.datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ")
            if ts_raw
            else None
        )
        status = None
        body = None
        if payload[:5] == b"HTTP/":
            http_end = payload.find(_CRLF2)
            if http_end >= 0:
                status_line = payload[: payload.find(b"\r\n")]
                parts = status_line.split(b" ")
                status = int(parts[1]) if len(parts) > 1 else None
                body = payload[http_end + 4 :]
        rows.append(
            {
                "src_file": src_file,
                "url": url,
                "warc_ts": ts,
                "record_type": rtype,
                "http_status": status,
                "html": body,
            }
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: binaryFile listing (one task per file — the
    Common-Crawl parallelism unit) -> mapInPandas stdlib parse. Returns
    (src_file, url, warc_ts, record_type, http_status, html); filter
    ``record_type = 'response'`` for page rows, then feed load_data /
    extract_text exactly like a parquet pages table."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                rows = parse_warc(bytes(r.content), src_file=r.path)
                if rows:
                    frames.append(pd.DataFrame(rows))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
