"""Round-4 batch b: the delta-of-delta timestamp codec's encoded SIZE
under the driver oracle. codec_roundtrip (queries_ops.py:217) proves the
codec lossless; this query proves the COMPRESSION — DuckDB independently
derives the exact encoded byte count per key from the codec's published
byte-class rule, so any layout drift (header width, class boundaries,
payload packing) flips the driver hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "codec_dod_size_audit",
    """
    WITH s AS (
      SELECT user_id,
             row_number() OVER w AS rn,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS d1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
    ), s2 AS (
      SELECT user_id, rn,
             d1 - lag(d1) OVER (PARTITION BY user_id ORDER BY rn) AS d2
      FROM s
    ), sz AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CASE WHEN rn >= 3 THEN
                   CASE WHEN d2 = 0 THEN 0
                        WHEN d2 BETWEEN -128 AND 127 THEN 1
                        WHEN d2 BETWEEN -32768 AND 32767 THEN 2
                        WHEN d2 BETWEEN -2147483648 AND 2147483647 THEN 4
                        ELSE 8 END
                 ELSE 0 END) AS payload
      FROM s2 GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(CASE WHEN n <= 2 THEN 8 + 8 * n
                     ELSE 24 + (n - 2) + payload END AS BIGINT) AS ts_bytes,
           CAST((20000 * (CASE WHEN n <= 2 THEN 8 + 8 * n
                               ELSE 24 + (n - 2) + payload END)
                 + 8 * n) // (16 * n) AS BIGINT) AS ts_ratio_bp,
           TRUE AS ts_exact,
           TRUE AS f_exact
    FROM sz
    """,
)
def codec_dod_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key delta-of-delta encoded size + roundtrip flags, vs an oracle
    that computes the size CLOSED-FORM from the codec spec: header 8 B;
    n<=2 stores raw (8+8n); else 24 B (header + first two int64) +
    one class byte per remaining point + zig-zag payload bytes
    {0,1,2,4,8} chosen by the second difference's range (class 1 iff
    d2 in [-128,127], etc. — zig-zag maps those ranges exactly onto the
    unsigned byte-count buckets). ts_exact / f_exact additionally assert
    decode(encode(x)) is BIT-exact inside the engine; the oracle pins
    them TRUE, so a roundtrip regression also flips the hash.

    Scale: ONE shuffle (groupBy key -> applyInPandas, the same
    Arrow-batched seam as the production pack_blocks writer); the audit
    is how a 100 TB deployment spot-checks cold-tier compression ratio
    per partition without reading blobs back."""
    from mintpy_spark.codecs.gorilla import (
        decode_floats,
        decode_timestamps,
        encode_floats,
        encode_timestamps,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("value").cast("double").alias("v"),
    )
    schema = (
        "user_id long, n long, ts_bytes long, ts_ratio_bp long,"
        " ts_exact boolean, f_exact boolean"
    )

    def audit(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in pdf.groupby("user_id", sort=False):
            t = g["t"].to_numpy(np.int64)
            v = g["v"].to_numpy(np.float64)
            blob = encode_timestamps(t)
            ts_exact = bool(np.array_equal(decode_timestamps(blob), t))
            fblob = encode_floats(v)
            f_exact = bool(
                np.array_equal(
                    decode_floats(fblob).view(np.uint64), v.view(np.uint64)
                )
            )
            n, b = len(t), len(blob)
            rows.append(
                (uid, n, b, (20000 * b + 8 * n) // (16 * n), ts_exact,
                 f_exact)
            )
        return pd.DataFrame(
            rows,
            columns=["user_id", "n", "ts_bytes", "ts_ratio_bp",
                     "ts_exact", "f_exact"],
        )

    from mintpy_spark.operators.seqstate import map_sorted_groups

    return map_sorted_groups(ev, "user_id", ("t", "v"), audit, schema)


@_q(
    "codec_text_blob_roundtrip",
    """
    SELECT doc_id, md5(text) AS text_md5, n_chars
    FROM documents
    """,
)
def codec_text_blob_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint's per-row invariant — byte-identical text through
    the cold-tier block codec — under the driver hash: every document's
    text rides the zlib text side-channel of pack_blocks (one compressed
    blob + length ledger per block), is unpacked back to bytes, and is
    fingerprinted with md5; the oracle hashes the source column directly,
    so ONE flipped byte anywhere in pack/unpack flips the driver hash.
    codec_roundtrip (queries_ops.py:217) covers the value/timestamp
    channels; this covers the text channel end-to-end.

    Block keying: a synthetic hourly timestamp (doc_id hours) splits each
    source into ~720-doc blocks under the standard 30d window — the same
    bounded-block discipline the production writer uses (a per-source
    single block would concentrate a source's whole corpus in one row).
    doc_id rides the timestamp channel (exact int64 microseconds) and
    n_chars rides the float channel (exact below 2^53)."""
    from mintpy_spark.codecs.blocks import pack_blocks, unpack_blocks

    docs = load(spark, sf_dir, "documents").select(
        "source",
        F.timestamp_micros(F.col("doc_id") * F.lit(3_600_000_000)).alias("ts"),
        F.col("n_chars").cast("double").alias("v"),
        "text",
    )
    blocks = pack_blocks(
        docs, "v", text_col="text", window="30d",
        key="source", ts="ts", value_dtype="float64",
    )
    back = unpack_blocks(blocks, with_text=True)
    return back.select(
        (F.unix_micros("warc_ts") / F.lit(3_600_000_000))
        .cast("long")
        .alias("doc_id"),
        F.md5("text").alias("text_md5"),
        F.col("value").cast("long").alias("n_chars"),
    )


@_q(
    "warc_roundtrip",
    """
    SELECT doc_id, md5(text) AS text_md5, TRUE AS is_response
    FROM documents WHERE text IS NOT NULL
    """,
)
def warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARC ingest seam (sources/warc.py) under the driver hash:
    documents are encoded into Common-Crawl-layout .warc.gz blobs (one
    gzip member per record, ~100 records per blob — applyInPandas over a
    bounded block key), parsed back through the REAL reader path
    (the same stdlib parser read_warc's mapInPandas stage runs), and the
    recovered HTTP bodies md5-fingerprinted. The oracle hashes the source
    text directly, so any byte lost or altered across WARC header
    formatting, per-member gzip, record splitting, HTTP envelope
    stripping, or timestamp parsing flips the hash. doc_id rides the
    WARC-Target-URI path segment.

    Scale: the parse side is exactly production ingest — one task per
    WARC blob (Common Crawl ships ~1 GB files; file-per-task is the
    public CC processing convention), zero shuffles after the bounded
    encode stage."""
    import datetime as _dt

    from mintpy_spark.sources.warc import encode_warc, parse_warc

    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).select(
        (F.col("doc_id") / 100).cast("long").alias("blk"), "doc_id", "text"
    )

    def to_warc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        epoch = _dt.datetime(2024, 1, 1)
        recs = [
            (
                f"https://corpus.example/{int(r.doc_id)}",
                epoch + _dt.timedelta(seconds=int(r.doc_id)),
                str(r.text).encode("utf-8"),
            )
            for r in pdf.itertuples(index=False)
        ]
        return pd.DataFrame(
            {"blk": [pdf["blk"].iloc[0]], "blob": [encode_warc(recs, gzip_members=True)]}
        )

    blobs = docs.groupBy("blk").applyInPandas(to_warc, "blk long, blob binary")

    def from_warc(batches):
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                rows = parse_warc(bytes(r.blob))
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": [
                                int(x["url"].rsplit("/", 1)[1]) for x in rows
                            ],
                            "html": [x["html"] for x in rows],
                            "is_response": [
                                x["record_type"] == "response"
                                and x["http_status"] == 200
                                and x["warc_ts"] is not None
                                for x in rows
                            ],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    parsed = blobs.mapInPandas(
        from_warc, "doc_id long, html binary, is_response boolean"
    )
    return parsed.select(
        "doc_id", F.md5("html").alias("text_md5"), "is_response"
    )
