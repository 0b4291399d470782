"""Round-4 batch c: the Gorilla-XOR float codec's encoded SIZE under the
driver oracle — the value-stream sibling of codec_dod_size_audit
(queries_r4b.py). codec_roundtrip proves the float codec lossless; this
query proves the COMPRESSION: DuckDB independently derives the exact
encoded byte count per key from first principles — it reconstructs each
value's IEEE-754 bit pattern closed-form in SQL (sign | biased exponent
| mantissa, exact for fixed-point integers < 2^52), XORs consecutive
patterns with a lag window, and counts significant bytes per XOR word
exactly as the codec's byte-aligned split-stream layout does (header 8 B
+ one ctrl byte per point + only the bytes between the first and last
nonzero byte of each word). Any drift in the codec layout — header
width, ctrl packing, significant-byte rule — flips the driver hash.

Reference analog: the HDF5 chunk-compression the reference relies on for
its stacks (smallbaselineApp.cfg:32 gzip settings, stack.py:352-355);
here the engine owns the codec (north_rule: Gorilla XOR float encoding),
so its on-disk contract needs an oracle of its own.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mintpy_spark.queries import _q, load


@_q(
    "codec_gorilla_size_audit",
    """
    WITH base AS (
      SELECT user_id, ts, value,
             CAST(FLOOR(value * 100) AS BIGINT) AS vq
      FROM events
    ), pat AS (
      -- IEEE-754 double bit pattern of CAST(vq AS DOUBLE), closed-form:
      -- exact for |vq| < 2^52 (the fixed-point cents fit in the mantissa)
      SELECT user_id, ts, value,
        CASE WHEN vq = 0 THEN 0
             ELSE (CASE WHEN vq < 0 THEN (-9223372036854775807 - 1) ELSE 0 END)
                  | (CAST(1023 + length(bin(abs(vq))) - 1 AS BIGINT) << 52)
                  | (abs(vq) * (CAST(1 AS BIGINT)
                                << (52 - (length(bin(abs(vq))) - 1)))
                     - (CAST(1 AS BIGINT) << 52))
        END AS p
      FROM base
    ), x AS (
      -- the codec XORs each word with its predecessor; first word raw
      SELECT user_id,
        CASE WHEN lag(p) OVER w IS NULL THEN p
             ELSE xor(p, lag(p) OVER w) END AS w64
      FROM pat
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
    ), sb AS (
      -- significant bytes = last nonzero byte index - first + 1 (0 if 0)
      SELECT user_id,
        CASE WHEN w64 = 0 THEN 0 ELSE
          (CASE WHEN ((w64 >> 56) & 255) != 0 THEN 7
                WHEN ((w64 >> 48) & 255) != 0 THEN 6
                WHEN ((w64 >> 40) & 255) != 0 THEN 5
                WHEN ((w64 >> 32) & 255) != 0 THEN 4
                WHEN ((w64 >> 24) & 255) != 0 THEN 3
                WHEN ((w64 >> 16) & 255) != 0 THEN 2
                WHEN ((w64 >>  8) & 255) != 0 THEN 1
                ELSE 0 END)
          -
          (CASE WHEN (w64 & 255) != 0 THEN 0
                WHEN ((w64 >>  8) & 255) != 0 THEN 1
                WHEN ((w64 >> 16) & 255) != 0 THEN 2
                WHEN ((w64 >> 24) & 255) != 0 THEN 3
                WHEN ((w64 >> 32) & 255) != 0 THEN 4
                WHEN ((w64 >> 40) & 255) != 0 THEN 5
                WHEN ((w64 >> 48) & 255) != 0 THEN 6
                ELSE 7 END)
          + 1 END AS sig_len
      FROM x
    )
    SELECT user_id, COUNT(*) AS n,
           CAST(8 + COUNT(*) + SUM(sig_len) AS BIGINT) AS f_bytes,
           CAST((10000 * (8 + COUNT(*) + SUM(sig_len)))
                // (8 * COUNT(*)) AS BIGINT) AS f_ratio_bp,
           TRUE AS f_exact
    FROM sb GROUP BY user_id
    """,
)
def codec_gorilla_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Gorilla-XOR encoded size + roundtrip flag for the cold-tier
    value stream, vs an oracle that rebuilds the byte count from the
    codec spec (gorilla.py module docstring): values are quantized to
    fixed-point cents (FLOOR(value*100) — the Gorilla fixed-point
    discipline the tier layer uses), encoded with the REAL
    ``encode_floats``, and the blob length compared against DuckDB's
    closed-form IEEE-754 + XOR + significant-byte-count reconstruction.
    ``f_exact`` asserts decode(encode(x)) is bit-exact inside the engine;
    the oracle pins it TRUE, so a roundtrip regression also flips the
    driver hash.

    Reference analog: stack.py:352-355 delegates chunk compression to
    HDF5; the north rule moves the codec into the engine, so this audit
    is the engine-owned replacement for h5py's storage-size checks.

    Scale: ONE shuffle (groupBy key -> applyInPandas, the same
    Arrow-batched seam as the production pack_blocks writer). This is how
    a 100 TB deployment spot-checks cold-tier value-stream compression
    ratio per partition without reading blobs back.
    """
    from mintpy_spark.codecs.gorilla import decode_floats, encode_floats

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("value").cast("double").alias("v"),
    )
    schema = (
        "user_id long, n long, f_bytes long, f_ratio_bp long,"
        " f_exact boolean"
    )

    def audit(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in pdf.groupby("user_id", sort=False):
            v = np.floor(g["v"].to_numpy(np.float64) * 100.0)
            blob = encode_floats(v)
            f_exact = bool(
                np.array_equal(
                    decode_floats(blob).view(np.uint64), v.view(np.uint64)
                )
            )
            n, b = len(v), len(blob)
            rows.append((uid, n, b, (10000 * b) // (8 * n), f_exact))
        return pd.DataFrame(
            rows,
            columns=["user_id", "n", "f_bytes", "f_ratio_bp", "f_exact"],
        )

    from mintpy_spark.operators.seqstate import map_sorted_groups

    return map_sorted_groups(ev, "user_id", ("t", "v"), audit, schema)
