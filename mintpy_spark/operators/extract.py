"""HTML -> text extraction (the byte-identity invariant of the engine).

The reference's analog is the prep/load layer that recovers the canonical
observable from raw processor products without altering values
(reference: src/mintpy/load_data.py:802 ingest normalization;
utils/readfile.py:319-388 exact-dtype scan). Here the raw observable is the
crawl payload: ``pages.html`` is an opaque ``binary`` column that embeds
the page text between ``<body>``...``</body>`` markers, surrounded by
arbitrary (possibly non-UTF8) bytes. ``extract_text`` must recover the text
**byte-for-byte** (`BASELINE.json` input_hint: "byte-identical extracted
text per url").

Execution model — two implementations, same semantics:

* ``extract_text`` (default): pure Catalyst expressions. The binary
  payload is viewed through the byte-preserving ISO-8859-1 charset
  (every byte maps to one char, losslessly), the markers are located with
  ``locate``/``reverse`` string ops, the slice is re-encoded to bytes and
  UTF-8 decoded. Everything stays inside whole-stage codegen — measured
  ~10x faster than the Arrow path at local[32] because no bytes ever
  cross the JVM/Python boundary.
* ``extract_text_arrow``: Arrow-batched ``mapInPandas`` doing the same
  marker scan with ``bytes.find`` — kept as the template for payload
  transforms that genuinely need Python (see operators/multimodal.py) and
  as an independent implementation for parity tests.

At 100 TB this is the one stage that must touch every payload byte, so it
is embarrassingly parallel by design: no shuffle, runs at scan parallelism,
and the output projection drops ``html`` immediately so only extracted
text flows onward.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BODY_OPEN = b"<body>"
BODY_CLOSE = b"</body>"


def extract_text_bytes(html: bytes) -> bytes | None:
    """Recover the embedded text bytes from one payload.

    Returns None when no well-formed body is present (malformed page).
    Uses the FIRST ``<body>`` and the LAST ``</body>`` so text containing
    the literal marker substrings round-trips unharmed.
    """
    if html is None:
        return None
    i = html.find(BODY_OPEN)
    if i < 0:
        return None
    j = html.rfind(BODY_CLOSE)
    if j < i:
        return None
    return html[i + len(BODY_OPEN): j]


def extract_text_expr(html_col: str = "html"):
    """Catalyst column expression recovering the body bytes as a UTF-8
    string (NULL when malformed).

    ISO-8859-1 is byte-preserving (all 256 bytes map 1:1 to chars), so
    string ops on the decoded proxy index *bytes*; the slice re-encodes to
    the original bytes exactly, then decodes as UTF-8 (malformed sequences
    -> U+FFFD, same as the Arrow path's errors='replace').

    Strategy: ONE charset conversion (UTF-8 decode with replacement — the
    markers are ASCII, and a malformed byte sequence can never swallow a
    following ASCII byte, so marker positions survive decoding), then pure
    length arithmetic on ``substring_index`` prefixes/suffixes:

        pre  = text before the FIRST <body>   (whole string if absent)
        tail = text after  the LAST  </body>  (whole string if absent)
        body = substring(s, len(pre)+7, len(s)-len(pre)-len(tail)-13)

    Invalid UTF-8 *inside* the body becomes U+FFFD — identical to the
    Arrow path's errors='replace'. An earlier variant round-tripped through
    ISO-8859-1 (byte-exact view) with reverse+locate; the single-decode
    form is ~8x faster (charset conversions and reverse dominated).
    """
    s = F.decode(F.col(html_col), "UTF-8")
    pre = F.substring_index(s, "<body>", 1)
    tail = F.substring_index(s, "</body>", -1)
    ls, lp, lt = F.length(s), F.length(pre), F.length(tail)
    has_open = lp < ls
    has_close = lt < ls
    body_len = ls - lp - lt - F.lit(len(BODY_OPEN) + len(BODY_CLOSE))
    body = F.substring(s, lp + F.lit(len(BODY_OPEN) + 1), F.greatest(body_len, F.lit(0)))
    ok = has_open & has_close & (body_len >= 0)
    return F.when(ok, body).otherwise(F.lit(None))


def extract_text(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted_text",
    keep_html: bool = False,
) -> DataFrame:
    """pages -> pages + ``out_col`` via the JVM-side expression (default,
    whole-stage-codegen path). NULL on malformed payloads — the
    reference's no-data convention (unreadable -> NaN, readfile.py nodata
    remap): one bad crawl record cannot kill a 100 TB scan.

    The decode / substring_index intermediates are staged through separate
    projections on purpose: they are referenced several times downstream,
    and staging keeps CollapseProject from inlining (= re-evaluating) the
    expensive payload-width expressions — measured ~4x on the ingest bench.
    """
    cols = [c for c in pages.columns if keep_html or c != html_col]
    staged = (
        pages.withColumn("_x_s", F.decode(F.col(html_col), "UTF-8"))
        .withColumn("_x_lp", F.length(F.substring_index("_x_s", BODY_OPEN.decode(), 1)))
        .withColumn("_x_lt", F.length(F.substring_index("_x_s", BODY_CLOSE.decode(), -1)))
        .withColumn("_x_ls", F.length("_x_s"))
    )
    lp, lt, ls = F.col("_x_lp"), F.col("_x_lt"), F.col("_x_ls")
    body_len = ls - lp - lt - F.lit(len(BODY_OPEN) + len(BODY_CLOSE))
    body = F.substring(
        F.col("_x_s"), lp + F.lit(len(BODY_OPEN) + 1), F.greatest(body_len, F.lit(0))
    )
    ok = (lp < ls) & (lt < ls) & (body_len >= 0)
    return staged.select(*cols, F.when(ok, body).otherwise(F.lit(None)).alias(out_col))


def extract_text_length(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "text_length",
) -> DataFrame:
    """Projection-pruned extraction: the *byte length* of the extracted
    text, without ever materializing the body string.

    A tier rollup over ``text_length`` (the engine's headline ingest path)
    consumes only the length, yet ``octet_length(extract_text(...))``
    still copies the body substring out of every payload — a copy Catalyst
    cannot eliminate (no ``length(substring(..)) -> arithmetic`` rewrite).
    This operator is that missing rewrite, done by hand: view the payload
    through ISO-8859-1 (every byte maps 1:1 to one char, so char positions
    ARE byte positions), locate the FIRST ``<body>`` / LAST ``</body>``
    markers exactly as :func:`extract_text` does, and emit

        text_length = total_bytes - prefix_bytes - tail_bytes - 12

    NULL on malformed pages under the *identical* condition as
    ``extract_text`` (marker presence/order is view-independent: ASCII
    subsequences survive both decodings). Equality with
    ``octet_length(extract_text(...))`` holds whenever the body bytes are
    valid UTF-8 — the crawl contract (noise bytes live OUTSIDE the body
    markers); a body with invalid UTF-8 would differ because the
    materializing path re-encodes U+FFFD replacements (3 bytes each). The
    parity test pins the equality corpus-wide.

    Measured ~3.4x faster than the materializing path at local[32]
    (12.2 s vs 41.2 s over 30 M pages): still touches every payload byte
    (decode + marker scans) but skips the body copy and the UTF-8
    re-encode. This is the path the ingest bench and any length-only
    rollup should use; text-consuming operators (sha, dedup, langid) keep
    :func:`extract_text`.
    """
    cols = [c for c in pages.columns if c != html_col]
    staged = (
        pages.withColumn("_x_s", F.decode(F.col(html_col), "ISO-8859-1"))
        .withColumn("_x_lp", F.length(F.substring_index("_x_s", BODY_OPEN.decode(), 1)))
        .withColumn("_x_lt", F.length(F.substring_index("_x_s", BODY_CLOSE.decode(), -1)))
        .withColumn("_x_ls", F.length("_x_s"))
    )
    lp, lt, ls = F.col("_x_lp"), F.col("_x_lt"), F.col("_x_ls")
    body_len = ls - lp - lt - F.lit(len(BODY_OPEN) + len(BODY_CLOSE))
    ok = (lp < ls) & (lt < ls) & (body_len >= 0)
    return staged.select(
        *cols,
        F.when(ok, body_len.cast("long")).otherwise(F.lit(None).cast("long")).alias(out_col),
    )


def extract_text_arrow(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted_text",
    keep_html: bool = False,
) -> DataFrame:
    """Arrow/pandas implementation of extract_text (see module docstring)."""
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields
                  if keep_html or f.name != html_col]
    schema = ", ".join(out_fields + [f"{out_col} string"])
    keep_cols = [f.name for f in pages.schema.fields if keep_html or f.name != html_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf[html_col]
            texts = []
            for h in raw:
                b = extract_text_bytes(bytes(h) if h is not None else None)
                texts.append(b.decode("utf-8", errors="replace") if b is not None else None)
            out = pdf[keep_cols].copy()
            out[out_col] = pd.Series(texts, index=pdf.index, dtype="object")
            yield out

    return pages.mapInPandas(run, schema)
