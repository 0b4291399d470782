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

Execution model: Arrow-batched ``mapInPandas`` — the binary payloads cross
into Python once per batch (vectorized transport), the marker scan is
``bytes.find`` per cell inside the batch (no Spark-level per-row Python
UDF), and everything downstream (length, sha, rollups) stays JVM-side.
At 100 TB this is the one stage that must touch every payload byte, so it
is embarrassingly parallel by design: no shuffle, runs at scan parallelism,
and the output projection drops ``html`` immediately so only extracted
text flows onward.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

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


def extract_text(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted_text",
    keep_html: bool = False,
) -> DataFrame:
    """pages -> pages + ``out_col`` (string, UTF-8 decoded body bytes).

    Malformed payloads yield NULL rather than failing the stage (the
    reference's no-data convention: unreadable -> NaN, readfile.py nodata
    remap), so one bad crawl record cannot kill a 100 TB scan.
    """
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
