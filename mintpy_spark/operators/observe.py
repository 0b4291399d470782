"""pages -> obs derivation (stage 1 of the pipeline).

The reference's analog is ``load_data`` + dataset derivation: raw inputs are
normalized into the canonical stack with per-epoch metrics
(reference: src/mintpy/load_data.py:802, objects/stackDict.py). Here the raw
crawl row (url, warc_ts, html, text, lang) is projected to the observation
row the rollup tiers aggregate:

    obs(url, warc_ts, text_length, text_sha, lang)

``text_length`` is byte length (octet_length) and ``text_sha`` a sha1 digest
— the digest is what the byte-identical-text invariant tests assert on.
Everything is a narrow JVM-side projection (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pages_to_obs(pages: DataFrame) -> DataFrame:
    return pages.select(
        "url",
        "warc_ts",
        F.octet_length("text").alias("text_length"),
        F.sha1(F.encode("text", "UTF-8")).alias("text_sha"),
        "lang",
    )
