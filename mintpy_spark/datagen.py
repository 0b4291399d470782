"""Deterministic synthetic `pages` table generator.

Mirrors the reference's simulate-truth-then-recover test pattern
(reference: tests/dem_error.py:56-67, fixed ``np.random.seed(12138)``,
``num_date=50``): every url's text length follows a known time function

    len(t) = intercept + velocity * dy + amp * sin(2*pi*dy) + step * H(t>=t0) + noise

with per-url parameters drawn from a seeded RNG, so velocity / rollup
results have an analytic truth. Schema matches the engine's input contract:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Generation is fully distributed and partition-order independent: the driver
only materializes ``spark.range(num_urls)``; each url's parameters and
observation schedule derive from a counter-based RNG keyed on
``(seed, url_id)`` inside ``mapInPandas`` (Arrow-batched), so the same
``(seed, num_urls)`` produces byte-identical rows at any parallelism —
the property the N-vs-4N scaling benchmark and the resume tests rely on.

Domain sizes are Zipf-skewed (top domain ~ 25% of urls) to exercise the
salting / AQE-skew path (north_rule).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 12138
START_TS = pd.Timestamp("2023-01-01 00:00:00")
END_TS = pd.Timestamp("2023-12-31 23:59:59")
LANGS = np.array(["en", "de", "fr", "es", "ja"])

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("intercept", T.DoubleType(), False),
        T.StructField("velocity", T.DoubleType(), False),
        T.StructField("amp", T.DoubleType(), False),
        T.StructField("step", T.DoubleType(), False),
        T.StructField("step_year", T.DoubleType(), False),
    ]
)


def _rng(seed: int, url_id: int) -> np.random.Generator:
    """Counter-based per-url RNG — independent of partitioning."""
    return np.random.Generator(np.random.Philox(key=seed, counter=[url_id, 0, 0, 0]))


def _domain_boundaries(num_domains: int) -> np.ndarray:
    """Harmonic (Zipf s=1) cumulative domain shares: domain 0 gets
    ~1/H(num_domains) of urls (~23% at 40 domains) — the skew driver."""
    w = 1.0 / np.arange(1, num_domains + 1)
    return np.cumsum(w / w.sum())


def _url_string(url_id: int, num_urls: int, num_domains: int) -> str:
    bounds = _domain_boundaries(num_domains)
    frac = url_id / max(num_urls, 1)
    d = int(np.searchsorted(bounds, frac, side="right"))
    d = min(d, num_domains - 1)
    return f"https://domain{d:03d}.example.com/page/{url_id:08d}"


def _decimal_year_np(ts_sec: np.ndarray) -> np.ndarray:
    """Decimal year, 365.25 convention (ptime.py:193-227), vectorized."""
    ts = pd.to_datetime(ts_sec, unit="s")
    doy = ts.dayofyear.to_numpy()
    frac = (
        ts.hour.to_numpy() / 24.0
        + ts.minute.to_numpy() / (24.0 * 60)
        + ts.second.to_numpy() / (24.0 * 3600)
    )
    return ts.year.to_numpy() + (doy - 1 + frac) / 365.25


def _truth_for(url_id: int, seed: int) -> tuple[float, float, float, float, float]:
    g = _rng(seed, url_id)
    intercept = float(g.uniform(200.0, 2000.0))
    velocity = float(g.uniform(-300.0, 300.0))  # chars per year
    amp = float(g.uniform(0.0, 50.0))
    step = float(g.choice([0.0, 0.0, 80.0, -60.0]))
    step_year = float(g.uniform(2023.2, 2023.8))
    return intercept, velocity, amp, step, step_year


def _obs_times(url_id: int, seed: int) -> np.ndarray:
    """Irregular observation schedule: exponential inter-arrival (mean 5d)
    + per-domain phase offset; 30-80 obs within 2023; ~10% of urls get a
    forced >30d gap (gap-fill coverage)."""
    g = _rng(seed, url_id ^ 0x5EED)
    n = int(g.integers(30, 81))
    gaps = g.exponential(5.0 * 86400.0, size=n)
    if url_id % 10 == 0:
        gaps[n // 2] += 45.0 * 86400.0  # forced long gap
    phase = float(g.uniform(0, 3 * 86400.0))
    t = START_TS.value // 10**9 + phase + np.cumsum(gaps)
    t = t[t <= END_TS.value // 10**9]
    if len(t) == 0:
        t = np.array([START_TS.value // 10**9 + phase])
    return np.floor(t).astype("int64")


def _text_for(url_id: int, ts_sec: int, length: int) -> str:
    """Deterministic ascii text of exactly ``length`` bytes/chars."""
    pat = f"u{url_id}t{ts_sec}:"
    reps = length // len(pat) + 1
    return (pat * reps)[:length]


def _html_for(url_id: int, ts_sec: int, text: str) -> bytes:
    """Deterministic page bytes: the extracted text is embedded verbatim
    between <body>...</body>, surrounded by non-UTF8 byte sequences outside
    the body (byte-identity coverage: operators.extract.extract_text must
    recover ``text`` byte-for-byte from these bytes)."""
    h = (url_id * 1000003 + ts_sec) & 0xFFFFFFFFFFFFFFFF
    core = h.to_bytes(8, "little")
    return (
        b"<html>\xff\xfe<head>"
        + core * 4
        + b"</head><body>"
        + text.encode("utf-8")
        + b"</body>\x80\x81</html>"
    )


def _gen_partition(
    ids: Iterator[pd.DataFrame], seed: int, num_urls: int, num_domains: int
) -> Iterator[pd.DataFrame]:
    for batch in ids:
        rows: dict[str, list] = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        for url_id in batch["id"].to_numpy():
            url_id = int(url_id)
            url = _url_string(url_id, num_urls, num_domains)
            lang = str(LANGS[url_id % len(LANGS)])
            intercept, velocity, amp, step, step_year = _truth_for(url_id, seed)
            ts_sec = _obs_times(url_id, seed)
            dy = _decimal_year_np(ts_sec)
            noise = _rng(seed, url_id ^ 0xA0A0).normal(0.0, 2.0, size=len(ts_sec))
            length = (
                intercept
                + velocity * (dy - 2023.0)
                + amp * np.sin(2 * math.pi * (dy - 2023.0))
                + step * (dy >= step_year)
                + noise
            )
            length = np.maximum(np.round(length), 1).astype("int64")
            for t, ln in zip(ts_sec.tolist(), length.tolist()):
                text = _text_for(url_id, t, int(ln))
                rows["url"].append(url)
                rows["warc_ts"].append(pd.Timestamp(t, unit="s"))
                rows["html"].append(_html_for(url_id, t, text))
                rows["text"].append(text)
                rows["lang"].append(lang)
        yield pd.DataFrame(rows)


def gen_pages(
    spark: SparkSession,
    num_urls: int = 200,
    num_domains: int = 40,
    seed: int = SEED,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table (see module docstring)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, num_urls, 1, parts)
    return ids.mapInPandas(
        lambda it: _gen_partition(it, seed, num_urls, num_domains), PAGES_SCHEMA
    )


def gen_pages_bulk(
    spark: SparkSession,
    num_urls: int,
    obs_per_url: int = 50,
    num_domains: int = 40,
    seed: int = SEED,
    partitions: int | None = None,
) -> DataFrame:
    """JVM-only bulk pages generator for throughput benchmarking.

    Same schema and embedded-text invariant as ``gen_pages`` but built
    entirely from Catalyst expressions (xxhash64-driven pseudo-randomness,
    ``repeat``/``substring`` text synthesis, ISO-8859-1 byte-exact html
    assembly) so it emits tens of millions of rows at JVM scan speed — no
    Python in the loop. Fixed ``obs_per_url`` and no truth table: the
    Philox-based ``gen_pages`` remains the correctness generator; this one
    exists so the N-vs-4N scaling run measures the engine, not the
    generator.

    Determinism: every column is a pure function of (seed, row id), so any
    partitioning produces identical rows.
    """
    from pyspark.sql import functions as F

    parts = partitions or spark.sparkContext.defaultParallelism * 2
    n = num_urls * obs_per_url
    df = spark.range(0, n, 1, parts)
    url_id = (F.col("id") / obs_per_url).cast("long")
    k = F.col("id") % obs_per_url
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    # Zipf-ish domain skew: floor(num_domains * (url_id/num_urls)^2)
    # concentrates urls in low domains (skew driver), deterministic.
    frac = url_id.cast("double") / F.lit(float(max(num_urls, 1)))
    domain = F.least(
        F.lit(num_domains - 1), F.floor(F.lit(num_domains) * frac * frac).cast("int")
    )
    url = F.concat(
        F.lit("https://domain"),
        F.lpad(domain.cast("string"), 3, "0"),
        F.lit(".example.com/page/"),
        F.lpad(url_id.cast("string"), 8, "0"),
    )
    # irregular-ish spacing: base stride of a year/obs_per_url plus jitter
    span = 365 * 86400
    stride = span // max(obs_per_url, 1)
    ts_sec = (
        F.lit(1672531200)  # 2023-01-01 UTC
        + k * F.lit(stride)
        + (h % F.lit(max(stride, 1)))
    )
    warc_ts = F.timestamp_seconds(ts_sec)
    tlen = (F.lit(200) + (h % F.lit(1800))).cast("int")
    pat = F.concat(F.lit("u"), url_id.cast("string"), F.lit("t"),
                   ts_sec.cast("string"), F.lit(":"))
    text = F.substring(F.repeat(pat, 120), 1, tlen)
    html = F.encode(
        F.concat(
            F.lit("<html>ÿþ<head>"),
            F.lpad(h.cast("string"), 20, "0"),
            F.lit("</head><body>"),
            text,
            F.lit("</body></html>"),
        ),
        "ISO-8859-1",
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS.tolist()]), (url_id % 5 + 1).cast("int")
    )
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def gen_truth(spark: SparkSession, num_urls: int = 200, num_domains: int = 40,
              seed: int = SEED) -> DataFrame:
    """Per-url ground-truth time-function parameters (test oracle input)."""
    rows = []
    for url_id in range(num_urls):
        intercept, velocity, amp, step, step_year = _truth_for(url_id, seed)
        rows.append(
            (
                _url_string(url_id, num_urls, num_domains),
                intercept,
                velocity,
                amp,
                step,
                step_year,
            )
        )
    return spark.createDataFrame(rows, TRUTH_SCHEMA)
