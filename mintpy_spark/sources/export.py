"""Generic exporter — the engine's single replacement for the reference's
~10 per-format save_* sinks (SURVEY.md §2.1: save_hdfeos5/kmz/gdal/gmt/
roipac/qgis/... are all "canonical store -> external format" converters;
on Spark every target is one `df.write.format(...)` away).

Formats: parquet (default), csv (header, ISO timestamps), json (lines).
Partition columns and overwrite/append mode pass through. Timestamps are
exported in UTC regardless of writer-session defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FORMATS = ("parquet", "csv", "json")


def export(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(path)
