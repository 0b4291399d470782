"""mintpy_spark — a PySpark-native time-series rollup + downsample +
retention engine.

Recasts the query/data-processing capabilities of the MintPy reference
(per-pixel SBAS time-series analysis over HDF5 stacks,
/root/reference/src/mintpy) as per-key temporal aggregation over long/tall
DataFrames of web-page crawl observations:

    pixel (y, x)            -> url            (series key)
    acquisition date        -> warc_ts        (observation timestamp)
    displacement float32    -> metric columns (text_length, ...)
    interferogram pair      -> pairwise snapshot delta
    SBAS network inversion  -> gap-fill (last-obs / linear)
    timeseries2velocity     -> per-url time-function regression
    temporal_average        -> 1h/1d/30d continuous-aggregate rollup tiers

Everything is Spark-first: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs only where built-ins cannot express the
semantics (grouped least squares, Gorilla codec).
"""

__version__ = "0.1.0"

from mintpy_spark.session import get_spark  # noqa: F401
