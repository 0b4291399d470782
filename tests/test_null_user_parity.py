"""Cross-engine parity under NULL user_id — pins the review findings.

The driver testdata currently has no NULL user_id, so the registry gate
never exercises NULL handling; these queries were confirmed (by
execution) to fork between Spark and DuckDB on NULL-bearing events
before the fixes (dau>wau in engagement, probe-grid counts in bloom,
rank-order NULL placement in the skew audit).  This test runs each
affected registry query AND its registered oracle over the same
NULL-bearing parquet and compares sorted values — the same comparison
the driver gate performs.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

D = dt.datetime

AFFECTED = [
    "engagement_wau_daily",
    "growth_accounting_daily",
    "bloom_presence_fp",
    "skew_audit_user_key",
    "rfm_segments",
    "cooccurrence_lift_daily",
    "rate_limit_audit_1h",
    "state_dwell_census",
    "sessions_concurrent_peak",
    "rollup_1d_distinct_hll",
]


@pytest.fixture(scope="module")
def null_events_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("nullev")
    rows, eid = [], 0
    for day in range(3):
        for u in [1, 2, 3, None]:          # one anonymous row per day
            for t in ("click", "purchase"):
                rows.append(
                    (eid, D(2024, 1, 1 + day, 9 + eid % 8), u, t,
                     float(10 + eid % 50), "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{p}/events.parquet")
    return str(p)


@pytest.mark.parametrize("name", AFFECTED)
def test_parity_with_null_users(spark, null_events_dir, name):
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    sdf = qs[name](spark, null_events_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet/*.parquet')"
    )
    odf = con.execute(oracles[name]).df()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), f"{name}: schema mismatch"

    def norm(df):
        import pandas as pd

        # NULL keys surface as NaN; NaN != NaN would fail tuples that
        # actually agree — the driver compares string forms, we map to None
        d = df[cols].astype(object).where(pd.notnull(df[cols]), None)
        return sorted(
            map(tuple, d.itertuples(index=False)),
            key=lambda t: tuple(str(x) for x in t),
        )

    assert norm(sdf) == norm(odf), f"{name}: value mismatch under NULL user_id"
