"""Round-3 batch aa: pivot / unpivot / rank transform — known-answer
fixtures over temp parquet."""

from __future__ import annotations

import datetime as dt

D = dt.datetime


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_pivot_counts_with_other_bucket(spark, tmp_path):
    from mintpy_spark.queries_behave import pivot_daily_type_counts

    d0 = D(2024, 1, 1)
    _events(
        spark,
        tmp_path,
        [
            (1, d0, 1, "click", 1.0, "{}"),
            (2, d0, 1, "click", 1.0, "{}"),
            (3, d0, 2, "purchase", 1.0, "{}"),
            (4, d0, 2, "mystery", 1.0, "{}"),  # outside the fixed domain
        ],
    )
    r = pivot_daily_type_counts(spark, str(tmp_path)).collect()[0]
    assert (r["n_click"], r["n_purchase"], r["n_view"]) == (2, 1, 0)
    assert (r["n_other"], r["n_total"]) == (1, 4)  # nothing silently dropped


def test_unpivot_measures_long_stats(spark, tmp_path):
    from mintpy_spark.queries_behave import unpivot_lineitem_measures

    rows = [
        (1, 1, 1, 1, 5.0, 100.50, 0.10, 0.0, "N", "O", D(1996, 1, 1)),
        (1, 1, 1, 2, 3.0, 200.25, 0.20, 0.0, "N", "O", D(1996, 1, 2)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {r["measure"]: r for r in unpivot_lineitem_measures(spark, str(tmp_path)).collect()}
    assert set(out) == {"quantity", "extendedprice", "discount"}
    assert (out["quantity"]["n"], out["quantity"]["vsum"]) == (2, 8.0)
    assert out["extendedprice"]["vsum"] == 300.75
    assert (out["discount"]["vmin"], out["discount"]["vmax"]) == (0.10, 0.20)


def test_percent_rank_tie_safe(spark, tmp_path):
    from mintpy_spark.queries_behave import value_percentile_daily

    d0 = D(2024, 1, 1)
    # values 1, 2, 2, 5: percent_rank = 0, 1/3, 1/3, 1  (ties share)
    _events(
        spark,
        tmp_path,
        [
            (1, d0, 1, "click", 1.0, "{}"),
            (2, d0, 1, "click", 2.0, "{}"),
            (3, d0, 1, "click", 2.0, "{}"),
            (4, d0, 1, "click", 5.0, "{}"),
            (5, d0, 1, "click", None, "{}"),  # NULL excluded entirely
        ],
    )
    out = {r["event_id"]: r["pr_bp"] for r in value_percentile_daily(spark, str(tmp_path)).collect()}
    assert out == {1: 0, 2: 3333, 3: 3333, 4: 10000}
