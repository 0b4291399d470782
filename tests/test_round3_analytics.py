"""Planted-truth tests for the round-3 analytics batches (kk-oo):
each statistic recovers a truth seeded into a hand fixture, beyond the
cross-engine oracle equality the driver gate checks."""

from __future__ import annotations

import datetime as dt

import pytest

D = dt.datetime


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Fixture corpus: 2 users with known click/purchase patterns over
    4 days, plus a heavy-tail outlier day for the robust mean."""
    rows = [
        # user 1: click 09:00, purchase 09:30 (attributed, 1800s), then
        # purchase day 2 with NO prior click that day (still attributed
        # to day-1 click), active days 1,2,3 (streak 3)
        (1, D(2024, 1, 1, 9, 0), 1, "click", None, "{}"),
        (2, D(2024, 1, 1, 9, 30), 1, "purchase", 10.0, "{}"),
        (3, D(2024, 1, 2, 9, 0), 1, "purchase", 20.0, "{}"),
        (4, D(2024, 1, 3, 9, 0), 1, "view", 1.0, "{}"),
        # user 2: purchase with no click ever (organic); active days
        # 1 and 3 (two streaks of 1)
        (5, D(2024, 1, 1, 10, 0), 2, "purchase", 40.0, "{}"),
        (6, D(2024, 1, 3, 10, 0), 2, "view", 2.0, "{}"),
        # same-instant click+purchase: click attributes (<= ASOF tie)
        (7, D(2024, 1, 4, 8, 0), 1, "click", None, "{}"),
        (8, D(2024, 1, 4, 8, 0), 1, "purchase", 5.0, "{}"),
    ]
    p = tmp_path_factory.mktemp("an") / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    return str(p)


def test_attribution_tie_and_organic(spark, events_dir):
    import __spark_entry__ as E

    out = {
        r.user_id: r
        for r in E.queries()["attribution_last_touch"](spark, events_dir).collect()
    }
    # user 1: purchases 10+20+5 all attributed (day-2 purchase uses the
    # day-1 click; the same-instant pair attributes on the <= tie)
    assert out[1].attributed_cents == 3500 and out[1].organic_cents == 0
    assert out[1].n_attributed == 3
    # user 2: never clicked -> all organic
    assert out[2].attributed_cents == 0 and out[2].organic_cents == 4000


def test_streaks_islands(spark, events_dir):
    import __spark_entry__ as E

    out = {
        r.user_id: r
        for r in E.queries()["activity_streaks"](spark, events_dir).collect()
    }
    assert out[1].longest_streak == 4  # days 1,2,3,4 consecutive
    assert out[1].n_streaks == 1
    assert out[2].longest_streak == 1 and out[2].n_streaks == 2


def test_time_to_convert_discrete_quantiles(spark, events_dir):
    import __spark_entry__ as E

    rows = {
        r.ed: r
        for r in E.queries()["time_to_convert_quantiles"](
            spark, events_dir
        ).collect()
    }
    d1 = dt.date(2024, 1, 1).toordinal() - dt.date(1970, 1, 1).toordinal()
    assert rows[d1].n == 1 and rows[d1].p50_us == 1800 * 10**6
    d4 = d1 + 3
    assert rows[d4].p50_us == 0  # same-instant click
    assert d1 + 1 in rows  # day-2 purchase attributed across midnight


def test_mode_tie_breaks_to_smaller_value(spark, tmp_path):
    import __spark_entry__ as E

    rows = [
        (i, D(2024, 1, 1, 9, i), 1, "view", v, "{}")
        for i, v in enumerate([3.0, 3.0, 1.0, 1.0, 2.0])
    ]
    p = tmp_path / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    out = E.queries()["value_mode_daily"](spark, str(p)).collect()
    assert out[0].mode_cents == 100 and out[0].mode_freq == 2


def test_median_of_means_resists_outliers(spark, tmp_path):
    import __spark_entry__ as E

    # 99 values of 10.00 plus one of 1e6: the raw mean is pulled ~1e4
    # cents; median-of-means must stay within one bucket's reach
    rows = [
        (i, D(2024, 1, 1, 9, 0, i % 60), 1, "view",
         10.0 if i < 99 else 1e6, "{}")
        for i in range(100)
    ]
    p = tmp_path / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    out = E.queries()["robust_mom_daily"](spark, str(p)).collect()[0]
    assert out.n_buckets == 10
    assert out.mom_cents < 3000, "outlier leaked past the bucket median"


def test_did_recovers_planted_lift(spark, tmp_path):
    import __spark_entry__ as E
    from mintpy_spark.queries_stats2 import _SPLIT_ED

    base = dt.date(1970, 1, 1)
    pre_day = D(2024, 1, 10, 9)   # ed 19732 < split
    post_day = D(2024, 1, 20, 9)  # ed 19742 >= split
    assert (pre_day.date() - base).days < _SPLIT_ED <= (post_day.date() - base).days
    # find user ids landing in each hash group
    import hashlib

    def grp(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    treat = [u for u in range(1, 50) if grp(u) == 1][:2]
    ctrl = [u for u in range(1, 50) if grp(u) == 0][:2]
    rows, eid = [], 0
    for u in treat + ctrl:
        rows.append((eid, pre_day, u, "view", 10.0, "{}")); eid += 1
        lift = 5.0 if u in treat else 0.0
        rows.append((eid, post_day, u, "view", 10.0 + lift, "{}")); eid += 1
    p = tmp_path / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    out = E.queries()["did_estimator"](spark, str(p)).collect()[0]
    assert out.did_cents == 500.0  # the planted +5.00 lift, exactly


def test_srm_chi2_by_hand(spark, events_dir):
    import __spark_entry__ as E

    for r in E.queries()["srm_chi2_daily"](spark, events_dir).collect():
        assert r.num == (r.n0 - r.n1) ** 2
        assert r.chi2 == round(r.num / (r.n0 + r.n1), 6)


def test_bitmap_retention_equals_set_retention(spark, events_dir):
    import __spark_entry__ as E
    import duckdb

    got = {
        r.wk: (r.active, r.retained)
        for r in E.queries()["bitmap_retention_weekly"](
            spark, events_dir
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{events_dir}/events.parquet/*.parquet')"
    )
    truth = con.execute("""
        WITH w AS (SELECT DISTINCT
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
            user_id FROM events)
        SELECT a.wk, COUNT(DISTINCT a.user_id),
               COUNT(DISTINCT CASE WHEN b.user_id IS NOT NULL
                                   THEN a.user_id END)
        FROM w a LEFT JOIN w b
          ON b.wk = a.wk + 1 AND b.user_id = a.user_id
        WHERE EXISTS (SELECT 1 FROM w n WHERE n.wk = a.wk + 1)
        GROUP BY 1
    """).fetchall()
    assert got == {wk: (a, r) for wk, a, r in truth}
