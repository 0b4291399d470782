"""Planted-truth tests for batch xx (session trigram paths, decayed
LTV, basket brand pairs)."""

from __future__ import annotations

import datetime as dt

import pytest

D = dt.datetime


@pytest.fixture(scope="module")
def ev_dir(spark, tmp_path_factory):
    """User 1: one 4-event session (view>click>view>purchase) then,
    after a 2-hour gap, a fresh session (view>click) — the cross-gap
    trigram (view>view>click across sessions) must NOT appear.
    Purchases for the LTV test sit at known ages: 210 days (30 weeks)
    and 0 days from the max day."""
    rows = [
        (1, D(2024, 1, 1, 9, 0), 1, "view", None, "{}"),
        (2, D(2024, 1, 1, 9, 5), 1, "click", None, "{}"),
        (3, D(2024, 1, 1, 9, 10), 1, "view", None, "{}"),
        (4, D(2024, 1, 1, 9, 15), 1, "purchase", 10.0, "{}"),
        # 2h gap -> new session
        (5, D(2024, 1, 1, 11, 30), 1, "view", None, "{}"),
        (6, D(2024, 1, 1, 11, 35), 1, "click", None, "{}"),
        # user 2 purchases: one 210 days before the max day, one on it
        (7, D(2024, 1, 1, 12, 0), 2, "purchase", 20.0, "{}"),
        (8, D(2024, 7, 29, 12, 0), 2, "purchase", 40.0, "{}"),
    ]
    p = tmp_path_factory.mktemp("xx") / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    return str(p)


def test_trigrams_respect_session_bounds(spark, ev_dir):
    import __spark_entry__ as E

    rows = E.queries()["session_path_trigrams"](spark, ev_dir).collect()
    paths = {r.path: r.cnt for r in rows}
    assert paths == {
        "view>click>view": 1,
        "click>view>purchase": 1,
    }
    # deterministic rank order: count ties break on path string
    assert [r.path for r in rows] == sorted(paths)


def test_ltv_decay_exact_dyadic(spark, ev_dir):
    import __spark_entry__ as E

    out = {r.user_id: r for r in E.queries()["ltv_decay_user"](spark, ev_dir).collect()}
    u2 = out[2]
    # max day = 2024-07-29. purchase at age 0: weight exactly 1.
    # purchase at age 210 = 30*7: weight exactly 2^-30.
    assert u2.n_purchases == 2 and u2.raw_cents == 6000
    expect = 4000 * 1_000_000 + int(2000 * (1.0 / (1 << 30)) * 1e6 + 0.5)
    assert u2.decayed_micro == expect
    # user 1's single purchase also ages 210 days
    assert out[1].decayed_micro == int(1000 * (1.0 / (1 << 30)) * 1e6 + 0.5)


def test_basket_pairs_lift(spark, tmp_path):
    import __spark_entry__ as E

    p = tmp_path
    spark.createDataFrame(
        [(1, "p1", "Brand#1", "PROMO", 5, 1.0),
         (2, "p2", "Brand#2", "STANDARD", 15, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(f"{p}/part.parquet")
    li = []
    # 5 orders containing BOTH brands (several lines each -> distinct
    # collapses them), 5 orders with Brand#1 only
    for ok in range(5):
        li += [(ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D(1996, 1, 1)),
               (ok, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", D(1996, 1, 2)),
               (ok, 2, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", D(1996, 1, 3))]
    for ok in range(5, 10):
        li.append((ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D(1996, 1, 1)))
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{p}/lineitem.parquet")

    rows = E.queries()["basket_brand_pairs"](spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    # support 5 of 10 orders; marginals 10 and 5:
    # lift = 5*10/(10*5) = 1.0 -> 10000 bp
    assert (r.brand_a, r.brand_b, r.support, r.lift_bp) == (
        "Brand#1", "Brand#2", 5, 10000
    )
