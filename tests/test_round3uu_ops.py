"""Planted-truth tests for batch uu (dow ANOVA, seasonal index, Welch
t): a two-week fixture with a strong weekend dip and one jittered day;
expectations recomputed with exact integer arithmetic in the test."""

from __future__ import annotations

import datetime as dt
import math

import pytest

D = dt.datetime

# day index -> value: weekdays 2.0 (one day jittered to 2.5), weekends 1.0
_DAYS = {}
for i in range(14):
    day = dt.date(2024, 1, 1 + i)
    wd = day.weekday()  # Mon=0 .. Sun=6
    _DAYS[day] = 1.0 if wd >= 5 else (2.5 if i == 1 else 2.0)


def _dow0(day: dt.date) -> int:
    return (day - dt.date(1970, 1, 1)).days % 7


@pytest.fixture(scope="module")
def dow_dir(spark, tmp_path_factory):
    rows = [
        (i + 1, D(d.year, d.month, d.day, 12), 1, "s", v, "{}")
        for i, (d, v) in enumerate(sorted(_DAYS.items()))
    ]
    p = tmp_path_factory.mktemp("uu") / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    return str(p)


def test_dow0_convention():
    # 2024-01-01 was a Monday; epoch-day % 7 must map it to 4 (0=Thu)
    assert _dow0(dt.date(2024, 1, 1)) == 4
    assert _dow0(dt.date(2024, 1, 6)) == 2  # Saturday
    assert _dow0(dt.date(2024, 1, 7)) == 3  # Sunday


def test_anova_f_matches_reimplementation(spark, dow_dir):
    import __spark_entry__ as E

    r = E.queries()["anova_dow_daily"](spark, dow_dir).collect()
    assert len(r) == 1
    row = r[0]
    cents = {d: int(v * 100) for d, v in _DAYS.items()}
    groups: dict[int, list[int]] = {}
    for d, x in cents.items():
        groups.setdefault(_dow0(d), []).append(x)
    n = len(cents)
    k = len(groups)
    s = sum(cents.values())
    q = sum(x * x for x in cents.values())
    gsum = sum(sum(g) ** 2 / len(g) for g in groups.values())
    ssb = gsum - s * s / n
    ssw = q - gsum
    expect = round((ssb / (k - 1)) / (ssw / (n - k)), 4)
    assert (row.n_days, row.k_groups) == (14, 7)
    assert row.f_stat == pytest.approx(expect, abs=1e-9)
    assert row.f_stat > 10  # weekend dip dominates the jitter


def test_seasonal_index_exact_bp(spark, dow_dir):
    import __spark_entry__ as E

    rows = E.queries()["seasonal_index_dow"](spark, dow_dir).collect()
    out = {r.dow0: r for r in rows}
    cents = {d: int(v * 100) for d, v in _DAYS.items()}
    n, s = len(cents), sum(cents.values())
    for dow in range(7):
        g = [x for d, x in cents.items() if _dow0(d) == dow]
        expect = (20000 * sum(g) * n + len(g) * s) // (2 * len(g) * s)
        assert out[dow].index_bp == expect
        assert out[dow].n_days == len(g) and out[dow].cents == sum(g)
    # weekends sit far below par, weekdays above
    assert out[2].index_bp < 7000 < 10000 < out[4].index_bp


def test_welch_t_matches_reimplementation(spark, dow_dir):
    import __spark_entry__ as E

    r = E.queries()["welch_weekday_weekend"](spark, dow_dir).collect()
    assert len(r) == 1
    row = r[0]
    cents = {d: int(v * 100) for d, v in _DAYS.items()}
    wd = [x for d, x in cents.items() if _dow0(d) not in (2, 3)]
    we = [x for d, x in cents.items() if _dow0(d) in (2, 3)]

    def stats(g: list[int]) -> tuple[float, float]:
        n, s, q = len(g), sum(g), sum(x * x for x in g)
        return s / n, (n * q - s * s) / (n * n * (n - 1))

    m1, se1 = stats(wd)
    m2, se2 = stats(we)
    assert (row.n_wd, row.n_we) == (10, 4)
    assert row.mean_diff == pytest.approx(round(m1 - m2, 4), abs=1e-9)
    assert row.t_stat == pytest.approx(
        round((m1 - m2) / math.sqrt(se1 + se2), 4), abs=1e-9
    )
    expect_df = round(
        (se1 + se2) ** 2 / (se1 * se1 / (len(wd) - 1) + se2 * se2 / (len(we) - 1)), 4
    )
    assert row.df == pytest.approx(expect_df, abs=1e-9)
