"""Round-3 batch dd: skew audit + KS drift — known-answer fixtures."""

from __future__ import annotations

import datetime as dt

D = dt.datetime


def _ts(day: int, minute: int = 0) -> dt.datetime:
    return D(2024, 1, 1) + dt.timedelta(days=day, minutes=minute)


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_skew_audit_hot_key(spark, tmp_path):
    from mintpy_spark.queries_tiers import skew_audit_user_key

    # user 7: 50 rows; users 0..9 (others): 5 each -> total 95
    rows, eid = [], 0
    for i in range(50):
        rows.append((eid, _ts(0, i), 7, "click", 1.0, "{}")); eid += 1
    for u in range(9):
        for i in range(5):
            rows.append((eid, _ts(0, 100 + eid), 100 + u, "click", 1.0, "{}")); eid += 1
    _events(spark, tmp_path, rows)
    out = skew_audit_user_key(spark, str(tmp_path)).collect()
    assert [r["rnk"] for r in out] == list(range(1, 11))
    top = out[0]
    assert (top["user_id"], top["n_rows"]) == (7, 50)
    assert top["share_bp"] == round(50 * 10000 / 95)  # 5263
    assert top["cum_share_bp"] == top["share_bp"]
    # ties (5-row users) break on user_id ascending
    assert [r["user_id"] for r in out[1:]] == [100 + u for u in range(9)]
    assert out[-1]["cum_share_bp"] == 10000


def test_ks_vs_tvd_localized_shift(spark, tmp_path):
    """A shift of 25% of mass from bin 0 to bin 1 (adjacent): TVD sees
    0.25; KS ALSO sees 0.25 here (gap at bin 0). But a split shift
    (bin0 -> bins 1 and 9, 12.5% each) keeps TVD at 0.25 while the max
    CDF gap stays 0.25 at bin 0 — assert both metrics on the simple
    case where hand computation is unambiguous."""
    from mintpy_spark.queries_tiers import ks_drift_weekly
    from mintpy_spark.queries_behave import drift_tvd_weekly

    rows, eid = [], 0
    # week a: 8 events bin 0 (value 10)
    for i in range(8):
        rows.append((eid, _ts(1, i), 1, "A", 10.0, "{}")); eid += 1
    # week a+1: 6 in bin 0, 2 in bin 1 (value 60) -> 25% moved one bin up
    for i in range(6):
        rows.append((eid, _ts(8, i), 1, "A", 10.0, "{}")); eid += 1
    for i in range(2):
        rows.append((eid, _ts(8, 30 + i), 1, "A", 60.0, "{}")); eid += 1
    _events(spark, tmp_path, rows)
    ks = {r["wk"]: r["ks_bp"] for r in ks_drift_weekly(spark, str(tmp_path)).collect()}
    tvd = {r["wk"]: r["tvd_bp"] for r in drift_tvd_weekly(spark, str(tmp_path)).collect()}
    wk1 = ((D(2024, 1, 9) - D(1970, 1, 1)).days) // 7
    assert ks[wk1] == 2500 and tvd[wk1] == 2500


def test_ks_identical_weeks_zero(spark, tmp_path):
    from mintpy_spark.queries_tiers import ks_drift_weekly

    rows, eid = [], 0
    for day in (1, 8):
        for v in (10.0, 110.0, 260.0):
            rows.append((eid, _ts(day, eid), 1, "A", v, "{}")); eid += 1
    _events(spark, tmp_path, rows)
    out = {r["wk"]: r["ks_bp"] for r in ks_drift_weekly(spark, str(tmp_path)).collect()}
    assert 0 in set(out.values())
