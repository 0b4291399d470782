"""Planted-truth tests for batch zz (sketch merge/difference algebra)."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

D = dt.datetime


def _h(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def ev_dir(spark, tmp_path_factory):
    """Type 'a': users 1..8; type 'b': users 5..12 (overlap 5..8).
    Small enough that every KMV sketch is EXHAUSTIVE (k=32 > 12), so
    the A-not-B estimate must be exactly the true difference count.
    Events span two days inside one 30d bucket for the merge tests."""
    rows = []
    eid = 0
    for u in range(1, 9):
        eid += 1
        rows.append((eid, D(2024, 1, 1, 10), u, "a", 1.0, "{}"))
    for u in range(5, 13):
        eid += 1
        rows.append((eid, D(2024, 1, 2, 10), u, "b", 1.0, "{}"))
    # duplicate visits must not change distinct estimates
    rows.append((998, D(2024, 1, 2, 11), 1, "a", 1.0, "{}"))
    rows.append((999, D(2024, 1, 2, 12), 5, "b", 1.0, "{}"))
    p = tmp_path_factory.mktemp("zz") / "ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    return str(p)


def test_hll_day_merge_equals_direct_month(spark, ev_dir):
    import __spark_entry__ as E
    from mintpy_spark.operators.sketch import hll_estimate, hll_tier

    rows = E.queries()["hll_merge_30d_distinct"](spark, ev_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.exact_distinct == 12
    # merged day registers == registers sketched over the month directly
    ev = spark.read.parquet(f"{ev_dir}/events.parquet")
    direct = hll_estimate(hll_tier(ev, "user_id", tier="30d", ts="ts")).collect()[0]
    assert (r.n_regs, r.sum_scaled, r.est_distinct) == (
        direct.n_regs, direct.sum_scaled, direct.est_distinct
    )


def test_kmv_anotb_exact_when_exhaustive(spark, ev_dir):
    import __spark_entry__ as E

    out = {(r.type_a, r.type_b): r for r in E.queries()["kmv_anotb_audience"](spark, ev_dir).collect()}
    ab = out[("a", "b")]
    # sketches exhaustive (8 and 8 hashes < k): theta = full space,
    # sample = true |A \ B| = 4, estimate = exactly 4.0
    assert ab.n_a == 8 and ab.n_b == 8
    assert ab.n_anotb == 4 and ab.est_anotb == pytest.approx(4.0)
    ba = out[("b", "a")]
    assert ba.n_anotb == 4 and ba.est_anotb == pytest.approx(4.0)


def test_cms_merge_overcount_nonnegative_and_exact_here(spark, ev_dir):
    import __spark_entry__ as E

    rows = E.queries()["cms_30d_merge_topfreq"](spark, ev_dir).collect()
    out = {r.event_type: r for r in rows}
    # exact counts include duplicate visits (frequency, not distinct)
    assert out["a"].exact_cnt == 9 and out["b"].exact_cnt == 9
    for r in rows:
        assert r.overcount >= 0
    # 2 types cannot collide in all 4 rows of a 64-wide sketch
    assert out["a"].est == 9 and out["b"].est == 9
