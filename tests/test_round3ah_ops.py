"""Batch ah planted truth: water-filling allocation invariants and
closed-form correctness against a pure-Python progressive-filling
reference."""

from __future__ import annotations

from mintpy_spark.operators.budget import waterfill


def _py_waterfill(demands: dict[int, int], budget: int) -> dict[int, int]:
    """Reference: literal progressive filling, one unit at a time in
    (remaining-demand, key) fairness order — O(B) but unambiguous."""
    alloc = {k: 0 for k in demands}
    left = budget
    while left > 0:
        live = [k for k in alloc if alloc[k] < demands[k]]
        if not live:
            break
        # fund the host with the least allocation so far; ties by the
        # water-filling order (demand, key)
        k = min(live, key=lambda k: (alloc[k], demands[k], k))
        alloc[k] += 1
        left -= 1
    return alloc


def _run(spark, demands: dict[int, int], budget: int) -> dict[int, int]:
    df = spark.createDataFrame(
        list(demands.items()), "host long, demand long"
    )
    rows = waterfill(df, "host", "demand", budget).collect()
    assert len(rows) == len(demands)
    for r in rows:
        assert 0 <= r.alloc <= r.demand, (r.host, r.alloc, r.demand)
    got = {r.host: r.alloc for r in rows}
    assert sum(got.values()) == min(budget, sum(demands.values()))
    return got


def test_waterfill_matches_progressive_reference(spark):
    cases = [
        ({1: 10, 2: 20, 3: 30}, 45),     # level lands inside host 3
        ({1: 5, 2: 5, 3: 5}, 9),         # remainder split across ties
        ({1: 100, 2: 1, 3: 1}, 50),      # one dominant host
        ({1: 7}, 100),                   # budget exceeds demand
        ({1: 3, 2: 9, 3: 27, 4: 81}, 40),
    ]
    for demands, budget in cases:
        got = _run(spark, demands, budget)
        want = _py_waterfill(demands, budget)
        assert got == want, (demands, budget, got, want)


def test_waterfill_budget_exceeds_total(spark):
    got = _run(spark, {1: 4, 2: 6}, 1000)
    assert got == {1: 4, 2: 6}


def test_waterfill_zero_demand_rows(spark):
    got = _run(spark, {1: 0, 2: 10, 3: 10}, 12)
    assert got[1] == 0 and got[2] + got[3] == 12
    assert abs(got[2] - got[3]) <= 1
