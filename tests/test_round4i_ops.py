"""Round-4 batch i planted truth: token-bucket admissions stepped by
hand over crafted arrival patterns."""

from __future__ import annotations

import datetime as dt
import os
import tempfile


def test_token_bucket_admission_planted(spark):
    from mintpy_spark.queries_tiers import token_bucket_admission

    t0 = dt.datetime(2024, 7, 1)

    def rows(uid, minutes):
        return [
            (uid, t0 + dt.timedelta(minutes=m), i, "view", 1.0, None)
            for i, m in enumerate(minutes)
        ]

    # user 1: burst of 5 at t=0..4min. Bucket holds 3 tokens; refill in
    # 4 minutes is 4*60e6*1000 // 3.6e9 = 66 mt — not a full token.
    # Admit #1 (full bucket), #2, #3; reject #4, #5.
    data = rows(1, [0, 1, 2, 3, 4])
    # user 2: events every 2 hours — refill 2000 mt between arrivals,
    # bucket never empties: all admitted.
    data += rows(2, [0, 120, 240, 360])
    # user 3: burst of 4 then a 5-hour gap then 2 more: 3 admitted,
    # 1 rejected, refill caps at 3000 -> both tail events admitted.
    data += rows(3, [0, 1, 2, 3, 303, 304])
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long,"
        " event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r.user_id: r.asDict()
               for r in token_bucket_admission(spark, d).collect()}

    assert got[1]["n_admitted"] == 3 and got[1]["n_rejected"] == 2
    # final tokens: admitted 3 burn 3000; refills 16+16+16+16 mt
    assert got[1]["final_tokens_mt"] == 16 * 4
    assert got[2]["n_admitted"] == 4 and got[2]["n_rejected"] == 0
    assert got[3]["n_admitted"] == 5 and got[3]["n_rejected"] == 1
    # tail: bucket refilled to cap (3000), two admits in 2 min leave
    # 3000 - 1000 + 16 - 1000 = 1016
    assert got[3]["final_tokens_mt"] == 1016
