"""Round-3 batch m: PII scrub, token entropy, lagged cross-correlation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mintpy_spark.operators import pii as P


def test_pii_counts_and_scrub(spark):
    rows = [
        (0, "mail me at alice.smith+x@sub.example.co.uk or bob@ex.io now"),
        (1, "server 10.0.255.3 and 192.168.1.1 up; version 1.2 is not an ip"),
        (2, "call +1-555-0042 re 10.1.2.3 or write c@d.org"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = P.pii_scrub(P.pii_counts(df), "text", "ts")
    got = {r["doc_id"]: r for r in out.collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == (2, 0, 0)
    # "version 1.2" has only two dot-groups -> not an IPv4 match
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 2, 0)
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (1, 1, 1)
    assert got[0]["ts"] == "mail me at <EMAIL> or <EMAIL> now"
    assert got[1]["ts"] == "server <IP> and <IP> up; version 1.2 is not an ip"
    assert got[2]["ts"] == "call <PHONE> re <IP> or write <EMAIL>"
    assert got[3]["ts"] == got[3]["text"]


def test_pii_scrub_order_email_before_ip(spark):
    # the email host must be consumed by the email pass, not half-eaten
    # by the IPv4 pass (1.2.3.4 inside a host is NOT a bare IP)
    df = spark.createDataFrame([(0, "x@1.2.3.4.mail.org then 5.6.7.8")],
                               "doc_id long, text string")
    ts = P.pii_scrub(df, "text", "ts").collect()[0]["ts"]
    assert ts == "<EMAIL> then <IP>"


def test_token_entropy_known_values(spark):
    import __spark_entry__  # noqa: F401 — ensure registry import side effects

    from mintpy_spark.queries_text import text_token_entropy  # noqa: F401

    # uniform over 4 distinct tokens -> H = ln(4); single repeated token -> 0
    docs = spark.createDataFrame(
        [(0, "a b c d", "en", "s", 7), (1, "x x x x", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        res = text_token_entropy(spark, td).collect()[0]
    h_uniform = int(math.floor(math.log(4) * 1e6 + 0.5))
    assert res["docs"] == 2
    assert res["max_entropy_micro"] == h_uniform
    assert res["min_entropy_micro"] == 0
    # Simpson: uniform 1-1/4 = 0.75; degenerate 1-1 = 0
    assert res["sum_simpson_micro"] == 750000


def test_xcorr_perfect_lag(spark):
    # y(t) = x(t-2): r at lag 2 must be exactly 1.0 (r_micro = 1_000_000)
    from datetime import datetime

    from mintpy_spark.queries_text import xcorr_daily_lag

    x = [5, 9, 2, 7, 4, 8, 1, 6, 3, 10, 5, 7]
    rows = []
    for d, cnt in enumerate(x):
        for i in range(cnt):
            rows.append((len(rows), datetime(2024, 1, d + 1, 6),
                         0, "click", 0.0, "{}"))
    for d, cnt in enumerate(x):
        for i in range(cnt):
            rows.append((len(rows), datetime(2024, 1, d + 3, 6),
                         0, "purchase", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(f"{td}/events.parquet")
        res = {r["lag"]: r for r in xcorr_daily_lag(spark, td).collect()}
    assert res[2]["r_micro"] == 1_000_000
    # all partials are integers and consistent at lag 0
    r0 = res[0]
    assert r0["n"] == 10 and r0["sx"] == sum(x[2:]) and r0["sy"] == sum(x[:10])
    assert abs(res[0]["r_micro"]) < 1_000_000
