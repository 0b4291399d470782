"""Driver-contract registry invariants (cheap, no Spark jobs): every
oracle key has a query, names are unique and stable, entry() builds."""

from __future__ import annotations

import inspect


def test_registry_shape():
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 45
    assert set(os_) <= set(qs), "oracle without a query"
    # documented rows-only exceptions
    rows_only = set(qs) - set(os_)
    assert rows_only <= {"velocity_timefunc_full", "gaussian_smooth"}
    for name, fn in qs.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_runs(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"user_id", "bucket_start", "cnt", "vsum", "vmin", "vmax", "vmean"} <= set(
        df.columns
    )
