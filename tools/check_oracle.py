"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` on DuckDB over the same parquet, then compares:
row count, sorted column names, and order-insensitive values (columns
sorted by name, rows sorted by all columns, exact equality after
normalization). Usage:

    python tools/check_oracle.py [query ...]   # default: all
    SF_DIR=/root/testdata/sf0.01 python tools/check_oracle.py
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.map(lambda x: str(x) if x is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    a, b = normalize(sdf), normalize(odf)
    n = min(len(a), len(b))
    for c in a.columns:
        av, bv = a[c].to_numpy()[:n], b[c].to_numpy()[:n]
        if pd.api.types.is_float_dtype(a[c]):
            bad = ~(np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True))
        else:
            bad = ~((pd.Series(av).astype(str).fillna("<null>")
                     == pd.Series(bv).astype(str).fillna("<null>")).to_numpy())
        if bad.any():
            i = int(np.argmax(bad))
            problems.append(
                f"col {c}: {int(bad.sum())} mismatches; first at row {i}: "
                f"spark={av[i]!r} oracle={bv[i]!r}"
            )
    return problems


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as E
    from mintpy_spark.session import get_spark

    wanted = sys.argv[1:] or list(E.queries().keys())
    spark = get_spark(app_name="check_oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name in wanted:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"OK   {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
