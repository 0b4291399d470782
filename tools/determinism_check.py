"""Partition-order determinism probe (SURVEY.md §7.3 hard-part 1).

Runs every driver-contract query at local[3] (shuffle=7) and local[8]
(shuffle=32) — deliberately awkward, non-power-of-two parallelism — and
compares an order-insensitive fingerprint:

    bit_xor(xxhash64(<all columns>))  +  row count

(bit_xor, not sum: Spark 4 ANSI mode overflows on sum of hashes.)
A query whose float results depend on partition order (accumulation order
in aggregates, nondeterministic tie-breaks) fingerprints differently.
All engine queries round in-query, so fingerprints must match exactly.

Usage: python tools/determinism_check.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def fingerprints(master: str, shuffle: int, names: list[str]) -> dict[str, tuple]:
    import __spark_entry__ as E

    from pyspark.sql import functions as F

    from mintpy_spark.session import get_spark

    spark = get_spark(app_name=f"det_{shuffle}", master=master,
                      shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = {}
    for n in names:
        df = qs[n](spark, SF_DIR)
        cols = [F.col(f"`{c}`").cast("string") for c in df.columns]
        row = df.select(
            F.bit_xor(F.xxhash64(*cols)).alias("fp"), F.count("*").alias("n")
        ).first()
        out[n] = (row.fp, row.n)
    spark.stop()
    return out


def main() -> None:
    import __spark_entry__ as E

    names = sys.argv[1:] or sorted(E.queries())
    a = fingerprints("local[3]", 7, names)
    b = fingerprints("local[8]", 32, names)
    bad = [n for n in names if a[n] != b[n]]
    for n in names:
        mark = "MISMATCH" if n in bad else "ok"
        print(f"{mark:9s} {n}  {a[n]}  {b[n] if n in bad else ''}")
    print(f"\n{len(names) - len(bad)}/{len(names)} deterministic across parallelism")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
