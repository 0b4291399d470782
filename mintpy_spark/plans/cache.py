"""One-slot persist discipline shared by operators that materialize an
intermediate table consumed by several branches of one query (MinHash
signature tables, TF-IDF posting lists).

Why a slot and not plain ``persist()``: bench/determinism tools invoke
these operators many times per session; an unbounded persist per
invocation would pin a new cached table each time. Persisting through a
module's slot releases that module's PREVIOUS table first, capping
session cache growth at one table per operator family.

Known trade-off (inherited by every caller): a DataFrame built by an
EARLIER invocation and executed only after a LATER one loses its cached
intermediate and recomputes it — correct, just slower; build and
materialize each result before starting the next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persist_slot(df: DataFrame, slot: list) -> DataFrame:
    """Persist ``df`` through ``slot`` (a module-level list), releasing
    whatever the slot held before."""
    while slot:
        prev = slot.pop()
        try:
            prev.unpersist()
        except Exception:
            # the previous table belonged to a SparkSession that has been
            # stopped since (multi-session tools); its storage died with
            # the session — nothing to release
            pass
    df = df.persist()
    slot.append(df)
    return df
